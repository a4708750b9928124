"""Partition-shape guards for compute-heavy operators.

A parquet file with one row group arrives as ONE input partition no
matter how many cores exist — so a CPU-bound per-row pass (MinHash
signatures, SimHash folding, LSH bucketing, text scoring) runs on a
single thread while the rest of the machine idles.  ``fan_out``
round-robin repartitions *only when* the scan is under-split relative
to the session's parallelism; on a real cluster where the source
already has thousands of splits it is a no-op, so the extra shuffle is
paid exactly where it buys compute parallelism and nowhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism * multiple``
    partitions if (and only if) it currently has fewer.  Use before
    CPU-heavy row-local transforms whose input may be a small number of
    large files."""
    sc = df.sparkSession.sparkContext
    target = max(sc.defaultParallelism * multiple, 1)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

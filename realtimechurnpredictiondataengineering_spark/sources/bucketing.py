"""Bucketed tables: co-located joins/aggregations without a shuffle
(SURVEY §4 partitioning row; 100 TB posture).

Writing a fact table bucketed by its join key means every future join or
aggregation on that key reads pre-partitioned data — the Exchange
disappears from the plan entirely.  At 100 TB that converts the dominant
repeated cost (reshuffling the same fact table every pipeline run) into
a one-time write-side cost.

Bucketed tables must live in the session catalog (``saveAsTable``); the
``path`` option keeps the data at an explicit location so the catalog
entry is metadata only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and by default sorted) by ``key``.

    Sorting within buckets additionally removes the Sort from future
    sort-merge joins — scan, zip, done."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the bucket spec
    only applies via the catalog — reading the parquet path directly
    loses it)."""
    return spark.table(table)

"""Relational + LLM-pipeline operators.

- ``filters``    : Bronze demux + Silver validation chains (F1-F8, P1-P3)
- ``aggregates`` : Gold feature aggregations (A1-A4 + standard extensions)
- ``joins``      : enrichment joins (J1/J2) + inner/semi/anti/as-of
- ``dedup``      : exact, MinHash-LSH, SimHash, n-gram Jaccard,
                   embedding-cosine near-dup (north star §2.10)
- ``similarity`` : brute-force + LSH-bucketed cosine top-k ANN

All pure DataFrame -> DataFrame, sink-free, unit-testable.
"""

from realtimechurnpredictiondataengineering_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    filters,
    joins,
    multimodal,
    similarity,
)

__all__ = ["aggregates", "dedup", "filters", "joins", "multimodal", "similarity"]

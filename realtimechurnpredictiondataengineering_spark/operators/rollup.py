"""Hierarchical time rollups (continuous-aggregate / hypertable pattern).

Multi-resolution aggregates where every coarser level re-aggregates the
next finer level's PARTIALS instead of re-scanning raw rows: raw →
hourly is the only pass over the events table; daily reads hourly,
monthly reads daily.  At 100 TB this is the difference between one raw
scan and three — the finer levels are a few orders of magnitude smaller
than the source, so each further level is ~free, and in a scheduled
pipeline each level is independently materializable/incrementally
refreshable.

Only decomposable aggregates participate (count/sum/min/max and things
derivable from them, e.g. avg = sum/count at read time) — that is what
makes partials mergeable.  Non-decomposable ones (exact median) need the
raw scan; approximate sketches (HLL, see inventory a15) re-merge fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# merge rules, built lazily (Column construction needs an active session):
# leaf aggregates run over raw rows; merge aggregates re-combine partials.


def _leaf_aggs() -> list:
    return [
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]


def _merge_aggs() -> list:
    return [
        F.sum("n_events").alias("n_events"),
        F.sum("total_value").alias("total_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    ]


def rollup_leaf(
    events: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    grain: str = "hour",
) -> DataFrame:
    """The one raw scan: truncate to the finest grain and aggregate."""
    bucket = F.date_trunc(grain, F.col(ts_col)).alias("bucket")
    return events.groupBy(bucket, *keys).agg(*_leaf_aggs())


def rollup_merge(partials: DataFrame, keys: tuple[str, ...] = ("event_type",), grain: str = "day") -> DataFrame:
    """Re-aggregate finer partials to a coarser grain — no raw scan."""
    bucket = F.date_trunc(grain, F.col("bucket")).alias("bucket")
    return partials.groupBy(bucket, *keys).agg(*_merge_aggs())


def hierarchical_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    grains: tuple[str, ...] = ("hour", "day", "month"),
) -> dict[str, DataFrame]:
    """All grains, each built from the previous level's partials."""
    levels: dict[str, DataFrame] = {}
    current = rollup_leaf(events, ts_col, keys, grains[0])
    levels[grains[0]] = current
    for grain in grains[1:]:
        current = rollup_merge(current, keys, grain)
        levels[grain] = current
    return levels

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


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch sessionization — the batch twin of the streaming
    ``session_window`` aggregate: consecutive events of a user belong to
    one session while the gap is SHORTER than ``gap_seconds``; a gap of
    ``gap_seconds`` or more starts a new session (``>=``, matching
    ``session_window``'s boundary, so the batch and streaming twins
    agree on boundary-exact events).

    Classic two-window shape, ONE shuffle on the user key (both windows
    share the (user, ts) sort): lag(ts) marks session breaks, a running
    sum of breaks numbers the sessions, then a per-(user, session)
    aggregate emits bounds and counts.  The gap is measured on the
    timestamp cast to double — full sub-second precision, identical to
    SQL ``epoch()`` arithmetic (``unix_timestamp`` would truncate to
    whole seconds and disagree with an oracle near the boundary).
    ``order_tiebreak`` makes the within-timestamp order deterministic so
    session numbering is engine-reproducible.  Returns
    (user, session_id, session_start, session_end, n_events).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_tiebreak))
    gap = F.col(ts_col).cast("double") - F.lag(ts_col).over(w).cast("double")
    marked = events.withColumn(
        "__new_session",
        F.when(gap.isNull() | (gap >= gap_seconds), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "__session",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        marked.groupBy(F.col(user_col), F.col("__session").cast("int").alias("session_id"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
        )
    )


def ewma_by_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Exponentially weighted moving average of ``value_col`` per key,
    folded in event-time order — the decayed-activity feature a churn
    model wants (yesterday's session counts more than last quarter's):
    ``y_1 = x_1;  y_i = α·x_i + (1−α)·y_{i−1}``, returning each key's
    FINAL ewma (the feature value as of the last event) plus the event
    count.

    Plan: one groupBy shuffle collects each key's (ts, tiebreak, value)
    structs; ``array_sort`` orders them scan-locally (struct sort is
    lexicographic, so the tiebreak column makes the fold deterministic
    under timestamp ties); one ``aggregate`` lambda folds the recurrence
    — all JVM expression tree, no UDF, no window.

    The fold-over-array shape is deliberate: the closed form
    ``y_i = α·Σ (1−α)^(i−j)·x_j`` looks window-expressible, but
    factoring the window sum requires ``(1−α)^(−j)`` terms that OVERFLOW
    double for ``j ≳ 2000`` — the fold is exact at any length.  Per-key
    state is one array of that key's events (the same bound as any
    sessionization or per-entity feature build: a single entity's
    history fits an executor; a key that doesn't is an upstream data
    problem, not a plan problem).  Arithmetic is spelled
    ``(α·x) + ((1−α)·acc)`` and the result rounds to 6 so a SQL oracle
    replays the identical IEEE sequence.  NULL values are excluded
    before the fold (they carry no activity); keys with no non-null
    events are absent from the result.
    """
    a = float(alpha)
    tie = tiebreak_col or ts_col
    collected = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("__ts"),
                        F.col(tie).alias("__tie"),
                        F.col(value_col).cast("double").alias("__v"),
                    )
                )
            ).alias("__events")
        )
    )
    vals = F.transform("__events", lambda s: s["__v"])
    fold = F.aggregate(
        F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: (F.lit(a) * x) + (F.lit(1.0 - a) * acc),
    )
    from realtimechurnpredictiondataengineering_spark.functions.scalar import snap

    return collected.select(
        F.col(key_col),
        F.size("__events").cast("int").alias("n_events"),
        snap(fold, 6).alias("ewma"),
    )

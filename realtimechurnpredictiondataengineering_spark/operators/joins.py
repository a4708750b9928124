"""Joins (SURVEY §2.6 J1/J2 + the standard surface the reference omits).

Scale posture:
- Dimension joins (region/nation/aggregated small sides) take an explicit
  ``broadcast()`` hint — no shuffle of the fact side.
- Fact-fact equi-joins stay shuffle hash/sort-merge on the key and rely
  on AQE for skew splitting; nothing here repartitions by hand.
- The enrichment chain joins N feature frames all keyed on the same
  column, so Catalyst reuses one Exchange on ``customer_id`` across the
  chain rather than reshuffling per join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def left_enrich(base: DataFrame, features: list[DataFrame], key: str = "customer_id") -> DataFrame:
    """J1/J2 — left-outer enrichment chain (Gold1.py:82,95-99): base keeps
    every row; customers missing a feature frame get nulls."""
    return reduce(lambda acc, f: acc.join(f, on=key, how="left"), features, base)


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Dimension join with an explicit broadcast hint — the small side
    ships to every executor, the fact table never shuffles."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Existence filter without duplicating or widening rows."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with no match — the standard orphan/quarantine op."""
    return left.join(right, on=on, how="left_anti")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` for the same key.

    Implemented as union + window last_value instead of a range join:
    both sides shuffle ONCE on ``key`` and sort by time, the window
    carries the most recent right-side values forward, then left rows are
    selected back out.  O(n log n) per key partition, no point-in-time
    range-join blowup, skew handled by AQE.  (Not in the reference —
    standard surface for feature-store point-in-time correctness.)
    """
    from pyspark.sql import Window

    l_cols = [c for c in left.columns if c not in (key, left_ts)]
    l_tag = left.select(
        F.col(key), F.col(left_ts).alias("_ts"), F.lit(1).alias("_is_left"), *l_cols
    )
    r_tag = right.select(
        F.col(key), F.col(right_ts).alias("_ts"), F.lit(0).alias("_is_left"), *right_values
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # Right rows sort before left rows at the same timestamp so an exact
    # tie is visible to the left row (<= semantics).
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for v in right_values:
        carried = carried.withColumn(v, F.last(F.col(v), ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_is_left") == 1)
        .select(key, F.col("_ts").alias(left_ts), *l_cols, *right_values)
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 7 * 86_400,
) -> DataFrame:
    """Interval containment join (``start <= point < end``) without the
    nested-loop plan Spark produces for a bare range predicate
    (BroadcastNestedLoopJoin — O(|points| x |intervals|) comparisons).

    Both sides map onto fixed-width time buckets: each interval explodes
    into every bucket it overlaps (``sequence`` over its bucket range),
    each point lands in the one bucket containing it; then a plain
    equi-join on the bucket applies the exact range as a residual
    predicate.  Cost is |points| + |intervals| x avg_buckets_per_interval
    through ONE hash shuffle — the standard time-bucketized range join.
    Pick ``bucket_seconds`` near the typical interval length: too small
    explodes interval rows, too large inflates candidate pairs.

    Returns every (point row + interval row) containment combination.
    """
    g = F.lit(int(bucket_seconds)).cast("long")
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_col) / g).cast("long"),
                (F.unix_timestamp(end_col) / g).cast("long"),
            )
        ),
    )
    pt = points.withColumn("_bucket", (F.unix_timestamp(point_col) / g).cast("long"))
    return (
        pt.join(iv, "_bucket")
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col)))
        .drop("_bucket")
    )

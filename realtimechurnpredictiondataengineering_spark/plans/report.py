"""Report layer: the reference dashboard's data inputs, engine-side.

`GoldDataVisualiztion1.py:17-54` draws five seaborn scatter plots and
`:58-99` a Dash dropdown with three plotly charts — all over the FULL
collected gold frames (`hue="customer_id"`: one color per customer).
That hand-off breaks twice at scale: the collect is unbounded, and a
raw point-per-row scatter is unreadable (and undrawable) at 100 TB.

The engine boundary here therefore produces two forms:

- :func:`scatter_datasets` — the reference's five scatter inputs with
  its exact column names, as LAZY DataFrames; the caller picks a cap/
  sample before collecting (small-scale parity path).
- :func:`binned_scatter` — a pre-aggregated 2D density grid (count +
  mean churn-risk per cell) whose output is O(occupied bins) no matter
  the input row count — the 100 TB dashboard path.  Fixed bin widths
  keep the result deterministic (oracle-checkable) and stable across
  refreshes, and the whole thing is one groupBy — one shuffle of
  O(bins) partial rows per task after map-side combine.

Rendering itself (matplotlib / dash) stays out-of-engine; this module
emits the frames a plotting layer consumes.

Reference column mapping (our gold schema → `Gold1.py:63-123` names):
`days_since_last_login`→`login_gap_days`, `sessions`→
`total_sessions_last_30d`, `total_declined`→`total_declined_payments`,
`avg_declined`→`avg_payment_value`.  `signup_days_ago` and
`avg_resolution_time` are not gold output columns; they are rebuilt
from events exactly as the reference's support/enrichment CTEs do
(first-seen 'signup' event ts / mean 'signup' value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.functions.scalar import portable_round2
from realtimechurnpredictiondataengineering_spark.plans.gold import DEFAULT_AS_OF, churn_features
from realtimechurnpredictiondataengineering_spark.sources.batch import load_table


def binned_scatter(
    df: DataFrame,
    x: str,
    y: str,
    x_width: float,
    y_width: float,
    weight: str | None = None,
) -> DataFrame:
    """2D density grid: (x_bin, y_bin, n[, mean_weight]).

    Fixed-width bins — not quantile bins — so the aggregate needs no
    pre-pass over the data and two refreshes of a growing table map the
    same value to the same cell.  Null coordinates are dropped (a
    scatter cannot place them); callers wanting a null panel count them
    separately.
    """
    binned = df.where(F.col(x).isNotNull() & F.col(y).isNotNull()).select(
        F.floor(F.col(x) / F.lit(x_width)).cast("int").alias("x_bin"),
        F.floor(F.col(y) / F.lit(y_width)).cast("int").alias("y_bin"),
        *([F.col(weight)] if weight else []),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    if weight:
        aggs.append(F.round(F.avg(weight), 4).alias(f"avg_{weight}"))
    return binned.groupBy("x_bin", "y_bin").agg(*aggs)


def _signup_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer signup recency + resolution time from events — the
    reference's support/enrichment inputs (Gold1.py:105-117 shape)."""
    return (
        load_table(spark, "events", sf_dir)
        .where(F.col("event_type") == "signup")
        .groupBy(F.col("user_id").alias("customer_id"))
        .agg(
            F.datediff(F.lit(DEFAULT_AS_OF).cast("timestamp"), F.min("ts")).alias(
                "signup_days_ago"
            ),
            # portable_round2 precondition: resolution times are
            # non-negative by the events-table contract
            portable_round2(F.avg("value")).alias("avg_resolution_time"),
        )
    )


def scatter_datasets(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The five scatter inputs of GoldDataVisualiztion1.py:17-54, lazy,
    with the reference's column names.  All five project the SAME gold
    plan, so a caller collecting several should persist `gold` first."""
    gold = churn_features(spark, sf_dir)
    signup = _signup_features(spark, sf_dir)
    app = gold.select(
        "customer_id",
        F.col("days_since_last_login").alias("login_gap_days"),
        F.col("sessions").alias("total_sessions_last_30d"),
    )
    return {
        "app_features": app,
        "payment_declines": gold.select(
            "customer_id",
            F.col("total_declined").alias("total_declined_payments"),
            F.col("avg_declined").alias("avg_payment_value"),
        ),
        "arpu": gold.select(
            "customer_id",
            "total_revenue",
            F.col("sessions").alias("total_sessions_last_30d"),
        ),
        "support_features": signup.select(
            "customer_id", "avg_resolution_time"
        ).join(
            gold.select("customer_id", "avg_ticket_sentiment"), "customer_id"
        ),
        "enriched": app.join(signup.select("customer_id", "signup_days_ago"), "customer_id"),
    }


def dashboard_payload(
    spark: SparkSession, sf_dir: str, max_points: int = 10_000
) -> dict[str, DataFrame]:
    """The Dash dropdown's three chart datasets
    (GoldDataVisualiztion1.py:85-97), each as a bounded top-N by revenue
    so the browser payload is constant-size at any input scale."""
    gold = churn_features(spark, sf_dir)
    top = gold.orderBy(F.col("total_revenue").desc(), "customer_id").limit(max_points)
    return {
        "signup_login": top.select("customer_id", "days_since_last_login", "sessions"),
        "sessions_declines": top.select("customer_id", "sessions", "total_declined"),
        "revenue_sessions": top.select("customer_id", "sessions", "total_revenue", "arpu"),
    }

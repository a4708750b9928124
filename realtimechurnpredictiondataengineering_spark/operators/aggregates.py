"""Gold feature aggregations (SURVEY §2.5 A1-A4 + standard extensions).

Every aggregation is a plain ``groupBy(...).agg(...)`` so Spark plans it
as two-phase HashAggregate (map-side partial + final after one shuffle on
the group key) — the correct shape at any scale.  Column aliases are
explicit because the driver's oracle compares column names.

Reference sites: Gold1.py:61-92 (the four per-customer feature frames).
Here they are mapped onto the driver's tables — ``events`` plays
app_usage/transactions, ``orders``/``lineitem`` play revenue — with the
same aggregate shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.functions.scalar import pseudo_score


def activity_features(events: DataFrame, as_of: Column, user_col: str = "user_id") -> DataFrame:
    """A1 — per-user engagement: recency of last activity + session count
    (Gold1.py:63-67 ``max(days_since_last_login)``, ``sum(sessions)``)."""
    return (
        events.groupBy(F.col(user_col).alias("customer_id"))
        .agg(
            F.max("ts").alias("last_seen"),
            F.count("*").alias("n_events"),
        )
        .select(
            "customer_id",
            F.datediff(as_of, F.col("last_seen")).alias("days_since_last_login"),
            F.col("n_events").alias("sessions"),
        )
    )


def decline_features(
    events: DataFrame, decline_type: str = "payment_decline", user_col: str = "user_id"
) -> DataFrame:
    """A2 — sum/avg over a filtered event subset (Gold1.py:71-76).  The
    reference's filter legitimately selects the empty set (the producer
    never emits payment_decline, Bronze1.py:17) — empty-group semantics
    (no output rows, left-join nulls downstream) are part of the
    contract."""
    return (
        events.filter(F.col("event_type") == decline_type)
        .groupBy(F.col(user_col).alias("customer_id"))
        .agg(
            F.round(F.sum("value"), 2).alias("total_declined"),
            F.round(F.avg("value"), 2).alias("avg_declined"),
        )
    )


def revenue_features(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """A3 — per-user total revenue (Gold1.py:80-81)."""
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.col(user_col).alias("customer_id"))
        .agg(F.round(F.sum("value"), 2).alias("total_revenue"))
    )


def support_features(tickets: DataFrame, issue_col: str = "props") -> DataFrame:
    """A4 — avg over a null-heavy implicitly-cast column + deterministic
    pseudo-sentiment (Gold1.py:87-92).  ``resolution_time`` arrives as a
    string and is cast for avg; all-null groups yield null (preserved)."""
    return (
        tickets.groupBy(F.col("user_id").alias("customer_id"))
        .agg(
            F.avg(F.col("value").cast("double")).alias("avg_resolution_time"),
            F.round(F.avg(pseudo_score(issue_col)), 4).alias("avg_ticket_sentiment"),
        )
    )

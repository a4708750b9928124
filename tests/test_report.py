"""Report layer (plans/report.py): the dashboard hand-off stays bounded
and the scatter datasets carry the reference's column names
(GoldDataVisualiztion1.py:17-99)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from realtimechurnpredictiondataengineering_spark.plans import report

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def datasets(spark):
    return report.scatter_datasets(spark, SF_DIR)


def test_scatter_datasets_reference_columns(datasets):
    expected = {
        "app_features": ["customer_id", "login_gap_days", "total_sessions_last_30d"],
        "payment_declines": ["customer_id", "total_declined_payments", "avg_payment_value"],
        "arpu": ["customer_id", "total_revenue", "total_sessions_last_30d"],
        "support_features": ["customer_id", "avg_resolution_time", "avg_ticket_sentiment"],
        "enriched": [
            "customer_id",
            "login_gap_days",
            "total_sessions_last_30d",
            "signup_days_ago",
        ],
    }
    assert set(datasets) == set(expected)
    for name, cols in expected.items():
        assert datasets[name].columns == cols, name


def test_binned_scatter_partitions_every_row(spark):
    from realtimechurnpredictiondataengineering_spark.plans.gold import churn_features

    gold = churn_features(spark, SF_DIR).persist()
    try:
        grid = report.binned_scatter(
            gold, "total_revenue", "sessions", x_width=25000, y_width=5, weight="churn_risk"
        )
        rows = grid.collect()
        # every non-null input row lands in exactly one cell
        assert sum(r["n"] for r in rows) == gold.where(
            F.col("total_revenue").isNotNull() & F.col("sessions").isNotNull()
        ).count()
        # grid is orders of magnitude smaller than its input
        assert len(rows) < gold.count()
        assert all(r["avg_churn_risk"] is not None for r in rows)
    finally:
        gold.unpersist()


def test_binned_scatter_is_single_aggregate(spark):
    from realtimechurnpredictiondataengineering_spark.plans.gold import churn_features

    grid = report.binned_scatter(
        churn_features(spark, SF_DIR), "total_revenue", "sessions", 25000, 5
    )
    plan = grid._jdf.queryExecution().executedPlan().toString()
    # one hash-aggregate pair over gold, no extra sorts/joins for the grid
    assert plan.count("HashAggregate") >= 2


def test_dashboard_payload_bounded(spark):
    payload = report.dashboard_payload(spark, SF_DIR, max_points=7)
    assert set(payload) == {"signup_login", "sessions_declines", "revenue_sessions"}
    for name, df in payload.items():
        assert df.count() <= 7, name

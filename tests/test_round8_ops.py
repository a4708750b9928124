"""Round-8 operator tests: planted sv02 dedup collisions, per-dimension
embedding PSI, Kneser-Ney scoring, the lexical∪semantic dedup
composition, and the streaming scoring fixture."""

import json

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# sv02 fixture collisions: the deterministic-dedup survivor choice must
# be LIVE in the value check, not just the no-collision identity path
# ---------------------------------------------------------------------------


def test_feed_fixture_has_planted_transaction_collisions(spark):
    from realtimechurnpredictiondataengineering_spark.plans.silver import FEED_FIXTURE

    tx = [
        json.loads(r["value"])
        for r in spark.read.parquet(FEED_FIXTURE)
        .filter(F.col("topic") == "churn_transactions")
        .collect()
    ]
    keys = {}
    for d in tx:
        keys.setdefault((d["customer_id"], d["event_time"]), []).append(d)
    groups = {k: v for k, v in keys.items() if len(v) > 1}
    # the fixture must not silently regenerate collision-free
    assert len(groups) >= 150
    # and the collisions must be REAL choices: at least one group whose
    # members differ in the order columns (event_type, value)
    assert any(
        len({(d["event_type"], d["value"]) for d in v}) > 1 for v in groups.values()
    )


def test_sv02_dedup_survivor_choice_is_live(spark):
    from realtimechurnpredictiondataengineering_spark.plans.silver import (
        FEED_FIXTURE,
        silver_tables_from_feed,
    )
    from realtimechurnpredictiondataengineering_spark.operators.filters import (
        TRANSACTION_SCHEMA,
        parse_topic,
    )

    feed = spark.read.parquet(FEED_FIXTURE)
    parsed = parse_topic(feed, "churn_transactions", TRANSACTION_SCHEMA)
    n_valid = parsed.dropna(subset=["customer_id", "value"]).filter(
        F.col("value") > 0
    ).count()
    out = silver_tables_from_feed(feed, deterministic=True)["transactions"]
    rows = out.collect()
    # collisions collapsed: strictly fewer output rows than valid input
    assert len(rows) < n_valid
    # survivor rule: per key, the kept row is min by (event_type, value)
    kept = {(r["customer_id"], r["event_time"]): (r["event_type"], r["value"]) for r in rows}
    all_rows = parsed.dropna(subset=["customer_id", "value"]).filter(F.col("value") > 0).collect()
    best = {}
    for r in all_rows:
        k = (r["customer_id"], r["event_time"])
        v = (r["event_type"], r["value"])
        if k not in best or v < best[k]:
            best[k] = v
    assert kept == best

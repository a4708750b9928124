"""In-flight metrics (`df.observe`): audits must ride the query's own
pass — no second scan — for both batch and streaming."""

import pytest
from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.operators import observability as ob


def test_batch_observed_metrics_ride_the_action(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id long, val double"
    )
    obs, inst = ob.observed(
        df,
        "audit",
        {
            "n": F.count(F.lit(1)),
            "nulls": F.count(F.lit(1)) - F.count("val"),
            "total": F.sum("val"),
        },
    )
    assert inst.count() == 3  # any action completes the observation
    got = ob.metrics(obs)
    assert got == {"n": 3, "nulls": 1, "total": 40.0}


def test_batch_observe_is_free_of_extra_scans(spark):
    df = spark.createDataFrame([(1,)], "id long")
    _, inst = ob.observed(df, "a", {"n": F.count(F.lit(1))})
    plan = inst._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 1


def test_require_gate_raises_with_failing_metrics(spark):
    got = {"n": 3, "nulls": 2}
    ob.require(got, {"n": lambda v: v == 3})
    with pytest.raises(ValueError, match="nulls"):
        ob.require(got, {"n": lambda v: v == 3, "nulls": lambda v: v == 0})


def test_empty_metrics_rejected(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        ob.observed(df, "x", {})
    with pytest.raises(ValueError):
        ob.observe_stream(df, "x", {})


def test_stream_observed_metrics_in_progress(spark, tmp_path):
    src = spark.readStream.format("rate").option("rowsPerSecond", "500").load()
    inst = ob.observe_stream(
        src, "batch_audit", {"n": F.count(F.lit(1)), "max_v": F.max("value")}
    )
    q = (
        inst.writeStream.format("memory")
        .queryName("obs_sink")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        import time

        got = None
        for _ in range(60):
            q.processAllAvailable()
            got = ob.last_stream_metrics(q, "batch_audit")
            if got and got.get("n"):
                break
            time.sleep(0.5)
        assert got is not None and got["n"] > 0
        assert got["max_v"] >= 0
    finally:
        q.stop()
    assert ob.last_stream_metrics(q, "missing") is None

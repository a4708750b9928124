"""Join operator tests, incl. as-of join point-in-time correctness."""

from datetime import datetime

from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.operators import joins


def test_left_enrich_preserves_base_rows(spark):
    base = spark.createDataFrame([(1,), (2,), (3,)], "customer_id int")
    f1 = spark.createDataFrame([(1, 10.0)], "customer_id int, revenue double")
    f2 = spark.createDataFrame([(2, 5)], "customer_id int, sessions int")
    out = joins.left_enrich(base, [f1, f2]).collect()
    assert len(out) == 3
    by_id = {r["customer_id"]: r for r in out}
    assert by_id[1]["revenue"] == 10.0 and by_id[1]["sessions"] is None
    assert by_id[3]["revenue"] is None


def test_semi_and_anti_partition_the_base(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    right = spark.createDataFrame([(2,), (3,), (4,)], "j int")
    cond = left.k == right.j
    semi = {r["k"] for r in joins.semi_join(left, right, cond).collect()}
    anti = {r["k"] for r in joins.anti_join(left, right, cond).collect()}
    assert semi == {2, 3} and anti == {1}
    assert semi | anti == {1, 2, 3}


def _ts(s):
    return datetime.fromisoformat(s)


def test_as_of_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-10T00:00:00"), "e1"),
            (1, _ts("2024-01-20T00:00:00"), "e2"),
            (2, _ts("2024-01-10T00:00:00"), "e3"),  # key with no right rows
        ],
        "k int, ts timestamp, event string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-05T00:00:00"), 100.0),
            (1, _ts("2024-01-15T00:00:00"), 200.0),
            (1, _ts("2024-01-25T00:00:00"), 300.0),  # after every left row
        ],
        "k int, rts timestamp, price double",
    )
    out = joins.as_of_join(left, right, key="k", left_ts="ts", right_ts="rts", right_values=["price"])
    by_event = {r["event"]: r["price"] for r in out.collect()}
    assert by_event == {"e1": 100.0, "e2": 200.0, "e3": None}


def test_as_of_join_exact_tie_is_inclusive(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-05T00:00:00"), "e")], "k int, ts timestamp, event string")
    right = spark.createDataFrame([(1, _ts("2024-01-05T00:00:00"), 42.0)], "k int, rts timestamp, price double")
    out = joins.as_of_join(left, right, key="k", left_ts="ts", right_ts="rts", right_values=["price"])
    assert out.collect()[0]["price"] == 42.0  # <= semantics


def test_broadcast_dim_join_plan(spark, sf_dir):
    fact = spark.read.parquet(f"{sf_dir}/customer.parquet")
    dim = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = joins.broadcast_dim_join(fact, dim, on=[fact.c_nationkey == dim.n_nationkey])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_range_join_containment_and_bounds(spark):
    # start inclusive, end exclusive; intervals spanning bucket borders
    # still match (interval explodes into every overlapped bucket).
    pts = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-08 00:00:00"),
         (3, "2024-01-05 12:00:00"), (4, "2023-12-31 23:59:59")],
        "pid int, ts_s string",
    ).select("pid", F.to_timestamp("ts_s").alias("ts"))
    iv = spark.createDataFrame(
        [(100, "2024-01-01 00:00:00", "2024-01-08 00:00:00")],
        "ivid int, s string, e string",
    ).select("ivid", F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e"))
    out = joins.range_join(pts, iv, "ts", "s", "e", bucket_seconds=2 * 86_400)
    got = sorted((r["pid"], r["ivid"]) for r in out.collect())
    assert got == [(1, 100), (3, 100)]  # 2 excluded (== end), 4 excluded (< start)


def test_range_join_avoids_nested_loop(spark):
    pts = spark.range(100).select(
        F.col("id").alias("pid"),
        (F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(hours=F.col("id").cast("int"))).alias("ts"),
    )
    iv = spark.createDataFrame(
        [(1, "2023-12-30 00:00:00", "2024-01-02 00:00:00")], "ivid int, s string, e string"
    ).select("ivid", F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e"))
    out = joins.range_join(pts, iv, "ts", "s", "e")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    # only the first 24 hourly points fall before the 2024-01-02 end bound
    assert out.count() == 24

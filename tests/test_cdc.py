"""CDC envelope unwrap + log compaction (SURVEY §2.1 S5)."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from realtimechurnpredictiondataengineering_spark.operators import cdc

PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def _env(op, ts_ms, row):
    body = {"op": op, "ts_ms": ts_ms}
    if op == "d":
        body["before"] = row
    else:
        body["after"] = row
    return (json.dumps(body),)


def test_unwrap_extracts_row_image(spark):
    rows = [
        _env("c", 100, {"id": 1, "name": "a"}),
        _env("u", 200, {"id": 1, "name": "b"}),
        _env("d", 300, {"id": 2, "name": "gone"}),
        ("not json at all",),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = cdc.unwrap_envelope(df, PAYLOAD).collect()
    by_op = {(r["_op"], r["id"]): r for r in out if r["_op"] is not None}
    assert by_op[("c", 1)]["name"] == "a"
    assert by_op[("u", 1)]["name"] == "b"
    # deletes carry the before-image
    assert by_op[("d", 2)]["name"] == "gone"
    # malformed JSON -> null row, not a crash
    assert sum(1 for r in out if r["_op"] is None) == 1


def test_latest_state_last_writer_wins_and_deletes_drop(spark):
    rows = [
        _env("c", 100, {"id": 1, "name": "a"}),
        _env("u", 300, {"id": 1, "name": "final"}),
        _env("u", 200, {"id": 1, "name": "mid"}),
        _env("c", 100, {"id": 2, "name": "x"}),
        _env("d", 200, {"id": 2, "name": "x"}),
        _env("d", 100, {"id": 3, "name": "never-created"}),
    ]
    df = spark.createDataFrame(rows, "value string")
    changes = cdc.unwrap_envelope(df, PAYLOAD).filter(F.col("_op").isNotNull())
    state = cdc.latest_state(changes, keys=["id"], seq_cols=["_ts_ms"]).collect()
    assert {(r["id"], r["name"]) for r in state} == {(1, "final")}
    # keep_deletes variant surfaces tombstones for downstream MERGE
    with_del = cdc.latest_state(changes, keys=["id"], seq_cols=["_ts_ms"], drop_deletes=False)
    assert {(r["id"], r["_op"]) for r in with_del.collect()} == {(1, "u"), (2, "d"), (3, "d")}


def test_latest_state_plan_is_single_shuffle(spark):
    df = spark.createDataFrame([_env("c", 1, {"id": 1, "name": "a"})], "value string")
    changes = cdc.unwrap_envelope(df, PAYLOAD)
    plan = cdc.latest_state(changes, ["id"], ["_ts_ms"])._jdf.queryExecution().optimizedPlan().toString()
    # a single Window operator (one shuffle on the key), no join/cartesian,
    # and the rank-limit pushdown (WindowGroupLimit) prunes each key to its
    # top row before the sort — the shape that survives a 100 TB change log.
    assert sum(1 for line in plan.splitlines() if line.lstrip("+- ").startswith("Window [")) == 1
    assert "WindowGroupLimit" in plan
    assert "join" not in plan.lower()


def test_scd2_history_versions_and_closes(spark):
    rows = [
        _env("c", 100, {"id": 1, "name": "v1"}),
        _env("u", 200, {"id": 1, "name": "v2"}),
        _env("c", 100, {"id": 2, "name": "x"}),
        _env("d", 300, {"id": 2, "name": "x"}),
    ]
    changes = cdc.unwrap_envelope(
        spark.createDataFrame(rows, "value string"), PAYLOAD
    ).filter(F.col("_op").isNotNull())
    hist = cdc.scd2_history(changes, keys=["id"], ts_col="_ts_ms").collect()
    by = {(r["id"], r["name"]): r for r in hist}
    # v1 closed by v2; v2 current
    assert by[(1, "v1")]["valid_to"] == 200 and not by[(1, "v1")]["is_current"]
    assert by[(1, "v2")]["valid_to"] is None and by[(1, "v2")]["is_current"]
    # key 2's create is closed by the delete, and the delete emits no row
    assert by[(2, "x")]["valid_to"] == 300 and not by[(2, "x")]["is_current"]
    assert len(hist) == 3


def test_merge_snapshot_upserts_and_deletes(spark, tmp_path):
    target = str(tmp_path / "snap")
    batch1 = cdc.unwrap_envelope(
        spark.createDataFrame(
            [_env("c", 100, {"id": 1, "name": "a"}), _env("c", 100, {"id": 2, "name": "b"})],
            "value string",
        ),
        PAYLOAD,
    )
    snap1 = cdc.merge_snapshot(spark, target, batch1, ["id"], ["_ts_ms"])
    snap1.write.mode("overwrite").parquet(target)

    batch2 = cdc.unwrap_envelope(
        spark.createDataFrame(
            [_env("u", 200, {"id": 1, "name": "a2"}), _env("d", 200, {"id": 2, "name": "b"}),
             _env("c", 200, {"id": 3, "name": "c"})],
            "value string",
        ),
        PAYLOAD,
    )
    snap2 = cdc.merge_snapshot(spark, target, batch2, ["id"], ["_ts_ms"])
    state = {r["id"]: r["name"] for r in snap2.collect()}
    assert state == {1: "a2", 3: "c"}  # 1 updated, 2 deleted, 3 inserted
    # target scan side must not shuffle: the change-key anti-join broadcasts
    plan = snap2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_scd2_lookup_point_in_time(spark):
    rows = [
        _env("c", 100, {"id": 1, "name": "v1"}),
        _env("u", 300, {"id": 1, "name": "v2"}),
        _env("c", 100, {"id": 2, "name": "x"}),
        _env("d", 200, {"id": 2, "name": "x"}),
    ]
    changes = cdc.unwrap_envelope(
        spark.createDataFrame(rows, "value string"), PAYLOAD
    ).filter(F.col("_op").isNotNull())
    hist = cdc.scd2_history(changes, keys=["id"], ts_col="_ts_ms")
    facts = spark.createDataFrame(
        [(1, 150), (1, 300), (1, 999), (2, 250)], "id int, fts long"
    )
    out = cdc.scd2_lookup(facts, hist.select("id", "name", "valid_from", "valid_to"),
                          keys=["id"], fact_ts="fts")
    got = sorted((r["id"], r["fts"], r["name"]) for r in out.collect())
    # ts=150 sees v1; ts=300 (boundary) and 999 see v2; key 2 at 250 is
    # after its delete -> no resurrection
    assert got == [(1, 150, "v1"), (1, 300, "v2"), (1, 999, "v2")]


def test_snapshot_diff_classifies_changes(spark):
    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "c", 1.0)], "id int, s string, v double"
    )
    new = spark.createDataFrame(
        [(2, "b", 5.0), (3, "c", 2.0), (4, "d", 9.0)], "id int, s string, v double"
    )
    got = {r["id"]: r["change_type"] for r in
           cdc.snapshot_diff(old, new, ["id"], ["s", "v"]).collect()}
    # 1 removed, 2 unchanged (absent), 3 changed, 4 added; null v in old
    # row 1 doesn't crash the null-safe compare
    assert got == {1: "removed", 3: "changed", 4: "added"}

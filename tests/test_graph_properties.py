"""Property-based tests: connected components vs a union-find model,
range join vs a brute-force model.

One hypothesis example = one Spark job, so example counts stay small
(the JVM round-trip, not the property, is the cost).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.operators import dedup, joins

PROP_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

EDGES = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    return {x: find(x) for x in parent}


@pytest.mark.slow  # randomized fuzz; deterministic twin stays in the default tier
@PROP_SETTINGS
@given(edges=EDGES)
def test_connected_components_matches_union_find(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a int, id_b int")
    # node ids reach 30, so a path graph can have diameter ~30: give the
    # loop enough rounds that the convergence guard cannot fire on a
    # legitimately deep (but correct) chain
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(pairs, max_iter=40).collect()
    }
    want = _union_find_components(edges)
    assert got == want


INTERVALS = st.lists(
    st.tuples(st.integers(0, 500), st.integers(1, 100)),  # (start, length)
    min_size=1,
    max_size=15,
)
POINTS = st.lists(st.integers(0, 700), min_size=1, max_size=30)


@PROP_SETTINGS
@given(intervals=INTERVALS, points=POINTS)
def test_range_join_matches_brute_force(spark, intervals, points):
    iv_rows = [(i, s, s + ln) for i, (s, ln) in enumerate(intervals)]
    pt_rows = [(i, p) for i, p in enumerate(points)]
    iv = spark.createDataFrame(iv_rows, "ivid int, s_off long, e_off long").select(
        "ivid",
        F.timestamp_seconds("s_off").alias("s"),
        F.timestamp_seconds("e_off").alias("e"),
    )
    pt = spark.createDataFrame(pt_rows, "pid int, p_off long").select(
        "pid", F.timestamp_seconds("p_off").alias("ts")
    )
    out = joins.range_join(pt, iv, "ts", "s", "e", bucket_seconds=37)
    got = sorted((r["pid"], r["ivid"]) for r in out.collect())
    want = sorted(
        (pi, ii)
        for pi, p in pt_rows
        for ii, s, e in iv_rows
        if s <= p < e
    )
    assert got == want


def test_connected_components_long_chain_converges_fast(spark):
    # a 200-link chain has diameter 200; pointer jumping must converge
    # within O(log n) rounds — plain neighbor propagation would need 200
    # rounds and trip the max_iter guard
    chain = [(i, i + 1) for i in range(200)]
    got = dedup.connected_components(
        spark.createDataFrame(chain, "id_a int, id_b int"), max_iter=12
    )
    rows = got.collect()
    assert len(rows) == 201
    assert {r["component"] for r in rows} == {0}


def test_connected_components_1000_link_chain_design_depth(spark):
    # The design-depth case for the pointer jump: a 1,000-link chain
    # (mirror-cascade duplicates) must converge well under 20 rounds —
    # 2 plain-propagation warm rounds + ~log2(1000) jump rounds.  The
    # worst labels start at the far end, so this exercises the jump path
    # end-to-end at the depth the operator documents.
    chain = [(i, i + 1) for i in range(1000)]
    got = dedup.connected_components(
        spark.createDataFrame(chain, "id_a int, id_b int"), max_iter=16
    )
    rows = got.collect()
    assert len(rows) == 1001
    assert {r["component"] for r in rows} == {0}

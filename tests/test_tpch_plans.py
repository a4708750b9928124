"""Plan-shape regression tests for the TPC-H-adapted suite (h*).

Correctness is the oracle harness's job; these lock in the SCALE
properties of the physical plans — dims broadcast instead of shuffling
the fact table, selective filters reach the parquet scan, and top-k
plans as TakeOrderedAndProject rather than a global sort — so a future
refactor that silently degrades the plan fails loudly.
"""

from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY


def _plans(spark, sf_dir, name):
    df = REGISTRY[name][0](spark, sf_dir)
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString(), qe.toString()


def test_h03_topk_avoids_global_sort(spark, sf_dir):
    physical, full = _plans(spark, sf_dir, "h03_shipping_priority")
    assert "TakeOrderedAndProject" in physical  # limit+orderBy fused, no global sort
    # the segment filter is pushed into the customer scan
    assert "EqualTo(c_mktsegment,BUILDING)" in full


def test_h05_dims_broadcast_and_dates_pushed(spark, sf_dir):
    physical, full = _plans(spark, sf_dir, "h05_local_supplier_volume")
    assert "BroadcastHashJoin" in physical
    assert "SortMergeJoin" not in physical  # nothing big enough to SMJ at test SF
    assert "GreaterThanOrEqual(o_orderdate" in full  # date range reaches the scan
    assert "EqualTo(r_name,ASIA)" in full


def test_h14_part_broadcast_and_month_pushed(spark, sf_dir):
    physical, full = _plans(spark, sf_dir, "h14_promo_revenue")
    assert "BroadcastHashJoin" in physical
    assert "GreaterThanOrEqual(l_shipdate" in full


def test_h18_semi_join_on_having_aggregate(spark, sf_dir):
    physical, _ = _plans(spark, sf_dir, "h18_large_volume_customer")
    assert "LeftSemi" in physical
    assert "TakeOrderedAndProject" in physical


def test_h07_nation_pair_prunes_before_fact_join(spark, sf_dir):
    physical, full = _plans(spark, sf_dir, "h07_volume_shipping")
    assert "BroadcastHashJoin" in physical
    # the 2-nation filter reaches the nation scans, so the broadcast side
    # is pre-pruned rather than filtering after the fact join
    assert "In(n_name, [NATION_1,NATION_2])" in full
    # the ship-date window reaches the lineitem scan
    assert "GreaterThanOrEqual(l_shipdate" in full


def test_h13_left_join_keeps_zero_order_customers(spark, sf_dir):
    physical, _ = _plans(spark, sf_dir, "h13_customer_distribution")
    # the priority filter must stay on the orders side of the LEFT join
    # (pushing it past the join would drop zero-order customers)
    assert "LeftOuter" in physical or "RightOuter" in physical


def test_h21_exists_pair_plans_semi_and_anti(spark, sf_dir):
    physical, _ = _plans(spark, sf_dir, "h21_waiting_supplier")
    assert "LeftSemi" in physical
    assert "LeftAnti" in physical
    assert "CartesianProduct" not in physical


def test_h20_part_filter_under_aggregate(spark, sf_dir):
    physical, full = _plans(spark, sf_dir, "h20_potential_promotion")
    # the red-part broadcast prunes lineitem BEFORE its one shuffle, and
    # the supplier probe is a broadcast semi-join — no sort-merge anywhere
    assert "BroadcastHashJoin" in physical
    assert "LeftSemi" in physical
    assert "SortMergeJoin" not in physical
    assert "StartsWith(p_name,red)" in full


def test_h15_scalar_max_broadcasts(spark, sf_dir):
    physical, _ = _plans(spark, sf_dir, "h15_top_supplier")
    # the 1-row MAX aggregate must join by broadcast, never shuffle the
    # revenue partials a second time
    assert "BroadcastNestedLoopJoin" in physical or "BroadcastHashJoin" in physical

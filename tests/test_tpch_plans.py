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

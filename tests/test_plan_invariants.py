"""Engine-wide physical-plan invariants over the whole query inventory.

Builds (without executing) every registered query's plan at sf0.001 and
asserts the properties that keep 100 TB runs alive:

- no CartesianProduct anywhere;
- BroadcastNestedLoopJoin only where a broadcast of a handful of query
  vectors against the corpus is the intended design (brute-force ANN);
- every query that reads parquet prunes columns (no scan reads the full
  documents/embeddings schema unless the query genuinely needs it).
"""

import pytest

from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY

# Queries whose *construction* executes jobs (iterative label propagation
# materializes per-round; the silver feeds run the synthetic generator).
# Their plan shapes are asserted in their own tests instead.
EXECUTES_ON_BUILD = {"d06_dup_clusters"} | {n for n in REGISTRY if n.startswith("sv")}

# BroadcastNestedLoopJoin by design:
# - brute-force ANN broadcasts a handful of query vectors against every
#   corpus row (v01/v02);
# - t07/st09/h11/h15/h22 cross-join a ONE-ROW broadcast aggregate
#   (corpus size N, time bounds, global total, max revenue, avg balance)
#   — the scalar-subquery pattern, O(rows) not O(rows²).
BNLJ_ALLOWED = {
    "v01_vector_norms",
    "v02_brute_force_topk",
    "v07_quantized_topk",  # int8 scan broadcasts the 3 quantized queries
    "v08_mips_topk",  # broadcast query-set pattern, same as v02
    "t07_tfidf_top_terms",
    "st09_gap_fill",
    "h11_important_parts",
    "h15_top_supplier",
    "h22_global_sales_opportunity",
    "z01_zorder_values",  # 1-row min/max layout-stats aggregate broadcast onto rows
    "s08_mixture_weights",  # 1-row normalizer (Σn^α, Σn) broadcast onto the per-source counts
    "v09_ann_recall",  # exact side reuses v02's broadcast query-set scan
    "d11_exact_contamination",  # eval-suite probe table broadcast over the corpus scan (multi-pattern contains)
    "t14_quality_threshold",  # 1-row exact-percentile threshold broadcast onto scored rows
    "t16_unigram_logprob",  # 1-row corpus token total broadcast onto the scoring join
    "v11_knn_label_accuracy",  # leave-one-out eval: broadcast eval-slice queries over one scan (v02 shape)
    "t17_unigram_logprob_capped",  # 1-row (total, top-V mass) constants broadcast onto the scoring join
    "t18_bigram_logprob",  # 1-row corpus token total broadcast onto the bigram scoring join
    "v12_pq_topk",  # broadcast query-LUT set over the coded corpus scan (v02 shape)
    "d14_tf_cosine_pairs",  # 1-row corpus count broadcast into the fractional df-cap filter
    "v14_pq_recall",  # exact side is v08's broadcast query-set scan (recall needs the exact ranking)
    "t19_trigram_logprob",  # 1-row corpus token total broadcast onto the trigram scoring join
}


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name, (fn, _sql) in REGISTRY.items():
        if name in EXECUTES_ON_BUILD:
            continue
        df = fn(spark, sf_dir)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_products(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == []


def test_nested_loop_joins_only_where_designed(plans):
    offenders = [
        n for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    ]
    assert offenders == []


def test_column_pruning_reaches_the_scan(spark, sf_dir):
    # spot invariant: a two-column query over the six-column orders table
    # must not read the other four (ReadSchema pruning).
    import io
    import contextlib

    df = REGISTRY["s02_hash_sample"][0](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    read_schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schemas, "expected a parquet scan with ReadSchema"
    for ln in read_schemas:
        assert "o_totalprice" not in ln and "o_orderdate" not in ln

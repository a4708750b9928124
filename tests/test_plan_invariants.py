"""Engine-wide physical-plan invariants over the whole query inventory.

Builds (without executing) every registered query's plan at sf0.001 and
asserts the properties that keep 100 TB runs alive:

- no CartesianProduct anywhere;
- BroadcastNestedLoopJoin only with a build side that provably cannot
  scale with the data: the check is SHAPE-BASED (a keyless ≤1-row
  aggregate, a driver-local frame, an explicit limit, or a join of
  such), so new scalar-subquery-style broadcasts are admitted
  automatically and the gate cannot go stale when one is added.  The
  only names listed by hand are builds bounded by DOMAIN rather than
  structure (literal-keyed query sets, the eval-split probe table) —
  adding one is a conscious design decision, which is the point;
- every query that reads parquet prunes columns (no scan reads the full
  documents/embeddings schema unless the query genuinely needs it).
"""

import pytest

from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY

# Queries whose *construction* executes jobs (iterative label propagation
# materializes per-round; streaming fixtures run an AvailableNow query),
# so the whole-plan fixture cannot build them lazily.  They are NOT
# exempt from the gate: every constituent stage that CAN be planned
# lazily is asserted below with the same walkers —
# test_cc_stage_plans_keep_gate_shape audits the per-round CC plans that
# d06/ll06 iterate, and test_ll06_post_cc_plan_shape audits ll06's
# composition downstream of the checkpointed labels.  Adding a name here
# requires adding its stage assertions too.
STAGE_ASSERTED_EXECUTES_ON_BUILD = {
    "d06_dup_clusters",
    "ll06_refinedweb_pipeline",
    "ll08_hybrid_dedup",
    "ml02_streaming_churn_scores",
    # ll10 = decon (lazy half gate-audited via d15's plan) + the ll06
    # chain (stage-asserted by test_ll06_post_cc_plan_shape + the CC
    # round gate); running CC on build keeps it out of the whole-plan
    # fixture exactly like ll06.
    "ll10_decontaminated_refinedweb",
    # c07 runs an AvailableNow streaming query at call time; its
    # per-batch merge stage is EXACTLY c06's plan (cdc.merge_frames on
    # the same frames), which the whole-plan fixture audits, and the
    # foreachBatch body is parity-pinned in tests/test_round9_ops.py.
    "c07_streaming_merge_upserts",
    # t29 checkpoints every training round on build; its two lazy
    # stages (pair counting, broadcast-batch merge application) are
    # asserted by test_t29_bpe_stage_plan_shape.
    "t29_bpe_merges",
    # t30 trains (= t29's checkpoints) on build; its lazy segmentation
    # stage is asserted by test_t30_segment_stage_plan_shape.
    "t30_bpe_segment",
    # ll11 = a scan-local compiled-logit filter (t31's expression, in
    # the whole-plan fixture via t31) + the ll06 chain, whose stages
    # are covered by test_ll06_post_cc_plan_shape and the CC round
    # gate; running CC on build keeps it out of the fixture like ll06.
    "ll11_model_filtered_refinedweb",
    # t32 runs an AvailableNow streaming query at call time (the ml02
    # shape); its one plannable stage is asserted by
    # test_t32_scoring_stage_plan_is_a_pure_projection.
    "t32_streaming_quality_scores",
    # ll12 is ll06 with the ranking expression swapped (t31's prob, in
    # the whole-plan fixture via t31); every stage that shuffles is
    # ll06's, covered by test_ll06_post_cc_plan_shape + the CC gate.
    "ll12_dclm_ranked_select",
    # ll14 runs an AvailableNow streaming query at call time (the
    # t32/c07 shape); its stages are t13's scan-local gate projection
    # (whole-plan fixture via t13's operator), the broadcast
    # fingerprint anti-join + watermarked dedup (bounded-state tests in
    # tests/test_streaming.py), and t30's segmentation stage
    # (test_t30_segment_stage_plan_shape).
    "ll14_streaming_corpus_ingest",
}

# BNLJ builds that are bounded by DOMAIN, not by plan structure — the
# build side reads a real table, so the shape check cannot prove it
# small, but the query's contract does: a literal-keyed handful of query
# vectors, or the eval split (KBs by definition, the d07/d11 contract).
# Everything else (the 1-row scalar-subquery broadcasts: t07, t14,
# t16-t21, st09, h11, h22, z01, s08, ...) is admitted by shape and needs
# no entry here.
BNLJ_DOMAIN_BOUNDED = {
    "v02_brute_force_topk": "3 literal-keyed query vectors broadcast over the corpus scan",
    "v07_quantized_topk": "3 quantized query vectors (int8 scan) broadcast",
    "v08_mips_topk": "literal-keyed query set, the v02 shape",
    "v09_ann_recall": "exact side reuses v02's broadcast query-set scan",
    "v11_knn_label_accuracy": "leave-one-out eval-slice queries broadcast (v02 shape)",
    "v12_pq_topk": "per-query ADC LUT set broadcast over the coded corpus scan",
    "v14_pq_recall": "exact side is v08's broadcast query-set scan",
    "d11_exact_contamination": "eval-suite probe table (bench split) broadcast",
    "v18_truncated_recall": "both passes broadcast the 3-query literal-keyed set (v02 shape)",
    "v19_kmeans_assign": "1-row broadcast: the k-row checkpointed centroid frame "
    "collapses onto one cluster-ascending array row (keyless collect_list over an "
    "opaque ExistingRDD the shape rule cannot read) before the assignment crossJoin",
}

_AGG = ("HashAggregate", "ObjectHashAggregate", "SortAggregate")
_BOUNDED_LEAF = ("LocalTableScan", "GlobalLimit", "TakeOrderedAndProject", "CollectLimit")
_PASS_THROUGH = (
    "Project",
    "Filter",
    "Sort",
    "Coalesce",
    "Exchange",
    "BroadcastExchange",
    "ReusedExchange",
    "WholeStageCodegen",
    "InputAdapter",
    "ColumnarToRow",
)


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _unwrap_aqe(node):
    # a cached frame's plan arrives as a childless AdaptiveSparkPlan
    # wrapper; its pre-adaptive plan is what carries the join shape
    if node.nodeName().startswith("AdaptiveSparkPlan"):
        for accessor in ("initialPlan", "executedPlan"):
            try:
                return getattr(node, accessor)()
            except Exception:
                continue
    return node


def _walk(node):
    node = _unwrap_aqe(node)
    yield node
    if node.nodeName().startswith("InMemoryTableScan"):
        # a BNLJ can hide inside a persisted frame's cached plan (the
        # executedPlan text prints it; the children() walk won't reach it)
        try:
            yield from _walk(node.relation().cachedPlan())
        except Exception:
            pass
    for c in _children(node):
        yield from _walk(c)


def _bounded(node) -> bool:
    """True iff the subtree's row count cannot scale with the data:
    a keyless (≤1-row) aggregate, a driver-local frame, an explicit
    limit, a join/union of bounded inputs, or a row-preserving wrapper
    over one."""
    node = _unwrap_aqe(node)
    name = node.nodeName()
    if name.startswith(_AGG):
        # keyless aggregate → exactly one row, regardless of input size;
        # a KEYED aggregate's cardinality scales with the data → not bounded
        return node.groupingExpressions().isEmpty()
    if name.startswith(_BOUNDED_LEAF):
        return True
    if name.startswith("InMemoryTableScan"):
        try:
            return _bounded(node.relation().cachedPlan())
        except Exception:
            return False
    if "Join" in name or name.startswith("Union"):
        kids = _children(node)
        return bool(kids) and all(_bounded(c) for c in kids)
    if name.startswith(_PASS_THROUGH):
        kids = _children(node)
        return len(kids) == 1 and _bounded(kids[0])
    return False


def _plan_of(df):
    qe = df._jdf.queryExecution()
    return qe.sparkPlan(), qe.executedPlan().toString()


def _bad_joins(name, tree, text, allow_domain_bounded=True):
    """The gate's core check over one plan: every BNLJ build side must be
    provably bounded (or the query domain-bounded by hand), and a BNLJ
    hidden inside a subquery expression must not pass unexamined."""
    offenders = []
    walked = 0
    listed = allow_domain_bounded and name in BNLJ_DOMAIN_BOUNDED
    for node in _walk(tree):
        if "BroadcastNestedLoopJoin" not in node.nodeName():
            continue
        walked += 1
        if listed:
            continue
        side = node.buildSide().toString()
        build = _children(node)[1 if side == "BuildRight" else 0]
        if not _bounded(build):
            offenders.append((name, build.nodeName()))
    if walked == 0 and "BroadcastNestedLoopJoin" in text and not listed:
        offenders.append((name, "<subquery-hidden BNLJ>"))
    return offenders


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name, (fn, _sql) in REGISTRY.items():
        if name in STAGE_ASSERTED_EXECUTES_ON_BUILD:
            continue
        df = fn(spark, sf_dir)
        out[name] = _plan_of(df)
    return out


def test_no_cartesian_products(plans):
    offenders = [n for n, (_, s) in plans.items() if "CartesianProduct" in s]
    assert offenders == []


def test_nested_loop_joins_only_where_designed(plans):
    offenders = []
    for name, (tree, text) in plans.items():
        offenders += _bad_joins(name, tree, text)
    assert offenders == []


def test_stage_asserted_set_is_live(plans):
    # every name excluded from the whole-plan fixture must still exist in
    # the registry (a renamed query must not silently re-enter the
    # fixture) AND must genuinely execute on build — if it stops doing
    # so, it belongs back in the fixture, not in this set
    assert STAGE_ASSERTED_EXECUTES_ON_BUILD <= set(REGISTRY)
    assert not (STAGE_ASSERTED_EXECUTES_ON_BUILD & set(plans))


def test_cc_stage_plans_keep_gate_shape(spark, sf_dir):
    # The per-round plans d06/ll06 iterate (connected_components runs
    # jobs at build time, so the whole-plan fixture never sees them):
    # edge normalization, one min-label propagation round, and the
    # pointer-jump round must each plan pure equi-joins — no
    # CartesianProduct, no unbounded BroadcastNestedLoopJoin.  The pair
    # frame is scan-derived so boundedness is not trivially satisfied.
    from pyspark.sql import functions as F

    from realtimechurnpredictiondataengineering_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = docs.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    edges = dedup._cc_edges(pairs)
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
    )
    propagated = dedup._cc_propagate(edges, labels)
    jumped = dedup._cc_jump(propagated)
    contracted = dedup._cc_contract(edges, labels)
    offenders = []
    for stage, df in (
        ("edges", edges),
        ("propagate", propagated),
        ("jump", jumped),
        ("contract", contracted),
    ):
        tree, text = _plan_of(df)
        assert "CartesianProduct" not in text, stage
        offenders += _bad_joins(f"cc:{stage}", tree, text, allow_domain_bounded=False)
    assert offenders == []


def test_ll06_post_cc_plan_shape(spark, sf_dir):
    # ll06's composition DOWNSTREAM of the checkpointed CC labels (reps
    # pick -> anti/semi survivor union -> token-budget prefix), built
    # against a lazy scan-derived component frame so the walkers can see
    # through it — the half of ll06 the whole-plan fixture cannot audit.
    from pyspark.sql import functions as F

    from realtimechurnpredictiondataengineering_spark.functions import text as tx
    from realtimechurnpredictiondataengineering_spark.plans import corpus_prep

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = docs.withColumn("quality", tx.quality_score("text")).select(
        "doc_id", "text", "quality"
    )
    comps = docs.select(
        F.col("doc_id").alias("id"), F.pmod("doc_id", F.lit(7)).alias("component")
    )
    df = corpus_prep._post_cc_budget_select(exact, comps, budget=20_000)
    tree, text = _plan_of(df)
    assert "CartesianProduct" not in text
    assert _bad_joins("ll06:post_cc", tree, text, allow_domain_bounded=False) == []


def test_ll08_edge_stage_plan_shape(spark, sf_dir):
    # ll08's lazy half upstream of the iterative CC: the MinHash-LSH
    # pair graph unioned with the SemDeDup pair graph, semantic
    # endpoints semi-restricted to the doc id domain.  Both generators
    # must stay bucketed equi-joins — no CartesianProduct, no unbounded
    # BNLJ anywhere in the union plan.  (Post-CC composition and the CC
    # rounds themselves are covered by test_ll06_post_cc_plan_shape and
    # test_cc_stage_plans_keep_gate_shape — ll08 shares both stages.)
    from pyspark.sql import functions as F

    from realtimechurnpredictiondataengineering_spark.functions import text as tx
    from realtimechurnpredictiondataengineering_spark.plans import corpus_prep
    from realtimechurnpredictiondataengineering_spark.plans.inventory import (
        _ivf_centroids,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = docs.withColumn("quality", tx.quality_score("text")).select(
        "doc_id", "text", "quality"
    )
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    edges = corpus_prep.hybrid_dedup_edges(
        scored, vecs, _ivf_centroids(), cos_threshold=0.3, portable_hash=True
    )
    tree, text = _plan_of(edges)
    assert "CartesianProduct" not in text
    assert _bad_joins("ll08:edges", tree, text, allow_domain_bounded=False) == []


def test_ml02_scoring_stage_plan_is_a_pure_projection(spark):
    # ml02 runs an AvailableNow streaming query at call time, so the
    # whole-plan fixture never sees it; its one plannable stage is the
    # scoring projection over the feature source.  Built on the batch
    # twin of the same source (identical plan below the source node), it
    # must be shuffle-free, join-free whole-stage arithmetic — the
    # property that makes "streaming scoring == batch scoring" hold.
    from realtimechurnpredictiondataengineering_spark import ml

    df = ml.churn_scores(
        spark.read.parquet(ml.GOLD_FEATURES_FIXTURE),
        ml.MODEL_V1["coefficients"],
        ml.MODEL_V1["intercept"],
    )
    tree, text = _plan_of(df)
    assert "CartesianProduct" not in text
    assert "Join" not in text
    assert "Exchange" not in text
    assert _bad_joins("ml02:score", tree, text, allow_domain_bounded=False) == []


def test_t29_bpe_stage_plan_shape(spark, sf_dir):
    # t29 checkpoints every round at call time, so the whole-plan
    # fixture never sees its real work; the two lazy stages are audited
    # here.  Stage 1 (pair counting): one aggregate over the exploded
    # symbol pairs — no join at all.  Stage 2 (merge application): the
    # crossJoin's build side is the keyless collect_list aggregate
    # (provably 1 row), and the application itself is a scan-local
    # projection — no shuffle beyond the build's own.
    from realtimechurnpredictiondataengineering_spark.operators.bpe import (
        _init_symbols,
        _pair_counts,
        word_frequencies,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    syms = _init_symbols(word_frequencies(docs))
    counts = _pair_counts(syms)
    tree, text = _plan_of(counts)
    assert "CartesianProduct" not in text
    assert "Join" not in text  # pure explode + aggregate
    batch = (
        counts.orderBy(F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym"))
        .limit(1)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("left_sym").alias("a"), F.col("right_sym").alias("b"))
                )
            ).alias("__ms")
        )
    )
    applied = syms.crossJoin(F.broadcast(batch)).select(
        "__w",
        "__freq",
        F.aggregate(
            "__ms",
            F.col("__sym"),
            lambda acc, m: F.replace(
                acc,
                F.concat(F.lit(" "), m.a, F.lit("  "), m.b, F.lit(" ")),
                F.concat(F.lit(" "), m.a, m.b, F.lit(" ")),
            ),
        ).alias("__sym"),
    )
    tree, text = _plan_of(applied)
    assert "CartesianProduct" not in text
    assert _bad_joins("t29:apply", tree, text, allow_domain_bounded=False) == []


def test_t32_scoring_stage_plan_is_a_pure_projection(spark, sf_dir):
    # t32's plannable stage is the compiled quality-scoring projection
    # over the document source — shuffle-free, join-free whole-stage
    # arithmetic (the ml02 doctrine: that property IS why streaming
    # scoring equals batch scoring).
    from realtimechurnpredictiondataengineering_spark import ml

    df = ml.doc_quality_scores(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        ml.DOC_QUALITY_V1["coefficients"],
        ml.DOC_QUALITY_V1["intercept"],
    )
    tree, text = _plan_of(df)
    assert "CartesianProduct" not in text
    assert "Join" not in text
    assert "Exchange" not in text
    assert _bad_joins("t32:score", tree, text, allow_domain_bounded=False) == []


def test_t30_segment_stage_plan_shape(spark, sf_dir):
    # t30's lazy half: segmentation under a merge table.  Fed a
    # driver-local merges frame (nothing executes), the plan must be
    # the broadcast of a keyless 1-row aggregate into a scan-local
    # projection — no shuffle of the document side, no unbounded BNLJ.
    from realtimechurnpredictiondataengineering_spark.operators.bpe import bpe_segment_frame

    merges = spark.createDataFrame(
        [(1, "a", "b"), (2, "ab", "c")], "merge_rank int, left_sym string, right_sym string"
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seg = bpe_segment_frame(docs, merges).select("doc_id", "n_bpe_tokens", "bpe_text")
    tree, text = _plan_of(seg)
    assert "CartesianProduct" not in text
    assert _bad_joins("t30:segment", tree, text, allow_domain_bounded=False) == []
    # the document side must not shuffle: the only exchange is the
    # 1-row broadcast (plus the keyless agg's own single-partition)
    assert "Exchange hashpartitioning" not in text


def test_domain_bounded_list_is_live(plans):
    # stale-proofing in the other direction: every hand-listed name must
    # still exist and still plan a BNLJ — dead entries rot the gate
    stale = [
        n
        for n in BNLJ_DOMAIN_BOUNDED
        if n not in plans or "BroadcastNestedLoopJoin" not in plans[n][1]
    ]
    assert stale == []


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


def test_pq_init_rank_filter_plans_as_window_group_limit(spark, sf_dir):
    # The PQ codebook init (`row_number() over (partition by j) <= ksub`,
    # operators/similarity.py:_pq_init_books) relies on Spark's
    # WindowGroupLimit pushdown to prune map-side instead of sorting the
    # FULL subvector table inside each of the m partitions.  The
    # optimization fires on this shape in Spark 3.5+, but a version or
    # shape change could silently turn the init into a full
    # per-partition sort at corpus scale — pin it in the physical plan.
    from pyspark.sql import functions as F

    from realtimechurnpredictiondataengineering_spark.operators.similarity import _pq_init_books

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dsub = 2
    sub = emb.select(
        F.col("vec_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda j: F.slice(
                    F.col("embedding").cast("array<double>"), j * dsub + 1, dsub
                ),
            )
        ).alias("j", "__v"),
    )
    plan = (
        _pq_init_books(sub, 8, "vec_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan[:2000]

"""Dedup operator tests: planted near-duplicates must be found, and the
physical plans must stay bucketed (no cartesian product anywhere).
"""

import pytest
from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.operators import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 0
    (2, "completely different content about database query optimization and joins"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (4, "spark structured streaming with watermarks and stateful aggregation operators"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _assert_no_cartesian(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_content_dedup(spark, docs):
    out = dedup.content_hash_dedup(docs)
    ids = {r["doc_id"] for r in out.collect()}
    assert 0 in ids and 3 not in ids  # min-id survivor
    assert len(ids) == 4


def test_minhash_finds_planted_near_dup(spark, docs):
    pairs = dedup.minhash_near_duplicates(docs, shingle_k=3, threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found
    assert (0, 3) in found  # exact dups are trivially near-dups
    jacc = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert jacc[(0, 3)] == 1.0


def test_minhash_plan_is_bucketed(spark, docs):
    _assert_no_cartesian(dedup.minhash_near_duplicates(docs, threshold=0.5))


def test_near_dedup_survivors(spark, docs):
    surv = dedup.near_dedup(docs, shingle_k=3, threshold=0.5)
    ids = {r["doc_id"] for r in surv.collect()}
    assert 0 in ids and 1 not in ids and 3 not in ids
    assert 2 in ids and 4 in ids


def test_simhash_hamming(spark, docs):
    pairs = dedup.simhash_near_duplicates(docs, max_hamming=10)
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert found.get((0, 3)) == 0  # identical text → identical fingerprint
    assert (0, 1) in found
    _assert_no_cartesian(pairs)


def test_ngram_jaccard_exact_values(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.4)
    vals = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert vals[(0, 3)] == 1.0
    # doc 0 vs 1 differ in the last word: 12 shingles each (14 tokens,
    # k=3), 11 shared → J = 11/13
    assert abs(vals[(0, 1)] - round(11 / 13, 4)) < 1e-9
    _assert_no_cartesian(pairs)


def test_embedding_near_dup_finds_identical(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.standard_normal(16)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base * 1.001]),  # same direction → cos ≈ 1
        (2, [float(x) for x in rng.standard_normal(16)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = rng.standard_normal((6, 16)).tolist()
    pairs = dedup.embedding_near_duplicates(df, planes, threshold=0.99)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert found == {(0, 1)}
    _assert_no_cartesian(pairs)


def test_bucket_cap_prunes_degenerate_buckets(spark):
    # 50 identical docs: with max_bucket=10 the (single) bucket is
    # dropped entirely → no pairs, no quadratic reducer.
    rows = [(i, "same text everywhere for all documents here") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.minhash_near_duplicates(df, shingle_k=3, threshold=0.5, max_bucket=10)
    assert out.count() == 0


def test_connected_components_transitive(spark):
    # chain 1-2-3 plus isolated pair (7,9): labels converge to the min id
    # of each component, including multi-hop reachability.
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (7, 9), (9, 8)], "id_a int, id_b int"
    )
    comp = {r["id"]: r["component"] for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7}


def test_connected_components_contraction_no_stranded_node(spark):
    # Regression: after round 0's edge contraction the edge set lives in
    # label space, so node 3 in the chain 1-2-3 (whose label is 2 after
    # round 0) can ONLY receive the component minimum through the
    # pointer jump — a jump deferred past round 1 let convergence fire
    # with 3 stranded one hop behind its root ({1,2} + {3} instead of
    # {1,2,3}).
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a int, id_b int")
    comp = {r["id"]: r["component"] for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1}


def test_connected_components_converges_early(spark):
    # a single edge converges in one round; max_iter is only a guard
    pairs = spark.createDataFrame([(5, 4)], "id_a int, id_b int")
    out = dedup.connected_components(pairs, max_iter=2).collect()
    assert {(r["id"], r["component"]) for r in out} == {(4, 4), (5, 4)}


def test_portable_minhash_finds_planted_near_dup(spark, docs):
    # The oracle-portable hash family must keep the operator's recall:
    # same planted near-dups, same exact-Jaccard verify values.
    pairs = dedup.minhash_near_duplicates(
        docs, shingle_k=3, threshold=0.5, portable_hash=True
    ).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert (0, 1) in found
    assert found[(0, 3)] == 1.0


def test_portable_simhash_finds_exact_dup(spark, docs):
    pairs = dedup.simhash_near_duplicates(docs, max_hamming=8, portable_hash=True).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert found[(0, 3)] == 0  # identical docs -> identical fingerprints


def test_portable_signatures_differ_from_default_but_verify_identically(spark, docs):
    # Different hash family, different candidate sets are allowed — but
    # any pair BOTH families emit must carry the same exact Jaccard
    # (verification is hash-independent).
    a = {(r["id_a"], r["id_b"]): r["jaccard"]
         for r in dedup.minhash_near_duplicates(docs, shingle_k=3, threshold=0.5).collect()}
    b = {(r["id_a"], r["id_b"]): r["jaccard"]
         for r in dedup.minhash_near_duplicates(
             docs, shingle_k=3, threshold=0.5, portable_hash=True).collect()}
    for pair in set(a) & set(b):
        assert a[pair] == b[pair]

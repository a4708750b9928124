"""Similarity-search tests: brute force against a NumPy ground truth,
LSH recall sanity, and plan-shape checks (query side broadcast)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.operators import similarity

N, DIM, K = 200, 32, 5


@pytest.fixture(scope="module")
def corpus_np():
    rng = np.random.default_rng(123)
    return rng.standard_normal((N, DIM))


@pytest.fixture(scope="module")
def corpus(spark, corpus_np):
    rows = [(i, [float(x) for x in corpus_np[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _ground_truth_topk(corpus_np, qi, k):
    q = corpus_np[qi]
    sims = corpus_np @ q / (np.linalg.norm(corpus_np, axis=1) * np.linalg.norm(q))
    return [int(i) for i in np.argsort(-sims)[:k]]


def test_brute_force_matches_numpy(spark, corpus, queries, corpus_np):
    out = similarity.brute_force_topk(corpus, queries, k=K).collect()
    by_query = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        by_query.setdefault(r["query_id"], []).append(r["vec_id"])
    for qi in range(3):
        assert by_query[qi] == _ground_truth_topk(corpus_np, qi, K)


def test_brute_force_broadcasts_queries(spark, corpus, queries):
    plan = similarity.brute_force_topk(corpus, queries, k=K)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_lsh_topk_recall(spark, corpus, queries, corpus_np):
    rng = np.random.default_rng(7)
    plane_sets = [rng.standard_normal((4, DIM)).tolist() for _ in range(8)]
    out = similarity.lsh_topk(corpus, queries, plane_sets, k=K).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r["query_id"], set()).add(r["vec_id"])
    # rank-1 hit must be the query itself (cos=1 with itself, always
    # bucketed together); overall recall vs exact top-5 should be decent.
    hits = sum(
        len(by_query.get(qi, set()) & set(_ground_truth_topk(corpus_np, qi, K)))
        for qi in range(3)
    )
    assert all(qi in by_query.get(qi, set()) for qi in range(3))
    assert hits >= 6  # ≥40% recall with 8×4-bit tables on random data


def test_topk_reduce_deterministic_ties(spark):
    rows = [("q", 1, 0.5), ("q", 2, 0.5), ("q", 3, 0.9)]
    df = spark.createDataFrame(rows, "query_id string, vec_id long, cos_sim double")
    out = similarity.topk_reduce(df, "query_id", "vec_id", "cos_sim", 2).collect()
    ranked = sorted((r["rank"], r["vec_id"]) for r in out)
    # tie on 0.5 broken by id descending (struct sort) → id 2 beats 1
    assert ranked == [(1, 3), (2, 2)]


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    qs = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = train_ivf_centroids([r["embedding"] for r in e.limit(400).collect()], nlist=8)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(e, qs, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(e, qs, cents, k=5, nprobe=4).collect()
    }
    # probing half the lists must recover most of the exact top-k, and the
    # query vector itself (cos=1) is always in its own probe list
    assert len(exact & approx) / len(exact) >= 0.6
    assert all((q, q) in approx for q in (0, 1, 2))


def test_ivf_centroids_deterministic_and_unit_norm(spark):
    import numpy as np
    from realtimechurnpredictiondataengineering_spark.operators.similarity import train_ivf_centroids

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((200, 16)).tolist()
    a = train_ivf_centroids(vecs, nlist=4)
    b = train_ivf_centroids(vecs, nlist=4)
    assert a == b
    assert all(abs(float(np.linalg.norm(c)) - 1.0) < 1e-9 for c in a)


def test_quantize_int8_edges(spark):
    from realtimechurnpredictiondataengineering_spark.functions import vectors as vec

    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0]), (3, [])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in vec.quantize_int8(df).collect()}
    assert got[1]["scale"] == 2.0
    assert got[1]["qvec"] == [64, -127, 32]  # floor(127*v/2 + .5)
    assert got[2]["qvec"] == [0, 0] and got[2]["scale"] == 0.0
    assert got[3]["qvec"] == [] and got[3]["scale"] == 0.0


def test_quantized_topk_rescore_matches_brute_force(spark, corpus, queries, corpus_np):
    # with a generous rescore pool the exact-rescored top-k must equal
    # brute force exactly (rescore scores are float cosine, same ties)
    out = similarity.quantized_topk(corpus, queries, k=K, rescore_factor=8).collect()
    by_query = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        by_query.setdefault(r["query_id"], []).append(r["vec_id"])
    for qi in range(3):
        assert by_query[qi] == _ground_truth_topk(corpus_np, qi, K)


def test_quantized_topk_no_corpus_shuffle(spark, corpus, queries):
    plan = (
        similarity.quantized_topk(corpus, queries, k=K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # candidate set and queries broadcast; the only exchanges are the
    # two top-k reductions keyed by query id
    assert "SortMergeJoin" not in plan


def test_mips_topk_matches_numpy(spark, corpus, queries, corpus_np):
    import numpy as np

    out = similarity.mips_topk(corpus, queries, k=K).collect()
    by_query = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        by_query.setdefault(r["query_id"], []).append(r["vec_id"])
    for qi in range(3):
        dots = corpus_np @ corpus_np[qi]
        # ties broken by id DESC, matching topk_reduce's struct sort
        want = [int(i) for i in sorted(range(len(dots)), key=lambda i: (-dots[i], -i))[:K]]
        assert by_query[qi] == want


def test_lloyd_assign_unique_id_contract(spark):
    # _lloyd_assign is scan-local: unlike the former groupBy(id) shape it
    # preserves row multiplicity, so its documented PRECONDITION is that
    # ids are unique.  Pin both halves of the contract: (a) unique-id
    # input yields exactly one assignment row per id; (b) a duplicated id
    # is NOT silently collapsed — the duplicate surfaces as a duplicate
    # output row (callers feeding non-primary-key ids must dedup first,
    # or the re-estimation means double-weight the vector).
    from pyspark.sql import functions as F

    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        _lloyd_assign,
    )

    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])], "cluster int, __c array<double>"
    )
    unique = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [9.9, 9.8]), (3, [0.3, 0.1])],
        "vec_id long, __v array<double>",
    )
    got = _lloyd_assign(unique, cents, "vec_id").collect()
    assert sorted(r["vec_id"] for r in got) == [1, 2, 3]
    assert {r["vec_id"]: r["cluster"] for r in got} == {1: 0, 2: 1, 3: 0}

    dup = spark.createDataFrame(
        [(7, [0.1, 0.2]), (7, [0.1, 0.2]), (2, [9.9, 9.8])],
        "vec_id long, __v array<double>",
    )
    got_dup = _lloyd_assign(dup, cents, "vec_id").collect()
    assert sorted(r["vec_id"] for r in got_dup) == [2, 7, 7]

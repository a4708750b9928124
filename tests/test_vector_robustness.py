"""Pathological-embedding robustness sweep over the similarity surface.

The driver's embeddings table carries only well-formed dense vectors —
this suite feeds zero vectors, near-zero vectors, negative vectors and
duplicated rows through the ANN operators and pins the contract: no
crash, no NULL/NaN scores, zero-norm rows score 0 cosine instead of
dividing by zero.
"""

import math

import pytest

from realtimechurnpredictiondataengineering_spark.operators import dedup, similarity

ROWS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.0, 0.0, 0.0, 0.0]),      # zero vector
    (2, [1e-12, 0.0, 0.0, 0.0]),    # near-zero
    (3, [-1.0, -1.0, -1.0, -1.0]),
    (4, [1.0, 0.0, 0.0, 0.0]),      # exact duplicate of 0
    (5, [0.5, 0.5, 0.5, 0.5]),
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(ROWS, "vec_id long, embedding array<double>")


def _queries(df):
    return df.selectExpr("vec_id as query_id", "embedding as query_vec")


def test_brute_force_zero_vectors_score_zero(vecs):
    out = similarity.brute_force_topk(vecs, _queries(vecs), k=6).collect()
    assert len(out) == 36
    for r in out:
        assert r["cos_sim"] is not None and not math.isnan(r["cos_sim"])
        if r["query_id"] == 1 or r["vec_id"] == 1:
            assert r["cos_sim"] == 0.0


def test_mips_and_quantized_handle_zero_vectors(vecs):
    qs = _queries(vecs)
    for r in similarity.mips_topk(vecs, qs, k=3).collect():
        assert r["dot"] is not None and not math.isnan(r["dot"])
    for r in similarity.quantized_topk(vecs, qs, k=2, rescore_factor=2).collect():
        assert r["cos_sim"] is not None and not math.isnan(r["cos_sim"])


def test_pq_handles_zero_vectors(vecs):
    books = similarity.train_pq_codebooks([v for _, v in ROWS], m=2, ksub=3)
    out = similarity.pq_topk(vecs, _queries(vecs), books, k=3).collect()
    assert len(out) == 18
    for r in out:
        assert r["adc_dot"] is not None and not math.isnan(r["adc_dot"])


def test_embedding_near_dup_zero_vectors(vecs):
    planes = [[1.0, 0.5, -0.5, 0.25], [0.3, -1.0, 0.7, 0.1]]
    out = dedup.embedding_near_duplicates(vecs, planes, threshold=0.99).collect()
    # the exact duplicates must pair up; zero-vector never reaches 0.99
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (0, 4) in pairs
    assert not any(1 in p for p in pairs)


def test_knn_label_accuracy_with_zero_vector(spark):
    rows = [(i, [10.0 + i * 0.01, 0.0], 0) for i in range(4)]
    rows += [(10 + i, [0.0, 10.0 + i * 0.01], 1) for i in range(4)]
    rows.append((99, [0.0, 0.0], 2))  # zero vector, lone label
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r["label"]: r for r in similarity.knn_label_accuracy(df, k=3).collect()}
    assert out[0]["accuracy"] == 1.0 and out[1]["accuracy"] == 1.0
    # the zero vector scores 0 against everyone; it still gets a
    # prediction (tie-broken deterministically) and an accuracy row
    assert out[2]["n"] == 1 and out[2]["accuracy"] == 0.0

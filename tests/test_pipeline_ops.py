"""Unit tests for the corpus-pipeline operators added after the dedup
family: sliding-window chunking, weighted source mixing, fuzzy
(edit-distance) pair candidates, and column profiling."""

import pytest
from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.operators import (
    corpus,
    dedup,
    profiling,
    sampling,
)


def _rows(df):
    return [tuple(r) for r in df.collect()]


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunking_windows_and_overlap(spark):
    # 10 words, window 4, overlap 1 -> stride 3: starts 1,4,7 and a
    # final short chunk is NOT emitted past n-overlap (start<=9).
    text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = corpus.chunk_documents(df, chunk_tokens=4, overlap=1).orderBy("chunk_id")
    got = [(r.chunk_id, r.n_chunk_tokens, r.chunk_text) for r in out.collect()]
    assert got == [
        (0, 4, "w1 w2 w3 w4"),
        (1, 4, "w4 w5 w6 w7"),
        (2, 4, "w7 w8 w9 w10"),
    ]
    # consecutive chunks share exactly `overlap` words
    assert got[0][2].split()[-1] == got[1][2].split()[0]


def test_chunking_short_and_messy_documents(spark):
    df = spark.createDataFrame(
        [(1, "only three words"), (2, "  padded   with \t whitespace  ")],
        "doc_id long, text string",
    )
    out = corpus.chunk_documents(df, chunk_tokens=24, overlap=8)
    got = {r.doc_id: (r.chunk_id, r.n_chunk_tokens, r.chunk_text) for r in out.collect()}
    assert got[1] == (0, 3, "only three words")  # one short chunk
    assert got[2] == (0, 3, "padded with whitespace")  # whitespace collapsed


def test_chunking_rejects_nonpositive_stride(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        corpus.chunk_documents(df, chunk_tokens=8, overlap=8)


# ---------------------------------------------------------------------------
# source_mixture
# ---------------------------------------------------------------------------


def test_source_mixture_rates_repeats_and_allowlist(spark):
    df = spark.createDataFrame(
        [(i, ["keep", "thin", "drop"][i % 3]) for i in range(300)],
        "doc_id long, source string",
    )
    out = sampling.source_mixture(df, {"keep": (100, 2), "thin": (50, 1)})
    agg = {
        r.source: (r.n, r.epochs)
        for r in out.groupBy("source")
        .agg(F.count("*").alias("n"), F.countDistinct("epoch").alias("epochs"))
        .collect()
    }
    assert "drop" not in agg  # absent from the mixture -> dropped
    n_keep_src = 100
    assert agg["keep"] == (2 * n_keep_src, 2)  # every row kept, twice
    assert 0 < agg["thin"][0] < n_keep_src  # hash-thinned, single epoch
    assert agg["thin"][1] == 1
    # deterministic: same cut on a rerun
    again = sampling.source_mixture(df, {"keep": (100, 2), "thin": (50, 1)})
    assert sorted(_rows(out)) == sorted(_rows(again))


def test_source_mixture_requires_sources(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        sampling.source_mixture(df, {})


# ---------------------------------------------------------------------------
# fuzzy_pairs
# ---------------------------------------------------------------------------


def test_fuzzy_pairs_finds_near_and_skips_far(spark):
    df = spark.createDataFrame(
        [
            (0, "shared prefix about spark engines running on clusters"),
            (1, "shared prefix about spark engines running on a cluster"),  # few edits
            (2, "shared prefix but then a wildly different continuation entirely"),
            (3, "unrelated text that blocks elsewhere"),
        ],
        "doc_id long, text string",
    )
    out = dedup.fuzzy_pairs(df, max_distance=10, block_chars=8, cmp_chars=100)
    pairs = {(r.id_a, r.id_b): r.distance for r in out.collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] <= 10
    assert (0, 2) not in pairs  # same block, too many edits
    assert all(3 not in p for p in pairs)  # different block never compared
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_pairs_hot_block_cap(spark):
    # 20 rows sharing a block: over a cap of 5 the whole block is dropped
    # instead of producing 190 comparisons.
    df = spark.createDataFrame(
        [(i, f"same starter text variant {i}") for i in range(20)] + [(99, "lone row")],
        "doc_id long, text string",
    )
    assert dedup.fuzzy_pairs(df, max_distance=100, max_block=5).count() == 0
    assert dedup.fuzzy_pairs(df, max_distance=100, max_block=50).count() == 190


# ---------------------------------------------------------------------------
# incremental_dedup
# ---------------------------------------------------------------------------


def test_incremental_dedup_three_stages(spark):
    existing = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog near the river today"),
            (2, "an accepted corpus document about distributed query engines"),
        ],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (10, "THE QUICK  brown fox jumps over the lazy dog near the river today"),  # exact dup of 0 (normalized)
            (11, "a genuinely new document about watermarked streaming state"),
            (12, "a genuinely new document about watermarked streaming state"),  # batch-internal dup of 11
            (13, "an accepted corpus document about distributed query engine internals"),  # near-dup of 2
            (14, "totally unrelated text with no counterpart anywhere at all"),
        ],
        "doc_id long, text string",
    )
    out = dedup.incremental_dedup(incoming, existing, jaccard_threshold=0.5)
    assert sorted(r.doc_id for r in out.collect()) == [11, 14]
    # without the near-dup stage, 13 survives
    exact_only = dedup.incremental_dedup(incoming, existing, jaccard_threshold=None)
    assert sorted(r.doc_id for r in exact_only.collect()) == [11, 13, 14]


# ---------------------------------------------------------------------------
# column_profile
# ---------------------------------------------------------------------------


def test_column_profile_stats_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, None, 30.0), (4, "b", 40.0)],
        "id long, cat string, val double",
    )
    out = profiling.column_profile(df, ["id", "cat", "val"])
    prof = {r.col_name: r for r in out.collect()}
    assert set(prof) == {"id", "cat", "val"}
    assert all(p.n_rows == 4 for p in prof.values())
    assert (prof["cat"].n_nulls, prof["cat"].n_distinct) == (1, 2)
    assert (prof["val"].n_nulls, prof["val"].n_distinct) == (1, 3)
    assert (prof["id"].min_value, prof["id"].max_value) == ("1", "4")


def test_column_profile_plan_shapes(spark):
    df = spark.createDataFrame([(1, "a")], "id long, cat string")
    # exact: two passes (basic + distinct), never a per-column scan loop,
    # and the distinct Expand must dedup in a HashAggregate (the string
    # min/max buffers live in the OTHER pass, so no sorted Expand)
    exact = profiling.column_profile(df, ["id", "cat"])
    plan = exact._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 2
    assert "Expand" in plan and "HashAggregate" in plan
    assert "Sort\n" not in plan  # no sort operator over the Expand
    # approx: HLL collapses the whole profile to ONE pass
    approx = profiling.column_profile(df, ["id", "cat"], approx=True)
    assert approx._jdf.queryExecution().executedPlan().toString().count("Scan ") <= 1
    prof = {r.col_name: r.n_distinct for r in approx.collect()}
    assert prof == {"id": 1, "cat": 1}
    with pytest.raises(ValueError):
        profiling.column_profile(df, [])


def test_group_split_keeps_groups_intact(spark):
    from realtimechurnpredictiondataengineering_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, f"src{i % 7}") for i in range(700)], "doc_id long, source string"
    )
    train, test = sampling.group_split(df, "source", test_percent=30)
    train_src = {r["source"] for r in train.select("source").distinct().collect()}
    test_src = {r["source"] for r in test.select("source").distinct().collect()}
    # no group straddles the split, nothing is lost
    assert train_src.isdisjoint(test_src)
    assert train.count() + test.count() == 700
    # deterministic: same assignment on a rerun with different partitioning
    train2, _ = sampling.group_split(df.repartition(13), "source", test_percent=30)
    assert {r["source"] for r in train2.select("source").distinct().collect()} == train_src

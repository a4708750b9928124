"""Round-8 operator tests: planted sv02 dedup collisions, per-dimension
embedding PSI, Kneser-Ney scoring, the lexical∪semantic dedup
composition, and the streaming scoring fixture."""

import json

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# sv02 fixture collisions: the deterministic-dedup survivor choice must
# be LIVE in the value check, not just the no-collision identity path
# ---------------------------------------------------------------------------


def test_feed_fixture_has_planted_transaction_collisions(spark):
    from realtimechurnpredictiondataengineering_spark.plans.silver import FEED_FIXTURE

    tx = [
        json.loads(r["value"])
        for r in spark.read.parquet(FEED_FIXTURE)
        .filter(F.col("topic") == "churn_transactions")
        .collect()
    ]
    keys = {}
    for d in tx:
        keys.setdefault((d["customer_id"], d["event_time"]), []).append(d)
    groups = {k: v for k, v in keys.items() if len(v) > 1}
    # the fixture must not silently regenerate collision-free
    assert len(groups) >= 150
    # and the collisions must be REAL choices: at least one group whose
    # members differ in the order columns (event_type, value)
    assert any(
        len({(d["event_type"], d["value"]) for d in v}) > 1 for v in groups.values()
    )


# ---------------------------------------------------------------------------
# prof05: per-dimension embedding PSI
# ---------------------------------------------------------------------------


def test_embedding_psi_flags_the_shifted_dimension(spark):
    from realtimechurnpredictiondataengineering_spark.operators import profiling

    # 200 synthetic 4-dim vectors; the "current" snapshot shifts dim 2 by
    # +0.4 and leaves the rest identical — dim 2 must carry the largest
    # PSI by a wide margin, and the untouched dims must sit near zero
    ref_rows = [([((i * 7 + d * 13) % 100) / 100.0 - 0.5 for d in range(4)],) for i in range(200)]
    cur_rows = [
        ([v + (0.4 if d == 2 else 0.0) for d, v in enumerate(vec)],)
        for (vec,) in ref_rows
    ]
    ref = spark.createDataFrame(ref_rows, "embedding array<double>")
    cur = spark.createDataFrame(cur_rows, "embedding array<double>")
    out = {
        r["dim"]: r["psi"]
        for r in profiling.embedding_psi(ref, cur, dims=4, lo=-0.6, hi=0.6).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[2] > 0.25  # "drifted" by the PSI rule of thumb
    for d in (0, 1, 3):
        assert abs(out[d]) < 0.05
        assert out[2] > 10 * abs(out[d])


def test_embedding_psi_identical_snapshots_are_stable(spark):
    from realtimechurnpredictiondataengineering_spark.operators import profiling

    rows = [([(i % 10) / 10.0 - 0.45, ((i * 3) % 10) / 10.0 - 0.45],) for i in range(100)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    out = profiling.embedding_psi(df, df, dims=2, lo=-0.6, hi=0.6).collect()
    assert len(out) == 2 and all(r["psi"] == 0.0 for r in out)


def test_sv02_dedup_survivor_choice_is_live(spark):
    from realtimechurnpredictiondataengineering_spark.plans.silver import (
        FEED_FIXTURE,
        silver_tables_from_feed,
    )
    from realtimechurnpredictiondataengineering_spark.operators.filters import (
        TRANSACTION_SCHEMA,
        parse_topic,
    )

    feed = spark.read.parquet(FEED_FIXTURE)
    parsed = parse_topic(feed, "churn_transactions", TRANSACTION_SCHEMA)
    n_valid = parsed.dropna(subset=["customer_id", "value"]).filter(
        F.col("value") > 0
    ).count()
    out = silver_tables_from_feed(feed, deterministic=True)["transactions"]
    rows = out.collect()
    # collisions collapsed: strictly fewer output rows than valid input
    assert len(rows) < n_valid
    # survivor rule: per key, the kept row is min by (event_type, value)
    kept = {(r["customer_id"], r["event_time"]): (r["event_type"], r["value"]) for r in rows}
    all_rows = parsed.dropna(subset=["customer_id", "value"]).filter(F.col("value") > 0).collect()
    best = {}
    for r in all_rows:
        k = (r["customer_id"], r["event_time"])
        v = (r["event_type"], r["value"])
        if k not in best or v < best[k]:
            best[k] = v
    assert kept == best


# ---------------------------------------------------------------------------
# ml02: the real-time scoring leg (file-stream -> compiled logit ->
# AvailableNow checkpointed sink), value-pinned to batch scoring
# ---------------------------------------------------------------------------


def test_gold_features_fixture_exercises_the_null_path(spark):
    # the coalesce defaults are part of the scoring contract — the
    # committed snapshot must carry NULL activity rows so they are LIVE
    # in ml02's value check (and must never silently regenerate without)
    from realtimechurnpredictiondataengineering_spark import ml

    feats = spark.read.parquet(ml.GOLD_FEATURES_FIXTURE)
    assert feats.columns == ["customer_id", *ml.FEATURES]
    n = feats.count()
    n_null = feats.filter(F.col("days_since_last_login").isNull()).count()
    assert n > 0 and 0 < n_null < n


def test_streaming_churn_scores_equal_batch_on_the_fixture(spark, tmp_path):
    from realtimechurnpredictiondataengineering_spark import ml

    streamed = ml.streaming_churn_scores(
        spark,
        ml.GOLD_FEATURES_FIXTURE,
        ml.MODEL_V1["coefficients"],
        ml.MODEL_V1["intercept"],
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    batch = ml.churn_scores(
        spark.read.parquet(ml.GOLD_FEATURES_FIXTURE),
        ml.MODEL_V1["coefficients"],
        ml.MODEL_V1["intercept"],
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) == batch.count()


# ---------------------------------------------------------------------------
# t26: interpolated Kneser-Ney bigram scoring
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_kneser_ney_all_paths_hand_checked(spark):
    import math

    from realtimechurnpredictiondataengineering_spark.operators import corpus

    # train "a b c a b": bigrams (a,b):2, (b,c):1, (c,a):1 -> tt=3 types;
    # vocab V=3; ctx a:(nc 2,n1f 1), b:(1,1), c:(1,1);
    # bwd N1+(.b)=1, N1+(.c)=1, N1+(.a)=1; Pcont(w) = (n1b+1)/(3+3+1)
    train = _docs(spark, [(1, "a b c a b")])
    # target "a b q a" positions:
    #   (a,b) seen pair:   max(2-.75,0)/2 + (.75*1/2)*(2/7)
    #   (b,q) seen ctx, unseen pair+continuation: 0 + (.75*1/1)*(1/7)
    #   (q,a) unseen ctx: Pcont(a) = 2/7
    target = _docs(spark, [(10, "a b q a"), (11, "a")])
    out = {
        r["doc_id"]: r.asDict()
        for r in corpus.kneser_ney_logprob(train, target).collect()
    }
    p1 = (2 - 0.75) / 2 + (0.75 * 1 / 2) * (2 / 7)
    p2 = (0.75 * 1 / 1) * (1 / 7)
    p3 = 2 / 7
    want = -(math.log2(p1) + math.log2(p2) + math.log2(p3)) / 3
    assert out[10]["mean_neg_log2p"] == round(want, 4)
    assert out[10]["n_tokens"] == 4
    # fewer than 2 tokens -> no bigrams -> sentinel 0.0
    assert out[11] == {"doc_id": 11, "n_tokens": 1, "mean_neg_log2p": 0.0}


def test_kneser_ney_cap_matches_exact_when_vocab_fits(spark):
    from realtimechurnpredictiondataengineering_spark.operators import corpus

    train = _docs(spark, [(1, "a b c a b c"), (2, "c a b a a b")])
    target = _docs(spark, [(10, "a b c b c q"), (11, "b a c a")])
    exact = {
        r["doc_id"]: r.asDict()
        for r in corpus.kneser_ney_logprob(train, target).collect()
    }
    capped = {
        r["doc_id"]: r.asDict()
        for r in corpus.kneser_ney_logprob(train, target, top_v=50).collect()
    }
    assert exact == capped


def test_kneser_ney_cap_is_live_at_small_v(spark):
    from realtimechurnpredictiondataengineering_spark.operators import corpus

    train = _docs(spark, [(1, "a b c a b c a b")])
    target = _docs(spark, [(10, "a b c a b c")])
    exact = corpus.kneser_ney_logprob(train, target).collect()[0]["mean_neg_log2p"]
    capped = corpus.kneser_ney_logprob(train, target, top_v=1).collect()[0][
        "mean_neg_log2p"
    ]
    assert capped != exact


# ---------------------------------------------------------------------------
# ll08: lexical ∪ semantic dedup composition
# ---------------------------------------------------------------------------


def test_hybrid_dedup_merges_lexical_and_semantic_chains(spark):
    # doc 1-2 are lexical near-dups (identical text), doc 2-3 semantic
    # dups (identical embeddings, different text): ONE CC over the union
    # must fuse {1,2,3} into a single cluster with a single survivor —
    # two independent dedup passes would keep two of them
    from realtimechurnpredictiondataengineering_spark.plans.corpus_prep import (
        hybrid_dedup_pipeline,
    )

    same = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, same),
            (2, same),
            (3, "completely different words describing the same meaning here today"),
            (4, "an unrelated document about churn pipelines and spark engines"),
        ],
        "doc_id long, text string",
    )
    vecs = spark.createDataFrame(
        [
            (1, [0.7, 0.7141428]),
            (2, [1.0, 0.0]),
            (3, [1.0, 0.0]),
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_dedup_pipeline(
        docs, vecs, [[1.0, 0.0]], budget=10**9, cos_threshold=0.95
    )
    ids = {r["doc_id"] for r in out.collect()}
    assert 4 in ids
    assert len(ids & {1, 2, 3}) == 1, f"cluster {{1,2,3}} must keep ONE member, got {ids}"


# ---------------------------------------------------------------------------
# d15/ll09: n-gram benchmark decontamination
# ---------------------------------------------------------------------------


def _decon_frames(spark):
    # benchmark doc 100 shares its 5-gram span with corpus doc 1 only;
    # doc 2 paraphrases (no shared 5-gram); doc 3 is unrelated; doc 4 is
    # too short to produce a 5-gram at all
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "intro words alpha beta gamma delta epsilon zeta eta closing words"),
            (2, "alpha beta gamma are followed by delta then epsilon"),
            (3, "totally unrelated content about churn pipelines in spark"),
            (4, "alpha beta gamma"),
        ],
        "doc_id long, text string",
    )
    return corpus, bench


def test_contamination_report_flags_ngram_overlap_only(spark):
    from realtimechurnpredictiondataengineering_spark.operators import dedup

    corpus, bench = _decon_frames(spark)
    got = {
        r["doc_id"]: r["hits"]
        for r in dedup.contamination_report(corpus, bench, gram_tokens=5).collect()
    }
    # doc 1 embeds a 7-token verbatim span -> 3 distinct shared 5-grams
    assert got == {1: 3}


def test_contamination_min_hits_raises_the_bar(spark):
    from realtimechurnpredictiondataengineering_spark.operators import dedup

    corpus, bench = _decon_frames(spark)
    assert (
        dedup.contamination_report(corpus, bench, gram_tokens=5, min_hits=4).count()
        == 0
    )


def test_benchmark_decontaminate_preserves_columns_and_survivors(spark):
    from realtimechurnpredictiondataengineering_spark.operators import dedup

    corpus, bench = _decon_frames(spark)
    surv = dedup.benchmark_decontaminate(corpus, bench, gram_tokens=5)
    assert surv.columns == corpus.columns
    assert {r["doc_id"] for r in surv.collect()} == {2, 3, 4}


def test_contamination_within_doc_repeats_count_once(spark):
    from realtimechurnpredictiondataengineering_spark.operators import dedup

    bench = spark.createDataFrame(
        [(100, "one two three four five")], "doc_id long, text string"
    )
    # the shared 5-gram appears TWICE in the corpus doc: hits must be 1
    # (distinct grams per document), not 2
    corpus = spark.createDataFrame(
        [(1, "one two three four five and one two three four five")],
        "doc_id long, text string",
    )
    got = dedup.contamination_report(corpus, bench, gram_tokens=5).collect()
    assert [(r["doc_id"], r["hits"]) for r in got] == [(1, 1)]


# ---------------------------------------------------------------------------
# w10: EWMA by key
# ---------------------------------------------------------------------------


def test_ewma_matches_hand_fold_and_breaks_ties(spark):
    from realtimechurnpredictiondataengineering_spark.operators.rollup import ewma_by_key

    rows = [
        # user 1: ordered values 10, 20, 30 -> y = 10, 13, 18.1
        (1, "2024-01-01 00:00:00", 1, 10.0),
        (1, "2024-01-01 00:02:00", 3, 30.0),
        (1, "2024-01-01 00:01:00", 2, 20.0),
        # user 2: timestamp TIE — event_id orders 5.0 before 100.0
        (2, "2024-01-01 00:00:00", 1, 5.0),
        (2, "2024-01-01 00:00:00", 2, 100.0),
        # user 3: NULL value excluded, single survivor -> ewma = x1
        (3, "2024-01-01 00:00:00", 1, None),
        (3, "2024-01-01 00:01:00", 2, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in ewma_by_key(df, "user_id", "ts", "value", 0.3, "event_id").collect()
    }
    assert got[1] == (3, round(0.3 * 30 + 0.7 * (0.3 * 20 + 0.7 * 10), 6))
    assert got[2] == (2, round(0.3 * 100 + 0.7 * 5, 6))
    assert got[3] == (1, 7.0)


# ---------------------------------------------------------------------------
# ml03: calibration report
# ---------------------------------------------------------------------------


def test_calibration_report_bins_and_clamps(spark):
    from realtimechurnpredictiondataengineering_spark.ml import calibration_report

    rows = [
        (0.05, 0), (0.08, 0),          # bin 0: mean 0.065, rate 0.0
        (0.55, 1), (0.55, 0),          # bin 5: mean 0.55, rate 0.5
        (1.0, 1),                      # p = 1.0 clamps into bin 9
        (None, 1),                     # NULL prob excluded
    ]
    df = spark.createDataFrame(rows, "churn_prob double, churn_risk int")
    got = {r["bin"]: (r["n"], r["mean_prob"], r["label_rate"])
           for r in calibration_report(df).collect()}
    assert got == {0: (2, 0.065, 0.0), 5: (2, 0.55, 0.5), 9: (1, 1.0, 1.0)}


# ---------------------------------------------------------------------------
# v18: Matryoshka truncation recall
# ---------------------------------------------------------------------------


def test_truncate_vectors_renormalizes_prefix(spark):
    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        truncate_vectors,
    )

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 100.0, 100.0])], "vec_id long, embedding array<double>"
    )
    got = truncate_vectors(df, 2).collect()[0]["embedding"]
    assert got == [pytest.approx(0.6), pytest.approx(0.8)]


def test_truncation_recall_full_dims_is_perfect_and_prefix_degrades(spark):
    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        truncation_recall,
    )

    # corpus designed so the 2-dim PREFIX misleads: doc 1's prefix is
    # the query's prefix exactly (cos 1.0 truncated) but its tail points
    # the other way; docs 2/3 win on the full vector
    corpus = spark.createDataFrame(
        [
            (1, [0.2, 1.0, -1.0, -1.0]),
            (2, [0.0, 0.9, 1.0, 1.0]),
            (3, [0.0, 0.8, 1.0, 1.0]),
            (4, [-1.0, -1.0, -1.0, -1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    qs = spark.createDataFrame(
        [(0, [0.2, 1.0, 1.0, 1.0])], "query_id long, query_vec array<double>"
    )
    full = truncation_recall(corpus, qs, dims=4, k=2).collect()[0]
    assert (full["n_hit"], full["recall"]) == (2, 1.0)
    cut = truncation_recall(corpus, qs, dims=2, k=2).collect()[0]
    assert cut["recall"] == 0.5


# ---------------------------------------------------------------------------
# v19: distributed Lloyd's k-means
# ---------------------------------------------------------------------------


def test_kmeans_lloyd_separates_planted_blobs(spark):
    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        kmeans_lloyd,
    )

    # two tight blobs far apart; init takes ids 1 and 2 (one from each
    # blob), so 3 rounds must converge to the planted partition
    rows = [(1, [0.0, 0.0]), (2, [10.0, 10.0])]
    rows += [(10 + i, [0.1 * i, 0.05 * i]) for i in range(5)]
    rows += [(20 + i, [10.0 + 0.1 * i, 10.0 - 0.05 * i]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["cluster"] for r in kmeans_lloyd(df, k=2, rounds=3).collect()}
    low = {got[1], *(got[10 + i] for i in range(5))}
    high = {got[2], *(got[20 + i] for i in range(5))}
    assert low == {0} and high == {1}


def test_kmeans_lloyd_empty_cluster_keeps_previous_centroid(spark):
    from realtimechurnpredictiondataengineering_spark.operators.similarity import (
        kmeans_lloyd,
    )

    # init = ids 1,2,3; points 2 and 3 coincide, so one of their two
    # clusters empties after round 1 — the round must not NaN out and
    # every vector must still get a cluster
    rows = [(1, [0.0, 0.0]), (2, [5.0, 5.0]), (3, [5.0, 5.0]), (4, [0.2, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kmeans_lloyd(df, k=3, rounds=3).collect()
    assert len(got) == 4
    assert all(r["cluster"] in (0, 1, 2) for r in got)
    by_id = {r["vec_id"]: r["cluster"] for r in got}
    # ties on identical points break to the lower cluster index, both rounds
    assert by_id[2] == by_id[3] == 1
    assert by_id[1] == by_id[4] == 0


# ---------------------------------------------------------------------------
# c06: frame-level MERGE (upsert/delete apply)
# ---------------------------------------------------------------------------


def test_merge_frames_upserts_deletes_and_keeps(spark):
    from realtimechurnpredictiondataengineering_spark.operators import cdc

    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    # key 2 updated twice (latest wins), key 3 deleted, key 4 inserted,
    # key 5 inserted-then-deleted (must not appear), key 1 untouched
    changes = spark.createDataFrame(
        [
            (2, 21.0, "u", 1),
            (2, 22.0, "u", 2),
            (3, 0.0, "d", 1),
            (4, 40.0, "c", 1),
            (5, 50.0, "c", 1),
            (5, 0.0, "d", 2),
        ],
        "k long, v double, _op string, seq long",
    )
    got = {
        r["k"]: r["v"]
        for r in cdc.merge_frames(target, changes, ["k"], ["seq"]).collect()
    }
    assert got == {1: 10.0, 2: 22.0, 4: 40.0}


# ---------------------------------------------------------------------------
# prof06: completeness matrix
# ---------------------------------------------------------------------------


def test_completeness_matrix_localizes_a_dark_segment(spark):
    from realtimechurnpredictiondataengineering_spark.operators.profiling import (
        completeness_matrix,
    )

    rows = [("a", 1.0, "x"), ("a", 2.0, None), ("b", None, "y"), ("b", None, "z")]
    df = spark.createDataFrame(rows, "seg string, v double, s string")
    got = {
        (r["segment"], r["column"]): (r["n"], r["null_rate"])
        for r in completeness_matrix(df, "seg", ["v", "s"]).collect()
    }
    # column v went dark in segment b only; the grid shows exactly that
    assert got == {
        ("a", "v"): (2, 0.0),
        ("a", "s"): (2, 0.5),
        ("b", "v"): (2, 1.0),
        ("b", "s"): (2, 0.0),
    }


def test_completeness_matrix_rejects_unknown_columns(spark):
    from realtimechurnpredictiondataengineering_spark.operators.profiling import (
        completeness_matrix,
    )

    df = spark.createDataFrame([("a", 1.0)], "seg string, v double")
    with pytest.raises(ValueError, match="phantom"):
        completeness_matrix(df, "seg", ["phantom"])


# ---------------------------------------------------------------------------
# t27: n-gram novelty
# ---------------------------------------------------------------------------


def test_ngram_novelty_scores_every_path(spark):
    from realtimechurnpredictiondataengineering_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(100, "one two three four five six")], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [
            # 2 grams, 1 attested ("one..five"), 1 novel ("two..six2")
            (1, "one two three four five six2"),
            # fully attested single gram
            (2, "two three four five six"),
            # fully novel
            (3, "alpha beta gamma delta epsilon"),
            # shorter than the gram -> 0 grams, novelty sentinel 1.0
            (4, "one two"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in dedup.ngram_novelty(target, corpus, gram_tokens=5).collect()
    }
    assert got == {
        1: (2, 1, 0.5),
        2: (1, 0, 0.0),
        3: (1, 1, 1.0),
        4: (0, 0, 1.0),
    }


# ---------------------------------------------------------------------------
# ml04: feature importance
# ---------------------------------------------------------------------------


def test_feature_importance_is_abs_coef_times_std(spark):
    import statistics

    from realtimechurnpredictiondataengineering_spark import ml

    # two customers; days_since_last_login NULL coalesces to 999 BEFORE
    # the stddev, which is the population the model actually sees
    rows = [(1, 100.0, 10.0, 2, 5, 3, 20.0), (2, 300.0, 30.0, 6, None, 9, 40.0)]
    df = spark.createDataFrame(
        rows,
        "customer_id long, acctbal double, total_revenue double, n_orders long, "
        "days_since_last_login int, sessions long, arpu double",
    )
    got = {
        r["feature"]: r
        for r in ml.feature_importance(df, ml.MODEL_V1["coefficients"]).collect()
    }
    assert set(got) == set(ml.FEATURES)
    std_days = statistics.stdev([5, 999])
    want = round(abs(ml.MODEL_V1["coefficients"]["days_since_last_login"]) * std_days, 6)
    assert got["days_since_last_login"]["importance"] == want
    for f in ml.FEATURES:
        r = got[f]
        assert r["importance"] >= 0 and r["std"] >= 0

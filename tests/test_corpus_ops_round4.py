"""Unit tests for the round-4 corpus-pipeline operators: Gopher rules,
segment-level dup stats, temperature mixture weights, token histogram,
and ANN recall."""

import math

from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.functions import text as tx
from realtimechurnpredictiondataengineering_spark.operators import corpus, profiling, sampling, similarity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rules_flags_and_keep(spark):
    # 62 distinct tokens (no repetition), stopword hits, all-alpha,
    # mean word length in range, no symbols -> passes every gate
    good = "the quick brown fox jumps over and beside certain lazy dogs " + " ".join(
        f"word{i:02d}x" for i in range(53)
    )
    bad_short = "tiny doc"
    bad_repeat = " ".join(["spam"] * 80)
    df = _docs(spark, [(1, good), (2, bad_short), (3, bad_repeat), (4, "")])
    rules = tx.gopher_rules("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[c.alias(n) for n, c in rules.items()]
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["tokens_ok"] is False and out[2]["keep"] is False
    # 80x the same token: repetition ratio 1 - 1/80 >> 0.3
    assert out[3]["repetition_ok"] is False and out[3]["keep"] is False
    assert out[4]["keep"] is False


def test_segment_dup_stats_flags_shared_segments(spark):
    shared = " ".join(f"w{i}" for i in range(20))
    unique_a = " ".join(f"a{i}" for i in range(20))
    unique_b = " ".join(f"b{i}" for i in range(20))
    df = _docs(
        spark,
        [
            (1, shared + " " + unique_a),  # 2 segments, 1 shared
            (2, shared + " " + unique_b),  # 2 segments, 1 shared
            (3, " ".join(f"c{i}" for i in range(40))),  # 2 unique segments
        ],
    )
    out = {r["doc_id"]: r for r in corpus.segment_dup_stats(df).collect()}
    assert out[1]["n_segments"] == 2 and out[1]["n_dup_segments"] == 1
    assert out[1]["dup_segment_frac"] == 0.5
    assert out[2]["n_dup_segments"] == 1
    assert out[3]["n_dup_segments"] == 0 and out[3]["dup_segment_frac"] == 0.0


def test_segment_dup_stats_portable_matches_default(spark):
    # hash family must not change the statistics, only the key encoding
    df = _docs(spark, [(i, " ".join(f"t{i % 3}_{j}" for j in range(30))) for i in range(9)])
    a = sorted(map(tuple, corpus.segment_dup_stats(df).collect()))
    b = sorted(map(tuple, corpus.segment_dup_stats(df, portable_hash=True).collect()))
    assert a == b


def test_temperature_mixture_weights(spark):
    df = spark.createDataFrame(
        [(i, "big") for i in range(90)] + [(i, "small") for i in range(10)],
        "doc_id long, source string",
    )
    out = {r["source"]: r for r in sampling.temperature_mixture_weights(df, alpha=0.5).collect()}
    z = math.sqrt(90) + math.sqrt(10)
    assert abs(out["big"]["weight"] - math.sqrt(90) / z) < 1e-6
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-5
    # alpha<1 upsamples the small source relative to its share
    assert out["small"]["rate"] > 1.0 > out["big"]["rate"]
    # alpha=1 is proportional: every rate 1
    prop = sampling.temperature_mixture_weights(df, alpha=1.0).collect()
    assert all(abs(r["rate"] - 1.0) < 1e-6 for r in prop)


def test_token_length_histogram_buckets(spark):
    df = _docs(
        spark,
        [
            (1, ""),                     # bucket -1
            (2, "one"),                  # 1 token  -> bucket 0
            (3, "a b c"),                # 3 tokens -> bucket 1
            (4, " ".join(["x"] * 8)),    # 8 tokens -> bucket 3 (exact power)
        ],
    )
    out = {r["bucket"]: r for r in profiling.token_length_histogram(df).collect()}
    assert set(out) == {-1, 0, 1, 3}
    assert out[3]["lo_tokens"] == 8 and out[-1]["lo_tokens"] == 0
    assert abs(sum(r["frac"] for r in out.values()) - 1.0) < 1e-5


def test_ann_recall_exact_and_partial(spark):
    exact = spark.createDataFrame(
        [(1, r, 100 + r) for r in range(1, 6)] + [(2, r, 200 + r) for r in range(1, 6)],
        "query_id long, rank int, vec_id long",
    )
    # query 1: approx returns the exact set; query 2: 3 of 5 overlap
    approx = spark.createDataFrame(
        [(1, r, 100 + r) for r in range(1, 6)]
        + [(2, 1, 201), (2, 2, 202), (2, 3, 203), (2, 4, 999), (2, 5, 998)],
        "query_id long, rank int, vec_id long",
    )
    out = {r["query_id"]: r for r in similarity.ann_recall(approx, exact).collect()}
    assert out[1]["recall"] == 1.0 and out[1]["k"] == 5
    assert out[2]["n_hit"] == 3 and out[2]["recall"] == 0.6


def test_remove_common_segments_rebuilds_unique_text(spark):
    shared = " ".join(f"w{i}" for i in range(20))
    unique_a = " ".join(f"a{i}" for i in range(20))
    df = _docs(
        spark,
        [
            (1, shared + " " + unique_a),   # shared segment removed, unique kept
            (2, shared),                    # fully boilerplate -> empty row survives
            (3, " ".join(f"c{i}" for i in range(25))),  # untouched (2 segments)
        ],
    )
    out = {r["doc_id"]: r for r in corpus.remove_common_segments(df).collect()}
    assert out[1]["n_kept_segments"] == 1 and out[1]["clean_text"] == unique_a
    assert out[2]["n_kept_segments"] == 0 and out[2]["clean_text"] == ""
    # reassembly preserves original segment order
    assert out[3]["clean_text"] == " ".join(f"c{i}" for i in range(25))


def test_remove_common_segments_portable_matches_default(spark):
    df = _docs(
        spark,
        [(i, " ".join(f"s{i % 2}_{j}" for j in range(30))) for i in range(6)],
    )
    a = sorted(map(tuple, corpus.remove_common_segments(df).collect()))
    b = sorted(map(tuple, corpus.remove_common_segments(df, portable_hash=True).collect()))
    assert a == b


def test_exact_contamination_finds_probe_substring(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    corp = _docs(
        spark,
        [
            (1, "prefix words alpha beta gamma delta epsilon suffix words"),
            (2, "no overlap here at all"),
            (3, "ALPHA  BETA gamma DELTA epsilon"),  # normalization catches case/space
            (4, "xalpha beta gamma delta epsilon"),  # word boundary: must NOT match
            (5, "alpha beta gamma delta epsilonx"),  # trailing boundary: must NOT match
        ],
    )
    out = sorted(
        (r["doc_id"], r["bench_id"])
        for r in corpus.exact_contamination(corp, bench, probe_tokens=5).collect()
    )
    assert out == [(1, 100), (3, 100)]


def test_exact_contamination_drops_empty_probes(spark):
    bench = _docs(spark, [(100, "   ")])
    corp = _docs(spark, [(1, "anything")])
    assert corpus.exact_contamination(corp, bench).count() == 0


def test_quality_percentile_gate_keeps_upper_half(spark):
    rows = [(i, "word " * 10) for i in range(4)]  # low quality: short, no stopwords
    rows += [
        (10 + i, "the quick brown fox jumps over the lazy dog and then " * 8)
        for i in range(4)
    ]  # higher quality
    df = _docs(spark, rows)
    out = corpus.quality_percentile_gate(df, percentile=0.5)
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {10, 11, 12, 13}


def test_duplicate_spans_merges_overlapping_grams(spark):
    from realtimechurnpredictiondataengineering_spark.operators import dedup

    shared = " ".join(f"s{i}" for i in range(12))  # 12 shared tokens -> 3 dup grams
    df = _docs(
        spark,
        [
            (1, shared + " " + " ".join(f"a{i}" for i in range(10))),
            (2, shared + " " + " ".join(f"b{i}" for i in range(10))),
            (3, " ".join(f"c{i}" for i in range(22))),  # no duplication
        ],
    )
    out = {
        (r["doc_id"],): (r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(df, gram_tokens=10).collect()
    }
    # the 3 overlapping dup grams (starts 1,2,3, each covering 10 tokens)
    # merge into one maximal span [1, 12] in both docs; doc 3 has none
    assert out == {(1,): (1, 12), (2,): (1, 12)}


def test_duplicate_spans_separates_distant_spans(spark):
    from realtimechurnpredictiondataengineering_spark.operators import dedup

    blockx = " ".join(f"x{i}" for i in range(10))
    blocky = " ".join(f"y{i}" for i in range(10))
    mid_a = " ".join(f"m{i}" for i in range(15))
    mid_b = " ".join(f"n{i}" for i in range(15))
    df = _docs(spark, [(1, f"{blockx} {mid_a} {blocky}"), (2, f"{blockx} {mid_b} {blocky}")])
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(df, gram_tokens=10).collect()
    )
    # two separate duplicated spans per doc: tokens 1-10 and 26-35
    assert spans == [(1, 1, 10), (1, 26, 35), (2, 1, 10), (2, 26, 35)]


def test_unigram_logprob_orders_common_below_rare(spark):
    import math

    df = _docs(
        spark,
        [
            (1, "common common common common"),  # all high-probability tokens
            (2, "common rare1 rare2 rare3"),     # mostly singletons
            (3, ""),                              # empty -> 0.0
        ],
    )
    out = {r["doc_id"]: r for r in corpus.unigram_logprob(df).collect()}
    assert out[1]["mean_neg_log2p"] < out[2]["mean_neg_log2p"]
    assert out[3]["n_tokens"] == 0 and out[3]["mean_neg_log2p"] == 0.0
    # exact value: doc 1 tokens all have p = 5/8
    assert abs(out[1]["mean_neg_log2p"] - round(-math.log2(5 / 8), 4)) < 1e-9


def test_knn_label_accuracy_separable_clusters(spark):
    # two tight clusters with distinct labels -> leave-one-out 3-NN is
    # perfect; one planted mislabeled point in cluster 0 is predicted as
    # its neighbors' label and drags label 9's accuracy to 0
    rows = []
    for i in range(6):
        rows.append((i, [10.0 + 0.01 * i, 0.0], 0))
    for i in range(6, 12):
        rows.append((i, [0.0, 10.0 + 0.01 * i], 1))
    rows.append((99, [10.0, 0.05], 9))  # sits inside cluster 0, label 9
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r["label"]: r for r in similarity.knn_label_accuracy(df, k=3).collect()}
    assert out[0]["accuracy"] == 1.0 and out[0]["n"] == 6
    assert out[1]["accuracy"] == 1.0 and out[1]["n"] == 6
    assert out[9]["n"] == 1 and out[9]["n_correct"] == 0 and out[9]["accuracy"] == 0.0


def test_sessionize_splits_on_gap(spark):
    from realtimechurnpredictiondataengineering_spark.operators import rollup

    rows = [
        (1, 10, "2024-01-01 10:00:00"),
        (2, 10, "2024-01-01 10:10:00"),   # same session (10 min gap)
        (3, 10, "2024-01-01 11:30:00"),   # > 30 min -> new session
        (4, 20, "2024-01-01 10:00:00"),   # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string").selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts"
    )
    out = {(r["user_id"], r["session_id"]): r for r in rollup.sessionize(df).collect()}
    assert out[(10, 1)]["n_events"] == 2
    assert out[(10, 2)]["n_events"] == 1
    assert out[(20, 1)]["n_events"] == 1
    assert str(out[(10, 1)]["session_end"]).startswith("2024-01-01 10:10")


def test_profile_drift_detects_mean_shift(spark):
    from realtimechurnpredictiondataengineering_spark.operators import profiling

    old = spark.createDataFrame([("a", 1.0), ("a", 3.0), ("b", 5.0)], "g string, v double")
    new = spark.createDataFrame(
        [("a", 11.0), ("a", 13.0), ("c", None)], "g string, v double"
    )
    out = {r["g"]: r for r in profiling.profile_drift(old, new, "g", "v").collect()}
    assert out["a"]["mean_delta"] == 10.0
    assert out["b"]["n_new"] is None          # group vanished
    assert out["c"]["null_rate_new"] == 1.0   # new group, all null


def test_sessionize_boundary_and_subsecond_precision(spark):
    from realtimechurnpredictiondataengineering_spark.operators import rollup

    rows = [
        (1, 1, "2024-01-01 10:00:00.500"),
        (2, 1, "2024-01-01 10:30:00.500"),  # gap exactly 1800.0 -> NEW session (>= rule)
        (3, 2, "2024-01-01 10:00:00.600"),
        (4, 2, "2024-01-01 10:30:00.100"),  # gap 1799.5 -> same session
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string").selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts"
    )
    out = {(r["user_id"], r["session_id"]): r["n_events"] for r in rollup.sessionize(df).collect()}
    assert out == {(1, 1): 1, (1, 2): 1, (2, 1): 2}

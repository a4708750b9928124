"""Round-7 unit tests: the per-order top-V valves on bigram/trigram
scoring (capped == exact when V covers the vocabularies; capped !=
exact when it doesn't, so the valve is provably live), and
stupid-backoff scoring with every rung hand-checked.
"""

import math

from realtimechurnpredictiondataengineering_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# bigram/trigram top_v valve
# ---------------------------------------------------------------------------

_LADDER_ROWS = [
    (1, "alpha beta gamma alpha beta"),
    (2, "beta gamma delta alpha gamma beta"),
    (3, "gamma gamma alpha beta delta"),
    (4, ""),
]


def test_bigram_cap_matches_exact_when_vocab_fits(spark):
    # every pair/token vocabulary is far below V=50 -> both tails are
    # empty and the capped model must be IDENTICAL to the exact join
    df = _docs(spark, _LADDER_ROWS)
    exact = {r["doc_id"]: r.asDict() for r in corpus.bigram_logprob(df).collect()}
    capped = {
        r["doc_id"]: r.asDict() for r in corpus.bigram_logprob(df, top_v=50).collect()
    }
    assert exact == capped


def test_trigram_cap_matches_exact_when_vocab_fits(spark):
    df = _docs(spark, _LADDER_ROWS)
    exact = {r["doc_id"]: r.asDict() for r in corpus.trigram_logprob(df).collect()}
    capped = {
        r["doc_id"]: r.asDict() for r in corpus.trigram_logprob(df, top_v=50).collect()
    }
    assert exact == capped


def test_bigram_cap_is_live_at_small_v(spark):
    # V=1 forces the pair tail branch -> scores must CHANGE for at
    # least one document, proving the valve is not vacuously equal
    df = _docs(spark, _LADDER_ROWS)
    exact = {r["doc_id"]: r["mean_neg_log2p"] for r in corpus.bigram_logprob(df).collect()}
    capped = {
        r["doc_id"]: r["mean_neg_log2p"]
        for r in corpus.bigram_logprob(df, top_v=1).collect()
    }
    assert exact != capped


def test_trigram_cap_is_live_at_small_v(spark):
    df = _docs(spark, _LADDER_ROWS)
    exact = {r["doc_id"]: r["mean_neg_log2p"] for r in corpus.trigram_logprob(df).collect()}
    capped = {
        r["doc_id"]: r["mean_neg_log2p"]
        for r in corpus.trigram_logprob(df, top_v=1).collect()
    }
    assert exact != capped


def test_bigram_cap_tail_mass_hand_checked(spark):
    # one doc "a a a b": pairs (a,a):2, (a,b):1; tokens a:3, b:1.
    # V=1 keeps pair (a,a) and token a.
    #   total_pairs=3, top_pair_mass=2 -> pair tail p = 1/3
    #   total=4, top_token_mass=3    -> token tail p = 1/4
    # positions: (a,a) kept: p=.8*(2/3)+.2*(3/4); (a,a) again same;
    # (a,b) tail pair + tail token: p=.8*(1/3)+.2*(1/4)
    df = _docs(spark, [(1, "a a a b")])
    out = corpus.bigram_logprob(df, top_v=1).collect()[0]
    p_aa = 0.8 * (2 / 3) + (1.0 - 0.8) * (3 / 4)
    p_ab = 0.8 * (1 / 3) + (1.0 - 0.8) * (1 / 4)
    want = -(2 * math.log2(p_aa) + math.log2(p_ab)) / 3
    assert out["mean_neg_log2p"] == round(want, 4)


# ---------------------------------------------------------------------------
# stupid-backoff scoring
# ---------------------------------------------------------------------------


def test_stupid_backoff_all_rungs_hand_checked(spark):
    # train "a b c a b c": tri (a,b,c):2,(b,c,a):1,(c,a,b):1;
    # ctx3 (a,b):2,(b,c):1,(c,a):1; big (a,b):2,(b,c):2,(c,a):1;
    # ctx2 a:2,b:2,c:1; uni a:2,b:2,c:2 -> N=6, V=3.
    # target "a b c b c q" positions:
    #   (a,b,c) trigram rung: 2/2 = 1.0
    #   (b,c,b) unigram rung (bigram c,b unseen): .4*((.4*(2+1))/9)
    #   (c,b,c) bigram rung: .4*(2/2)
    #   (b,c,q) unseen-token rung: .4*((.4*(0+1))/9)
    train = _docs(spark, [(1, "a b c a b c")])
    target = _docs(spark, [(10, "a b c b c q"), (11, "a b")])
    out = {
        r["doc_id"]: r.asDict()
        for r in corpus.stupid_backoff_logprob(train, target, alpha=0.4).collect()
    }
    s1 = 1.0
    s2 = 0.4 * ((0.4 * (2 + 1.0)) / 9)
    s3 = 0.4 * (2 / 2)
    s4 = 0.4 * ((0.4 * (0 + 1.0)) / 9)
    want = -(math.log2(s1) + math.log2(s2) + math.log2(s3) + math.log2(s4)) / 4
    assert out[10]["mean_neg_log2p"] == round(want, 4)
    assert out[10]["n_tokens"] == 6
    # fewer than 3 tokens -> no trigrams -> sentinel 0.0
    assert out[11] == {"doc_id": 11, "n_tokens": 2, "mean_neg_log2p": 0.0}


# ---------------------------------------------------------------------------
# cluster_representatives: full-membership cluster_size
# ---------------------------------------------------------------------------


def test_cluster_representatives_counts_unscored_members(spark):
    from realtimechurnpredictiondataengineering_spark.operators import dedup

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "id long, component long"
    )
    # member 3 (cluster 1) and member 8 (cluster 7) carry no score row:
    # they must still count toward cluster_size, while the representative
    # pick stays among scored members
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (7, 0.5)], "id long, quality double"
    )
    out = {
        r["component"]: r.asDict()
        for r in dedup.cluster_representatives(comps, scores).collect()
    }
    assert out[1] == {"component": 1, "rep_id": 2, "quality": 0.9, "cluster_size": 3}
    assert out[7] == {"component": 7, "rep_id": 7, "quality": 0.5, "cluster_size": 2}


def test_stupid_backoff_cap_matches_exact_when_vocab_fits(spark):
    train = _docs(spark, [(1, "a b c a b c"), (2, "c a b a a b")])
    target = _docs(spark, [(10, "a b c b c q"), (11, "b a c a")])
    exact = {
        r["doc_id"]: r.asDict()
        for r in corpus.stupid_backoff_logprob(train, target).collect()
    }
    capped = {
        r["doc_id"]: r.asDict()
        for r in corpus.stupid_backoff_logprob(train, target, top_v=50).collect()
    }
    assert exact == capped


def test_stupid_backoff_cap_falls_through_at_small_v(spark):
    # V=1 keeps one n-gram per order -> most positions must fall through
    # to a lower rung, changing the score vs exact
    train = _docs(spark, [(1, "a b c a b c a b")])
    target = _docs(spark, [(10, "a b c a b c")])
    exact = corpus.stupid_backoff_logprob(train, target).collect()[0]["mean_neg_log2p"]
    capped = corpus.stupid_backoff_logprob(train, target, top_v=1).collect()[0][
        "mean_neg_log2p"
    ]
    assert capped != exact


# ---------------------------------------------------------------------------
# weighted reservoir (A-Res) + serpentine packing
# ---------------------------------------------------------------------------


def test_weighted_reservoir_prefers_heavy_weights(spark):
    from realtimechurnpredictiondataengineering_spark.operators import sampling
    from pyspark.sql import functions as F

    # 5 heavy rows (w=100) vs 5 near-zero rows: u^(1/100) ~ 1 while
    # u^(1/0.01) ~ 0, so the k=5 draw must be exactly the heavy rows;
    # a zero-weight row must never appear
    rows = [(i, 100.0) for i in range(5)] + [(i, 0.01) for i in range(5, 10)]
    rows.append((10, 0.0))
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = sampling.weighted_reservoir_sample(df, "doc_id", F.col("w"), k=5)
    picked = {r["doc_id"] for r in out.collect()}
    assert picked == {0, 1, 2, 3, 4}


def test_weighted_reservoir_is_deterministic(spark):
    from realtimechurnpredictiondataengineering_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, 1.0 + (i % 3)) for i in range(40)], "doc_id long, w double"
    )
    a = [tuple(r) for r in sampling.weighted_reservoir_sample(df, "doc_id", "w", k=10).collect()]
    b = [tuple(r) for r in sampling.weighted_reservoir_sample(df, "doc_id", "w", k=10).collect()]
    assert a == b and len(a) == 10


def test_zigzag_pack_balances_loads(spark):
    from realtimechurnpredictiondataengineering_spark.operators import packing

    # 32 docs with strongly skewed lengths; the serpentine deal must use
    # every bin, give each bin the same item count, and keep the load
    # spread below one maximum item (the LPT-style guarantee shape)
    rows = [(i, "w " * (400 - 12 * i)) for i in range(32)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = packing.zigzag_pack(df, n_bins=4).collect()
    loads: dict = {}
    counts: dict = {}
    for r in out:
        loads[r["bin_id"]] = loads.get(r["bin_id"], 0) + r["n_tokens"]
        counts[r["bin_id"]] = counts.get(r["bin_id"], 0) + 1
    assert set(loads) == {0, 1, 2, 3}
    assert len(set(counts.values())) == 1
    max_item = max(r["n_tokens"] for r in out)
    assert max(loads.values()) - min(loads.values()) < max_item


def test_psi_report_hand_checked(spark):
    import math

    from realtimechurnpredictiondataengineering_spark.operators import profiling

    ref = spark.createDataFrame([(0.05,)] * 4, "v double")
    cur = spark.createDataFrame([(0.95,)] * 4, "v double")
    out = {r["bin"]: r.asDict() for r in profiling.psi_report(ref, cur, "v", n_bins=2).collect()}
    # smoothing: p = (c + 0.5) / (4 + 0.5*2): ref = (0.9, 0.1), cur = (0.1, 0.9)
    t0 = (0.1 - 0.9) * math.log(0.1 / 0.9)
    t1 = (0.9 - 0.1) * math.log(0.9 / 0.1)
    assert out[0]["p_ref"] == 0.9 and out[0]["p_cur"] == 0.1
    assert out[0]["psi_term"] == round(t0, 6)
    assert out[1]["psi_term"] == round(t1, 6)
    assert out[0]["lo_edge"] == 0.0 and out[1]["lo_edge"] == 0.5


def test_psi_report_clamps_out_of_range(spark):
    from realtimechurnpredictiondataengineering_spark.operators import profiling

    # a broken producer emitting 7.3 must land visibly in the top bin,
    # and NULLs must not occupy any bin
    ref = spark.createDataFrame([(0.5,), (0.5,)], "v double")
    cur = spark.createDataFrame([(7.3,), (-2.0,), (None,)], "v double")
    out = {r["bin"]: r.asDict() for r in profiling.psi_report(ref, cur, "v", n_bins=4).collect()}
    assert out[3]["p_cur"] > out[1]["p_cur"]  # 7.3 clamped into bin 3
    assert out[0]["p_cur"] > out[1]["p_cur"]  # -2.0 clamped into bin 0
    total_cur = round(sum(r["p_cur"] for r in out.values()), 2)
    assert total_cur == 1.0  # NULL excluded, masses normalize

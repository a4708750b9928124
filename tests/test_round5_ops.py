"""Round-5 unit tests: unigram_logprob's top-V vocabulary cap, the
LSH-backed knn_label_accuracy candidate path, gopher_rules' NULL-text
reject, and the sessionize property test vs a brute-force reference.

One hypothesis example = one Spark job, so example counts stay small
(the JVM round-trip, not the property, is the cost).
"""

import datetime
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtimechurnpredictiondataengineering_spark.functions import text as tx
from realtimechurnpredictiondataengineering_spark.operators import corpus, rollup, similarity

PROP_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# unigram_logprob vocab_top_v
# ---------------------------------------------------------------------------


def test_unigram_logprob_cap_matches_exact_when_vocab_fits(spark):
    # true vocabulary (4 tokens) < V=10 -> the tail is empty and the
    # capped model must be IDENTICAL to the exact join
    df = _docs(
        spark,
        [(1, "alpha alpha beta"), (2, "beta gamma delta alpha"), (3, "")],
    )
    exact = {r["doc_id"]: r.asDict() for r in corpus.unigram_logprob(df).collect()}
    capped = {
        r["doc_id"]: r.asDict()
        for r in corpus.unigram_logprob(df, vocab_top_v=10).collect()
    }
    assert exact == capped


def test_unigram_logprob_cap_smooths_tail_into_oov(spark):
    # counts: a=3, b=2, c=1, total=6.  V=2 keeps {a, b}; the tail (c)
    # smooths to p_oov = 1/6.
    df = _docs(spark, [(1, "a a a"), (2, "b b c")])
    out = {
        r["doc_id"]: r["mean_neg_log2p"]
        for r in corpus.unigram_logprob(df, vocab_top_v=2).collect()
    }
    assert out[1] == round(-math.log2(3 / 6), 4)
    want2 = -(math.log2(2 / 6) + math.log2(2 / 6) + math.log2(1 / 6)) / 3
    assert out[2] == round(want2, 4)


def test_unigram_logprob_cap_tiebreak_is_deterministic(spark):
    # b and c tie at count 2; V=2 must keep {a, b} (count desc, token
    # asc), never {a, c} -> c scores as OOV with tail mass 2/7
    df = _docs(spark, [(1, "a a a b b c c")])
    out = corpus.unigram_logprob(df, vocab_top_v=2).collect()[0]
    want = -(
        3 * math.log2(3 / 7) + 2 * math.log2(2 / 7) + 2 * math.log2(2 / 7)
    ) / 7
    assert out["mean_neg_log2p"] == round(want, 4)


# ---------------------------------------------------------------------------
# knn_label_accuracy with LSH candidates
# ---------------------------------------------------------------------------


def _clustered_vectors(spark):
    # two tight axis-aligned clusters + one planted mislabeled point
    rows = []
    for i in range(6):
        rows.append((i, [10.0 + 0.01 * i, 0.0], 0))
    for i in range(6, 12):
        rows.append((i, [0.0, 10.0 + 0.01 * i], 1))
    rows.append((99, [10.0, 0.05], 9))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_knn_label_accuracy_lsh_matches_exact_on_clusters(spark):
    df = _clustered_vectors(spark)
    # two hash tables whose planes separate the axis clusters cleanly:
    # every same-cluster pair shares a bucket, so LSH recall is 1 here
    # and the LSH path must reproduce the exact path's accuracy table
    plane_sets = [
        [[1.0, -1.0], [1.0, 1.0]],
        [[0.3, -1.0], [1.0, 0.2]],
    ]
    exact = {r["label"]: r.asDict() for r in similarity.knn_label_accuracy(df, k=3).collect()}
    lsh = {
        r["label"]: r.asDict()
        for r in similarity.knn_label_accuracy(
            df, k=3, candidates_fn=similarity.lsh_knn_candidates(plane_sets)
        ).collect()
    }
    assert lsh == exact
    assert lsh[0]["accuracy"] == 1.0 and lsh[1]["accuracy"] == 1.0
    assert lsh[9]["accuracy"] == 0.0


# ---------------------------------------------------------------------------
# gopher_rules NULL text
# ---------------------------------------------------------------------------


def test_gopher_rules_null_text_is_explicit_reject(spark):
    df = _docs(spark, [(1, None), (2, "")])
    rules = tx.gopher_rules("text")
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", *[c.alias(n) for n, c in rules.items()]).collect()
    }
    # NULL text must never produce a NULL flag (three-valued logic would
    # drop the row from BOTH filter(keep) and filter(~keep)): every gate
    # is a real boolean and the conjunction is an explicit reject
    for flag in ("tokens_ok", "word_len_ok", "alpha_ok", "symbol_ok",
                 "stopwords_ok", "repetition_ok", "dup_gram_ok", "keep"):
        assert out[1][flag] is not None, flag
    assert out[1]["keep"] is False and out[2]["keep"] is False


# ---------------------------------------------------------------------------
# sessionize vs brute force (round-4 verdict task 7)
# ---------------------------------------------------------------------------

# (user, offset in half-seconds): offsets cluster around multiples of the
# 30 s gap so boundary-exact and sub-second-near-boundary cases are common
EVENTS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 240)),
    min_size=1,
    max_size=40,
)


def _brute_force_sessions(rows, gap_seconds):
    byuser = {}
    for eid, user, ts in rows:
        byuser.setdefault(user, []).append((ts, eid))
    want = []
    for user, evs in sorted(byuser.items()):
        evs.sort()
        sessions = []  # [start, end, n]
        prev = None
        for ts, _eid in evs:
            if prev is None or (ts - prev).total_seconds() >= gap_seconds:
                sessions.append([ts, ts, 0])
            cur = sessions[-1]
            cur[1] = max(cur[1], ts)
            cur[2] += 1
            prev = ts
        for sid, (start, end, n) in enumerate(sessions, 1):
            want.append((user, sid, start, end, n))
    return sorted(want)


@PROP_SETTINGS
@given(events=EVENTS)
def test_sessionize_matches_brute_force(spark, events):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (eid, user, base + datetime.timedelta(seconds=off * 0.5))
        for eid, (user, off) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = sorted(
        (r["user_id"], r["session_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in rollup.sessionize(df, gap_seconds=30).collect()
    )
    # the reference is the definition itself: a gap of >= gap_seconds
    # (sub-second precise) starts a new session; sessions numbered in
    # time order per user
    assert got == _brute_force_sessions(rows, 30)

"""Property-based tests for the round-9 flagship operators (SURVEY
§5.3 doctrine): each distributed implementation must agree with an
independent sequential model on arbitrary generated inputs.

BPE trainer: the
distributed trainer must agree with an independent sequential textbook
implementation on arbitrary generated corpora — including repeated
characters (overlap greedy-ness), tie-heavy frequency tables
(lexicographic winner determinism), and multi-round merge chaining
where round N's winner contains round N-1's merged symbol.

One hypothesis example = one corpus = one full training run; examples
are kept small (vocab a-c, short words) so the search space is dense in
exactly the adversarial cases: ties, overlaps, and symbols that are
prefixes of each other.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from test_round9_ops import _sequential_bpe

WORDS = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=1,
    max_size=12,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=WORDS)
def test_bpe_train_matches_sequential_on_random_corpora(spark, words):
    from realtimechurnpredictiondataengineering_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    freqs: dict[str, int] = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    expected = _sequential_bpe(freqs, 4)
    got = [
        (r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    # the distributed trainer may learn FEWER merges only when the
    # sequential one also ran dry (no pairs left)
    assert got == expected


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=WORDS)
def test_bpe_train_eow_matches_sequential_on_random_corpora(spark, words):
    # the end-of-word variant under the same adversarial generator: the
    # marker symbol competes in every pair count and word-final merges
    # chain across rounds (alphabet a-c never collides with the marker,
    # so the '<'/'>' drop guard is a no-op here by construction)
    from realtimechurnpredictiondataengineering_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    freqs: dict[str, int] = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    expected = _sequential_bpe(freqs, 4, eow=True)
    got = [
        (r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=4, end_of_word=True)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected


# --- streaming MERGE: sequential per-batch == one-shot -------------------

CHANGES = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),            # key
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        st.sampled_from(["c", "u", "d"]),
    ),
    min_size=1,
    max_size=12,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changes=CHANGES, cuts=st.sets(st.integers(min_value=1, max_value=11), max_size=3))
def test_sequential_merge_equals_one_shot_on_random_logs(spark, changes, cuts):
    # ANY split of a seq-ordered change log into ordered batches must
    # produce the same final state as one one-shot MERGE — the property
    # the streaming foreachBatch loop (c07) rests on
    from realtimechurnpredictiondataengineering_spark.operators import cdc

    target = spark.createDataFrame([(1, 0.0), (3, 0.0)], "id long, val double")
    rows = [(k, v, op, seq) for seq, (k, v, op) in enumerate(changes, start=1)]
    log = spark.createDataFrame(rows, "id long, val double, _op string, seq long")
    one_shot = {
        (r["id"], r["val"])
        for r in cdc.merge_frames(target, log, ["id"], ["seq"]).collect()
    }
    bounds = sorted(c for c in cuts if c < len(rows))
    spans = list(zip([0, *bounds], [*bounds, len(rows)]))
    state = target
    for lo, hi in spans:
        if lo == hi:
            continue
        batch = spark.createDataFrame(
            rows[lo:hi], "id long, val double, _op string, seq long"
        )
        state = cdc.merge_frames(state, batch, ["id"], ["seq"]).localCheckpoint()
    sequential = {(r["id"], r["val"]) for r in state.collect()}
    assert sequential == one_shot

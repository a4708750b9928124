"""Property-based tests for the BPE trainer (SURVEY §5.3 doctrine): the
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

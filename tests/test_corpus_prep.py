"""End-to-end corpus prep: gates, dedup stages, and stats."""

from realtimechurnpredictiondataengineering_spark.plans import corpus_prep

GOOD = (
    "The quick brown fox jumps over the lazy dog while the patient cat "
    "watches from the garden wall and considers whether the effort of the "
    "chase is worth the reward of the catch in the warm afternoon sun. "
) * 3  # comfortably inside the [200, 10k] length band, stopword-rich


def _docs(spark):
    rows = [
        (1, "web", GOOD),                      # survives
        (2, "web", GOOD),                      # exact dup of 1 -> dropped
        (3, "web", GOOD + "Extra tail sentence for the near duplicate copy."),  # near-dup -> dropped
        (4, "books", "short junk!!!"),          # fails quality gate
        (5, "books", GOOD.replace("the", "le dans et pour avec sur une")),  # likely non-en or survives by lang
    ]
    return spark.createDataFrame(rows, "doc_id int, source string, text string")


def test_pipeline_drops_dups_and_junk(spark):
    clean = corpus_prep.prepare_corpus(_docs(spark))
    ids = sorted(r["doc_id"] for r in clean.select("doc_id").collect())
    assert 1 in ids          # canonical survivor kept
    assert 2 not in ids      # exact dup removed
    assert 3 not in ids      # near dup removed
    assert 4 not in ids      # junk removed


def test_stats_shape(spark):
    stats = corpus_prep.corpus_stats(corpus_prep.prepare_corpus(_docs(spark))).collect()
    by = {r["source"]: r for r in stats}
    assert by["web"]["n_docs"] == 1
    assert by["web"]["total_tokens"] > 0
    assert 0.0 <= by["web"]["avg_quality"] <= 1.0

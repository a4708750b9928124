"""End-to-end training-corpus preparation (the north-star use case).

The canonical LLM data pipeline over ``documents``, composed entirely
from this engine's operators:

    quality score -> language filter -> exact dedup -> near-dedup
    -> per-source corpus stats

Stage order is the cost order: cheap per-row scoring prunes first (one
scan, no shuffle), exact dedup is one hash aggregate, and only the
survivors pay for the shingle inverted index.  Every stage is
engine-native (no UDFs) and the whole chain is one Catalyst plan — at
100 TB nothing materializes between stages unless the caller persists
deliberately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.functions import text as tx
from realtimechurnpredictiondataengineering_spark.operators import dedup


def prepare_corpus(
    docs: DataFrame,
    quality_min: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    max_doc_freq: int = 200,
    persist_intermediate: bool = True,
) -> DataFrame:
    """The cleaned corpus: rows of ``docs`` (plus ``quality``/``lang_pred``)
    that pass quality + language gates, exact content dedup (min-id
    survivor), and exact n-gram near-dedup (drop the larger id of every
    near-dup pair — the deterministic single-link rule).

    ``max_doc_freq`` is load-bearing, not cosmetic: a 3-gram present in
    thousands of documents (boilerplate) pairs them all quadratically —
    at sf0.1 an uncapped run is 5x slower for the IDENTICAL pair set.
    ``persist_intermediate`` stages the gated survivors once (a real
    pipeline checkpoints here too) so the regex-heavy scoring pass is not
    recomputed by each downstream branch.  The cache sits at ``kept`` —
    BEFORE the exact-dedup semi-join — because that join reads its input
    twice (build the min-id survivor set, then probe it); caching after
    it, as an earlier revision did, still paid the scoring regexes twice.
    The cache lives until the session drops it (the returned plan still
    references it, so this function cannot unpersist); callers invoking
    this repeatedly in one session should pass ``False`` or write/read a
    staged parquet instead."""
    scored = (
        docs.withColumn("quality", tx.quality_score("text"))
        .withColumn("lang_pred", tx.language_id("text"))
        # token counts ride along from this first (cached-input) scan so
        # the final stats pass sums a column instead of re-running the
        # normalize+split regexes over every surviving document
        .withColumn("n_tokens", tx.token_count("text"))
    )
    kept = scored.filter(
        (F.col("quality") >= quality_min) & F.col("lang_pred").isin(*langs)
    )
    if persist_intermediate:
        kept = kept.persist()
    canon = dedup.content_hash_dedup(kept)
    exact = kept.join(canon.select("doc_id"), "doc_id", "left_semi")
    pairs = dedup.ngram_jaccard_pairs(
        exact, shingle_k=shingle_k, threshold=jaccard_threshold, max_doc_freq=max_doc_freq
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return exact.join(losers, "doc_id", "left_anti")


def corpus_stats(clean: DataFrame) -> DataFrame:
    """Per-source corpus report over the cleaned docs: volume, token
    budget, quality profile — the numbers a pretraining data team tracks
    per snapshot.  Uses the ``n_tokens`` column carried from the scoring
    scan when present; falls back to counting tokens here."""
    n_tok = F.col("n_tokens") if "n_tokens" in clean.columns else tx.token_count("text")
    return clean.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).alias("total_tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )

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

from realtimechurnpredictiondataengineering_spark.cache import persist_tracked as _persist

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
        kept = kept.transform(_persist)
    canon = dedup.content_hash_dedup(kept)
    exact = kept.join(canon.select("doc_id"), "doc_id", "left_semi")
    pairs = dedup.ngram_jaccard_pairs(
        exact, shingle_k=shingle_k, threshold=jaccard_threshold, max_doc_freq=max_doc_freq
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return exact.join(losers, "doc_id", "left_anti")


def _post_cc_budget_select(
    exact: DataFrame, comps: DataFrame, budget: int
) -> DataFrame:
    """The post-connected-components tail of ``refinedweb_pipeline``,
    lazily: quality-best representative per cluster, survivor set
    (unclustered ∪ representatives), token-budget prefix.  Split out so
    the plan gate can audit this composition's shape with a LAZY
    ``comps`` stand-in — the real pipeline feeds it checkpointed labels,
    which the whole-plan gate cannot see past
    (tests/test_plan_invariants.py)."""
    from realtimechurnpredictiondataengineering_spark.operators import packing

    reps = dedup.cluster_representatives(
        comps,
        exact.select(F.col("doc_id").alias("id"), "quality"),
        score_col="quality",
    )
    clustered = comps.select(F.col("id").alias("doc_id"))
    survivors = exact.join(clustered, "doc_id", "left_anti").unionByName(
        exact.join(
            reps.select(F.col("rep_id").alias("doc_id")), "doc_id", "left_semi"
        )
    )
    return packing.token_budget_select(survivors, budget=budget, quality_col="quality")


def refinedweb_pipeline(
    docs: DataFrame,
    budget: int = 20_000,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    repetition_max: float = 0.3,
    portable_hash: bool = False,
    quality_expr: F.Column | None = None,
) -> DataFrame:
    """RefinedWeb-style corpus construction (Penedo et al. 2023), the
    full cost-ordered composition:

        gopher gates -> exact content dedup -> MinHash-LSH near-dup
        -> connected components -> quality-best representative per
        cluster -> token-budget prefix select

    versus ``prepare_corpus``'s min-id survivor rule, duplicate CLUSTERS
    here keep their highest-quality member (``cluster_representatives``)
    — the policy web pipelines actually want — and the final cut is a
    global token budget, not a threshold.

    Cost order is the point: the gopher gates are ONE scan-local
    projection (no shuffle) pruning before anything pays a shuffle;
    exact dedup is one hash aggregate over md5 fingerprints; only the
    survivors build the shingle/signature index.  The gated frame is
    persisted — it feeds the dedup build+probe sides, the pair
    generator, the scores join, and the budget pass (the same
    query-private cache pattern as ``prepare_corpus``, released by
    ``cache.release_caches``).  ``connected_components`` executes jobs
    on construction (iterative label propagation), so this composition
    is a driver, not a single lazy plan.
    Returns (doc_id, quality, n_tokens, cum_tokens) — ``token_budget_select``'s
    contract — ordered-by-construction quality desc.
    """
    rules = tx.gopher_rules("text")
    # the repetition gate is the corpus-sensitive knob (Gopher's 0.3 is
    # tuned for web text; boilerplate-heavy or synthetic corpora need it
    # relaxed or they gate to zero) — every other threshold stays at the
    # paper value via gopher_rules
    keep = (
        rules["tokens_ok"]
        & rules["word_len_ok"]
        & rules["alpha_ok"]
        & rules["symbol_ok"]
        & rules["stopwords_ok"]
        & F.coalesce(tx.repetition_ratio("text") <= repetition_max, F.lit(False))
        & rules["dup_gram_ok"]
    )
    # the ranking signal is pluggable: the default is the heuristic
    # composite; pass a model probability (ml.doc_quality_scores'
    # expression) for the DCLM shape — representatives and the budget
    # prefix then rank by the LEARNED score while the gates stay
    # heuristic (the cheap scan-local prune runs first either way)
    gated = (
        docs.withColumn(
            "quality", quality_expr if quality_expr is not None else tx.quality_score("text")
        )
        .filter(keep)
        # n_tokens rides the persisted frame (4 bytes/row) so the budget
        # pass reads a column instead of re-running normalize+split over
        # every cached survivor.  The token ARRAY deliberately does NOT:
        # caching it would roughly double the cache footprint (the array
        # is about the bytes of the text itself), and its only consumer
        # is the signature scan, which is itself persisted — shingling
        # already tokenizes exactly once per pipeline run.
        .select("doc_id", "text", "quality", tx.token_count("text").alias("n_tokens"))
        .transform(_persist)
    )
    canon = dedup.content_hash_dedup(gated)
    exact = gated.join(canon.select("doc_id"), "doc_id", "left_semi").transform(_persist)
    pairs = dedup.minhash_near_duplicates(
        exact,
        shingle_k=shingle_k,
        threshold=jaccard_threshold,
        portable_hash=portable_hash,
    )
    comps = dedup.connected_components(pairs)
    return _post_cc_budget_select(exact, comps, budget)


def hybrid_dedup_pipeline(
    docs: DataFrame,
    vecs: DataFrame,
    centroids: list[list[float]],
    budget: int = 20_000,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    cos_threshold: float = 0.95,
    max_cluster: int = 10_000,
    portable_hash: bool = False,
) -> DataFrame:
    """Lexical ∪ semantic dedup — the FineWeb/Dolma production shape:
    near-verbatim duplicates (MinHash-LSH over shingles) and semantic
    duplicates (SemDeDup over embeddings) are DIFFERENT phenomena with
    different recall, so production pipelines run both and deduplicate
    over the UNION of the two pair graphs:

        MinHash-LSH pairs  ─┐
                            ├─ union -> ONE connected components
        SemDeDup pairs     ─┘       -> quality-best representative
                                    -> token-budget prefix select

    One CC over the union (not one per graph) is the point: a lexical
    chain a–b and a semantic chain b–c are the SAME duplicate cluster
    {{a,b,c}}, which two independent passes would split — keeping two
    representatives of one cluster.

    Scale shape: each pair generator keeps its own bounded candidate
    structure (banded LSH buckets with the hot-bucket cap; scan-local
    centroid assignment with the cluster-size valve) — the union is
    edge-list concatenation, free of any new join.  Semantic edges are
    semi-join-restricted to ids present in the document frame, so an
    embedding table that is a superset of the corpus (common: one
    embedding store, many corpus snapshots) cannot leak foreign ids
    into the components.  The scored document frame is persisted once
    and feeds the lexical index build, the representative pick, and the
    budget pass; CC iterates on checkpointed labels exactly as ll06
    (``connected_components`` executes jobs on construction, so this
    composition is a driver — its lazy stages are gate-audited in
    tests/test_plan_invariants.py).  Returns (doc_id, quality,
    n_tokens, cum_tokens), ``token_budget_select``'s contract.
    """
    scored = (
        docs.withColumn("quality", tx.quality_score("text"))
        # n_tokens cached, token array not — same boundary as
        # refinedweb_pipeline (see the comment there)
        .select("doc_id", "text", "quality", tx.token_count("text").alias("n_tokens"))
        .transform(_persist)
    )
    edges = hybrid_dedup_edges(
        scored,
        vecs,
        centroids,
        shingle_k=shingle_k,
        jaccard_threshold=jaccard_threshold,
        cos_threshold=cos_threshold,
        max_cluster=max_cluster,
        portable_hash=portable_hash,
    )
    comps = dedup.connected_components(edges)
    return _post_cc_budget_select(scored, comps, budget)


def hybrid_dedup_edges(
    scored: DataFrame,
    vecs: DataFrame,
    centroids: list[list[float]],
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    cos_threshold: float = 0.95,
    max_cluster: int = 10_000,
    portable_hash: bool = False,
) -> DataFrame:
    """The lazy edge-building half of ``hybrid_dedup_pipeline`` (split
    out so the plan gate can audit its shape without running CC): the
    MinHash-LSH pair graph over ``scored`` (doc_id, text, quality)
    unioned with the SemDeDup pair graph over ``vecs``, semantic
    endpoints semi-restricted to the document id domain.  Direction
    doubling and cross-graph edge dedup happen inside ``_cc_edges``."""
    lex = dedup.minhash_near_duplicates(
        scored,
        shingle_k=shingle_k,
        threshold=jaccard_threshold,
        portable_hash=portable_hash,
    ).select("id_a", "id_b")
    sem = dedup.semdedup_pairs(
        vecs, centroids, threshold=cos_threshold, max_cluster=max_cluster
    ).select("id_a", "id_b")
    ids = scored.select(F.col("doc_id").alias("id_a"))
    sem = sem.join(ids, "id_a", "leftsemi").join(
        ids.withColumnRenamed("id_a", "id_b"), "id_b", "leftsemi"
    )
    return lex.unionByName(sem)


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

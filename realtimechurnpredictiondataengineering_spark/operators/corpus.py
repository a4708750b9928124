"""Corpus-level text statistics (north star §2.10 text analysis).

Per-document expressions live in ``functions.text`` (pure columns);
this module holds operators whose semantics span the corpus — today
TF-IDF term ranking, which needs global document frequencies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.functions.text import shingles, tokens


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``, sklearn's smooth-idf form).

    One tokenize-explode scan feeds everything: term frequencies
    aggregate on (doc, term); document frequencies re-aggregate THOSE
    partials on term (no second raw scan, same trick as the
    hierarchical rollup); the corpus size N is a one-row aggregate
    cross-joined as a broadcast.  Scores are rounded BEFORE ranking so
    the top-k cut is reproducible across engines, with the term as the
    tie-break.  Returns (id, rank, term, tfidf).
    """
    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("dfreq") + 1.0)) + 1.0),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(id_col), F.col("rank").cast("int").alias("rank"), "term", "tfidf")
    )


def contamination_pairs(
    corpus: DataFrame,
    benchmarks: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    min_overlap: int = 3,
) -> DataFrame:
    """Benchmark-contamination detection: corpus documents sharing at
    least ``min_overlap`` distinct word ``shingle_k``-grams with any
    benchmark document (the eval-leakage check every pretraining corpus
    runs before release).

    The benchmark side is small by definition (eval suites are KBs, the
    corpus is TBs), so its exploded shingle index BROADCASTS: the corpus
    side is one explode + map-side hash join + pair aggregate — no
    shuffle of corpus shingles, no candidate blowup beyond truly
    overlapping grams.  Returns (doc_id, bench_id, n_shared).
    """
    c_inv = corpus.select(
        F.col(id_col), F.explode(shingles(text_col, shingle_k)).alias("shingle")
    )
    b_inv = benchmarks.select(
        F.col(id_col).alias("bench_id"),
        F.explode(shingles(text_col, shingle_k)).alias("shingle"),
    )
    return (
        c_inv.join(F.broadcast(b_inv), "shingle")
        .groupBy(id_col, "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
        .select(F.col(id_col), "bench_id", F.col("n_shared").cast("long").alias("n_shared"))
    )

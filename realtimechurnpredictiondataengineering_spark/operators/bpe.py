"""Distributed BPE vocabulary training (byte-pair-encoding merges).

The tokenizer-adjacent leg of the corpus stack: the scoring/packing
operators CONSUME a tokenization; this LEARNS one — Sennrich et al.
2016's subword recipe, re-expressed for Spark's execution model.  The
reference repo has no tokenizer trainer (its text leg is hash
arithmetic, SURVEY §2.9); this is a north-star addition in the v19
k-means posture: fixed rounds, deterministic tie-breaks, a frozen
artifact (the merge table), and an oracle-replayable unrolled-round
twin.

Why this scales where the textbook algorithm doesn't: the corpus is
scanned EXACTLY ONCE, to build the word-frequency table (Sennrich's own
preprocessing — BPE statistics only ever depend on (word, freq), and
the distinct-word table is Zipf-bounded, millions of rows at any corpus
size, not corpus-sized).  Every training round then runs against that
vocab-sized table:

- pair counting is ONE groupBy shuffle over exploded adjacent symbol
  pairs, freq-weighted — map-side partial sums make it a vocab-bounded
  aggregate;
- the winning pair is a distributed top-1 (TakeOrderedAndProject —
  count desc, pair asc for determinism), never a driver-side sort;
- the merge applies as a scan-local string ``replace`` — no shuffle.

Symbol sequences live as DOUBLE-SPACE-joined strings ("  a  b  c  ")
rather than arrays: ``replace(sym, ' a  b ', ' ab ')`` consumes one
boundary space on each side and leaves one, so consecutive occurrences
chain ("a a a a" → "aa aa") while overlaps stay greedy left-to-right
("a a a" → "aa a") — plain non-regex ``replace`` has identical
semantics in Spark and DuckDB (probed), and symbols never contain
spaces (words are whitespace tokens), so no boundary can false-match.
The winner feeds the replace via a 1-row broadcast crossJoin — no
``collect``, the loop stays fully distributed; each round's vocab frame
is ``stats_free_checkpoint``-ed (the iterative-loop discipline shared
with connected components and k-means: localCheckpoint without the
stats reset compounds join size estimates geometrically).

Production extension (documented lead, not implemented): real trainers
batch the top-K pairwise NON-INTERACTING merges per round to cut round
count ~K×; the per-round plan is identical, only winner selection
widens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.cache import stats_free_checkpoint


def word_frequencies(
    corpus: DataFrame,
    text_col: str = "text",
    max_word_len: int = 64,
) -> DataFrame:
    """The one corpus scan: whitespace tokens → (word, freq).

    ``max_word_len`` is the scale valve: a degenerate megabyte "word"
    (minified JS, base64 blobs) would explode into a megabyte of
    symbols every round; real tokenizer trainers drop or pre-split
    such words, and the cap makes that policy explicit."""
    from realtimechurnpredictiondataengineering_spark.functions.text import tokens

    return (
        corpus.select(F.explode(tokens(text_col)).alias("__w"))
        .filter((F.length("__w") > 0) & (F.length("__w") <= max_word_len))
        .groupBy("__w")
        .agg(F.count("*").alias("__freq"))
    )


def _init_symbols(words: DataFrame) -> DataFrame:
    """Character-level start state: every word becomes its double-space
    joined character sequence with boundary padding."""
    return words.select(
        "__w",
        "__freq",
        F.concat(
            F.lit("  "), F.array_join(F.split("__w", ""), "  "), F.lit("  ")
        ).alias("__sym"),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-pair counts over the symbol table — the
    one shuffle per round."""
    t = F.split(F.trim(F.col("__sym")), "  ")
    pair_expr = F.expr(
        "transform(sequence(2, size(__t)), i -> struct(__t[i-2] AS a, __t[i-1] AS b))"
    )
    return (
        syms.select("__freq", t.alias("__t"))
        .filter(F.size("__t") >= 2)
        .select("__freq", F.explode(pair_expr).alias("__p"))
        .groupBy(F.col("__p.a").alias("left_sym"), F.col("__p.b").alias("right_sym"))
        .agg(F.sum("__freq").alias("pair_count"))
    )


def bpe_train(
    corpus: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    max_word_len: int = 64,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from ``corpus``; returns the merge
    table (merge_rank, left_sym, right_sym, merged, pair_count) in
    learned order — the frozen artifact a tokenizer serves from.

    Deterministic end to end: winner per round is (count desc,
    left asc, right asc); rerunning on the same corpus reproduces the
    table on any partitioning/engine, which is what makes the
    unrolled-round SQL twin (t29) value-checkable.  A round with no
    remaining pairs contributes no row (the merge table just ends
    early).  No end-of-word marker is appended: merges are learned over
    in-word adjacency only — the marker variant is one extra literal in
    ``_init_symbols`` and changes no plan shape.
    """
    syms = stats_free_checkpoint(_init_symbols(word_frequencies(corpus, text_col, max_word_len)))
    winners: list[DataFrame] = []
    for rank in range(1, n_merges + 1):
        win = stats_free_checkpoint(
            _pair_counts(syms)
            .orderBy(F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym"))
            .limit(1)
        )
        winners.append(
            win.select(
                F.lit(rank).alias("merge_rank"),
                "left_sym",
                "right_sym",
                F.concat("left_sym", "right_sym").alias("merged"),
                F.col("pair_count").cast("long").alias("pair_count"),
            )
        )
        if rank < n_merges:
            syms = stats_free_checkpoint(
                syms.crossJoin(F.broadcast(win)).select(
                    "__w",
                    "__freq",
                    F.expr(
                        "replace(__sym,"
                        " ' ' || left_sym || '  ' || right_sym || ' ',"
                        " ' ' || left_sym || right_sym || ' ')"
                    ).alias("__sym"),
                )
            )
    out = winners[0]
    for w in winners[1:]:
        out = out.unionByName(w)
    return out


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list to text: whitespace-tokenize, expand
    each token to characters, replay the merges IN LEARNED ORDER (the
    BPE inference rule), return the flattened subword sequence per row.
    Pure scan-local string work — the merge list is a frozen artifact
    compiled into the projection as literals; no join, no shuffle, no
    UDF (``transform`` over the token array, ``replace`` per merge)."""
    from realtimechurnpredictiondataengineering_spark.functions.text import tokens

    def segment_word(w):
        sym = F.concat(F.lit("  "), F.array_join(F.split(w, ""), "  "), F.lit("  "))
        for a, b in merges:
            sym = F.replace(sym, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
        return F.split(F.trim(sym), "  ")

    return df.withColumn(
        out_col,
        F.flatten(F.transform(tokens(text_col), segment_word)),
    )

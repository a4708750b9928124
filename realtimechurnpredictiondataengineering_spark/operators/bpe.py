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

``merges_per_round`` batches the top-K pairwise SYMBOL-DISJOINT merges
per round (the production variant that cuts round count ~K×): a merge
(a,b) cannot change the pair counts of any (c,d) with
{c,d} ∩ {a,b} = ∅ — adjacency of untouched symbols is invariant under
merging others — so disjoint merges commute and apply in one fold.
A candidate sharing a symbol with any higher-ranked candidate is
deferred to a later round (it would need a recount); this is the
standard approximation — a brand-new merged symbol could in principle
form a pair outranking a deferred candidate, which exact sequential
BPE (K=1) would see.
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


#: Sennrich et al. 2016's end-of-word symbol: a distinct token appended
#: after the final character so merges can learn word-final units
#: ("est·" vs mid-word "est").  Space-free, so the double-space replace
#: machinery treats it like any other symbol.  The collision (a corpus
#: word whose characters "<", "/", "w", ">" could merge into this exact
#: string and be conflated with the boundary marker) is ENFORCED away,
#: not just documented: ``_init_symbols`` drops words containing
#: '<' or '>' from the eow training state (the standard escape-or-drop
#: preprocessing policy, made explicit), and the t34 twin applies the
#: identical predicate.
EOW_MARKER = "</w>"


def _init_symbols(words: DataFrame, end_of_word: bool = False) -> DataFrame:
    """Character-level start state: every word becomes its double-space
    joined character sequence with boundary padding — plus the
    ``EOW_MARKER`` symbol after the last character when
    ``end_of_word`` is set (the documented one-literal variant).
    With the marker on, words containing '<' or '>' are dropped so no
    corpus word can merge into the literal marker string (see
    ``EOW_MARKER``)."""
    if end_of_word:
        words = words.filter(
            ~F.col("__w").contains("<") & ~F.col("__w").contains(">")
        )
    tail = f"  {EOW_MARKER}  " if end_of_word else "  "
    return words.select(
        "__w",
        "__freq",
        F.concat(
            F.lit("  "), F.array_join(F.split("__w", ""), "  "), F.lit(tail)
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
    merges_per_round: int = 1,
    end_of_word: bool = False,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from ``corpus``; returns the merge
    table (merge_rank, left_sym, right_sym, merged, pair_count) in
    learned order — the frozen artifact a tokenizer serves from.

    ``merges_per_round=1`` is exact textbook BPE (parity-pinned against
    a sequential reference); K>1 runs ``ceil(n_merges/K)`` rounds, each
    taking the top-K candidates and keeping those symbol-disjoint from
    every higher-ranked candidate in the batch (see module docstring
    for why disjoint merges commute and what the approximation trades).

    Deterministic end to end: candidates rank (count desc, left asc,
    right asc); rerunning on the same corpus reproduces the table on
    any partitioning/engine, which is what makes the unrolled-round SQL
    twin (t29) value-checkable.  A round with no remaining pairs
    contributes no row (the merge table just ends early).

    ``end_of_word`` appends the ``EOW_MARKER`` symbol after each word's
    final character (Sennrich et al. 2016's formulation), letting the
    trainer learn word-FINAL units as distinct merges ("est·" vs
    mid-word "est") — one extra literal in ``_init_symbols``, no plan
    shape change, t34's oracle-checked variant.  Default False keeps
    the t29 in-word-adjacency semantics.
    """
    from pyspark.sql import Window

    k = int(merges_per_round)
    empty = corpus.sparkSession.createDataFrame(
        [],
        "merge_rank int, left_sym string, right_sym string, merged string, pair_count long",
    )
    if n_merges <= 0:
        return empty
    syms = stats_free_checkpoint(
        _init_symbols(word_frequencies(corpus, text_col, max_word_len), end_of_word)
    )
    order = [F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym")]
    winners: list[DataFrame] = []
    # k == 1 runs up to n_merges fixed rounds (the oracle-replayable
    # shape t29 unrolls), ending early on an exhausted corpus; k > 1
    # loops until n_merges are learned —
    # deferral makes per-round yield data-dependent, and counting the
    # already-checkpointed ≤K-row winner frame is a trivial job, not a
    # data collect (the CC-loop convergence-check discipline)
    learned = 0
    rnd = 0
    while learned < n_merges:
        rnd += 1
        if k == 1:
            win = stats_free_checkpoint(_pair_counts(syms).orderBy(*order).limit(1))
            # an exhausted corpus (every word a single symbol) yields an
            # empty winner frame — break, mirroring the k>1 got==0 exit,
            # instead of burning one full pair-count job per remaining
            # round; counting the already-checkpointed ≤1-row frame is a
            # trivial job, not a data collect
            got = win.count()
            if got == 0:
                break
        else:
            # top-K candidates (K rows after the distributed top-k), then
            # defer any candidate sharing a symbol with a higher-ranked
            # one — the K-row window/self-join is driver-free and trivial
            cand = (
                _pair_counts(syms)
                .orderBy(*order)
                .limit(min(k, n_merges - learned))
                .withColumn("__r", F.row_number().over(Window.orderBy(*order)))
            )
            higher = cand.select(
                F.col("__r").alias("__hr"),
                F.col("left_sym").alias("__ha"),
                F.col("right_sym").alias("__hb"),
            )
            interacts = (F.col("__hr") < F.col("__r")) & (
                F.col("__ha").isin(F.col("left_sym"), F.col("right_sym"))
                | F.col("__hb").isin(F.col("left_sym"), F.col("right_sym"))
            )
            win = stats_free_checkpoint(cand.join(higher, interacts, "left_anti"))
            got = win.count()
            if got == 0:
                break
        winners.append(
            win.select(
                F.lit(rnd).alias("__round"),
                (F.col("__r") if k > 1 else F.lit(1)).alias("__r"),
                "left_sym",
                "right_sym",
                F.concat("left_sym", "right_sym").alias("merged"),
                F.col("pair_count").cast("long").alias("pair_count"),
            )
        )
        learned += got
        if learned < n_merges:
            # the selected batch rides ONE 1-row broadcast as an array of
            # (a, b) structs; disjointness makes the fold order-free, but
            # array_sort keeps it deterministic anyway
            batch = win.agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("left_sym").alias("a"), F.col("right_sym").alias("b"))
                    )
                ).alias("__ms")
            )
            syms = stats_free_checkpoint(
                syms.crossJoin(F.broadcast(batch)).select(
                    "__w",
                    "__freq",
                    F.aggregate(
                        "__ms",
                        F.col("__sym"),
                        lambda acc, m: F.replace(
                            acc,
                            F.concat(F.lit(" "), m.a, F.lit("  "), m.b, F.lit(" ")),
                            F.concat(F.lit(" "), m.a, m.b, F.lit(" ")),
                        ),
                    ).alias("__sym"),
                )
            )
    if not winners:
        return empty
    out = winners[0]
    for w in winners[1:]:
        out = out.unionByName(w)
    if k == 1:
        return out.select(
            F.col("__round").alias("merge_rank"),
            "left_sym",
            "right_sym",
            "merged",
            "pair_count",
        )
    ranked = out.withColumn(
        "merge_rank",
        F.row_number().over(Window.orderBy(F.asc("__round"), F.asc("__r"))),
    )
    return ranked.filter(F.col("merge_rank") <= n_merges).select(
        "merge_rank", "left_sym", "right_sym", "merged", "pair_count"
    )


def bpe_vocab(
    corpus: DataFrame,
    merges_df: DataFrame,
    text_col: str = "text",
    max_word_len: int = 64,
    end_of_word: bool = False,
) -> DataFrame:
    """The second frozen artifact a trained tokenizer ships: the final
    SYMBOL INVENTORY — every subword that survives after replaying the
    learned merge table over the training corpus, with its
    freq-weighted occurrence count.  (The merge table drives
    segmentation; the vocabulary drives id assignment, coverage audits,
    and the longest-match serve variant.)

    Plan: the one word-frequency scan (Zipf-bounded output), the merge
    table riding ONE 1-row broadcast as a rank-ordered array replayed
    by a runtime ``aggregate`` fold (constant plan depth at any
    vocabulary size — the ``bpe_segment`` discipline), one explode of
    the final symbol sequences, ONE groupBy.  ``end_of_word`` must
    match the flag the merge table was trained with — the marker is
    part of the start state, not of the merges.  Returns
    (symbol, n_occurrences), deterministic for a deterministic merge
    table.
    """
    batch = _merge_batch(merges_df, end_of_word, "bpe_vocab")
    syms = _init_symbols(
        word_frequencies(corpus, text_col, max_word_len), end_of_word
    )
    folded = syms.crossJoin(F.broadcast(batch)).select(
        "__freq",
        F.aggregate(
            "__ms",
            F.col("__sym"),
            lambda acc, m: F.replace(
                acc,
                F.concat(F.lit(" "), m["a"], F.lit("  "), m["b"], F.lit(" ")),
                F.concat(F.lit(" "), m["a"], m["b"], F.lit(" ")),
            ),
        ).alias("__sym"),
    )
    return (
        folded.select(
            "__freq", F.explode(F.split(F.trim("__sym"), "  ")).alias("symbol")
        )
        .groupBy("symbol")
        .agg(F.sum("__freq").cast("long").alias("n_occurrences"))
    )


def _merge_batch(merges_df: DataFrame, end_of_word: bool, caller: str) -> DataFrame:
    """The 1-row broadcast side every frame-based serve path rides: the
    merge table as a rank-ordered array of (r, a, b) structs, plus a
    BOTH-directional runtime guard on the ``end_of_word`` flag.

    Detection is structural, not substring containment: in a genuine
    eow-trained table the marker enters each word as an atomic FINAL
    symbol, so every marker-bearing symbol carries it as a suffix and
    only ever appears as the RIGHT operand of a merge (nothing merges
    onto a word-final symbol's right).  ``right_sym`` ending with
    ``EOW_MARKER`` therefore detects exactly the genuine marker merges
    — a table trained with ``end_of_word=False`` on a corpus that
    happens to contain ``'<'``/``'>'`` characters no longer trips the
    guard unless its merges literally reproduce the marker as a
    right-operand suffix (which requires chaining all four marker
    characters into one symbol, the documented residual ambiguity of
    artifact-only detection).

    Guarded mismatches, both failing loudly via ``assert_true`` on the
    1-row frame (distributed, no collect) instead of degrading:

    * eow-trained table served with the flag OFF — the marker merges
      silently never apply (wrong segmentation, no error);
    * marker-FREE non-empty table served with the flag ON — the
      appended marker never merges and surfaces as stray standalone
      tokens, inflating ``n_bpe_tokens``.  An empty table is exempt
      (zero-merge eow segmentation is character split + marker, well
      defined), and a genuinely eow-trained table whose few merges
      never touched the marker is indistinguishable from a non-eow
      table by the artifact alone — serve that one via
      ``bpe_segment_vocab`` (its vocabulary always carries the
      marker) if the guard fires."""
    batch = merges_df.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("merge_rank").alias("r"),
                    F.col("left_sym").alias("a"),
                    F.col("right_sym").alias("b"),
                )
            )
        ).alias("__ms"),
        F.max(F.col("right_sym").endswith(EOW_MARKER)).alias("__has_eow"),
    )
    if not end_of_word:
        batch = batch.filter(
            F.assert_true(
                ~F.coalesce(F.col("__has_eow"), F.lit(False)),
                F.lit(
                    f"{caller}: merge table contains {EOW_MARKER} symbols "
                    "(trained with end_of_word=True) but the serve start "
                    "state has no marker — pass end_of_word=True"
                ),
            ).isNull()
        )
    else:
        # empty table → __has_eow is NULL → coalesce(TRUE) → pass
        batch = batch.filter(
            F.assert_true(
                F.coalesce(F.col("__has_eow"), F.lit(True)),
                F.lit(
                    f"{caller}: end_of_word=True but the merge table "
                    f"contains no {EOW_MARKER} symbols (trained with "
                    "end_of_word=False?) — the appended marker would "
                    "never merge; pass end_of_word=False"
                ),
            ).isNull()
        )
    return batch.select("__ms")


def bpe_segment_frame(
    df: DataFrame,
    merges_df: DataFrame,
    text_col: str = "text",
    end_of_word: bool = False,
) -> DataFrame:
    """Apply a ``bpe_train`` merge TABLE to a corpus — the serve path
    when the vocabulary was just learned in the same session (no
    driver round-trip: the merge table rides ONE 1-row broadcast as a
    rank-ordered array, and each document replays the merges inside a
    ``transform``/``aggregate`` fold — scan-local, no shuffle beyond
    the broadcast's own, no UDF).

    ``end_of_word`` MUST match the flag the merge table was trained
    with: it appends ``EOW_MARKER`` to each word's start state (so
    word-final merges learned under the marker actually apply; the
    marker survives into ``bpe_text`` attached to whatever word-final
    subword it merged into, Sennrich's serving form).  The mismatch is
    guarded, not silent: serving an eow-trained table with the flag off
    raises at runtime (see ``_merge_batch``).

    Output is driver-canonicalizable by design: the subword sequence
    surfaces as a space-joined STRING plus its length, not an array
    (array cells fail the external gate's pandas canonicalization —
    the v06/m01 lesson).  Returns (original columns…, n_tokens,
    n_bpe_tokens, bpe_text); empty documents yield (0, 0, '').
    """
    from realtimechurnpredictiondataengineering_spark.functions.text import token_count, tokens

    batch = _merge_batch(merges_df, end_of_word, "bpe_segment_frame")
    tail = f"  {EOW_MARKER}  " if end_of_word else "  "
    toks = F.when(token_count(text_col) > 0, tokens(text_col)).otherwise(
        F.array().cast("array<string>")
    )
    segmented = F.flatten(
        F.transform(
            toks,
            lambda w: F.split(
                F.trim(
                    F.aggregate(
                        "__ms",
                        F.concat(
                            F.lit("  "), F.array_join(F.split(w, ""), "  "), F.lit(tail)
                        ),
                        lambda acc, m: F.replace(
                            acc,
                            F.concat(F.lit(" "), m.a, F.lit("  "), m.b, F.lit(" ")),
                            F.concat(F.lit(" "), m.a, m.b, F.lit(" ")),
                        ),
                    )
                ),
                "  ",
            ),
        )
    )
    return (
        df.crossJoin(F.broadcast(batch))
        .withColumn("n_tokens", token_count(text_col))
        .withColumn("__bt", segmented)
        .withColumn("n_bpe_tokens", F.size("__bt").cast("int"))
        .withColumn("bpe_text", F.array_join("__bt", " "))
        .drop("__ms", "__bt")
    )


def bpe_segment_vocab(
    df: DataFrame,
    vocab_df: DataFrame,
    text_col: str = "text",
    end_of_word: bool = False,
) -> DataFrame:
    """Greedy longest-match segmentation against a ``bpe_vocab`` symbol
    INVENTORY — the production serve path whose per-word cost is
    independent of the merge count (the WordPiece serving rule over a
    BPE-trained vocabulary).

    Why this exists next to ``bpe_segment_frame``: the merge-replay fold
    is the exact-replay reference, but it pays one full replace pass
    over the word's symbol string PER LEARNED MERGE — at a production
    32k-merge vocabulary that is ~32k scans per word, ~1000× the work of
    matching the final vocabulary directly.  Here each word is consumed
    left-to-right: at every position the longest vocabulary symbol that
    prefixes the remainder is taken (ties are impossible — equal-length
    matches are the same string), falling back to the single character
    when nothing matches (out-of-alphabet serve input).  Per-word cost
    is O(len · bucket) with bucket = the vocabulary symbols sharing the
    position's first character — flat in the merge count.

    Note the semantics: longest-match against a BPE vocabulary is NOT
    guaranteed token-for-token identical to merge-order replay (the
    known BPE/WordPiece serving divergence — replay can prefer an
    earlier-learned SHORTER merge whose pieces longest-match consumes
    differently).  Both produce vocabulary-only segmentations that
    concatenate back to the word (property-tested); on the trained
    tables this repo ships they agree (parity-tested) — pick replay for
    bit-compatibility with training, longest-match for serve cost.

    Plan shape: the vocabulary rides ONE 1-row broadcast as a
    first-character-bucketed map (each bucket sorted longest-first);
    each document segments inside a scan-local ``aggregate`` fold over
    at most ``length(word)`` steps (each step consumes ≥1 character).
    No join, no shuffle beyond the broadcast's own, no UDF.  Output
    mirrors ``bpe_segment_frame``: (original columns…, n_tokens,
    n_bpe_tokens, bpe_text); empty documents yield (0, 0, '').

    ``end_of_word`` must match the flag the vocabulary was trained
    with: it appends ``EOW_MARKER`` to the match string so word-final
    symbols ("ow</w>") can match; the mismatch is guarded exactly like
    the merge-table paths.
    """
    from realtimechurnpredictiondataengineering_spark.functions.text import token_count, tokens

    buckets = vocab_df.groupBy(
        F.substring("symbol", 1, 1).alias("__c")
    ).agg(
        # longest-first within the bucket: sort (length, symbol) asc,
        # reverse — filter() preserves order, so element 1 of the
        # surviving matches IS the longest
        F.reverse(
            F.array_sort(
                F.collect_list(
                    F.struct(F.length("symbol").alias("l"), F.col("symbol").alias("s"))
                )
            )
        ).alias("__b"),
    )
    # Marker detection is suffix-structural (the _merge_batch rationale):
    # every marker-bearing symbol an eow vocabulary can contain ends with
    # the marker (it enters word-FINAL and merges only grow it leftward),
    # and — unlike a merge table — an eow-trained vocabulary ALWAYS
    # carries at least one such symbol (each word's final state ends in
    # a marker-suffixed symbol or the standalone marker), so the mirror
    # guard below is sound: a non-empty vocabulary with no marker symbol
    # cannot have been built with end_of_word=True.
    vm = buckets.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct("__c", F.transform("__b", lambda e: e["s"]))
            )
        ).alias("__vm"),
        F.max(F.exists("__b", lambda e: e["s"].endswith(EOW_MARKER))).alias(
            "__has_eow"
        ),
    )
    if not end_of_word:
        vm = vm.filter(
            F.assert_true(
                ~F.coalesce(F.col("__has_eow"), F.lit(False)),
                F.lit(
                    f"bpe_segment_vocab: vocabulary contains {EOW_MARKER} "
                    "symbols (trained with end_of_word=True) but the serve "
                    "match string has no marker — pass end_of_word=True"
                ),
            ).isNull()
        )
    else:
        # empty vocabulary → __has_eow is NULL → coalesce(TRUE) → pass
        vm = vm.filter(
            F.assert_true(
                F.coalesce(F.col("__has_eow"), F.lit(True)),
                F.lit(
                    f"bpe_segment_vocab: end_of_word=True but the "
                    f"vocabulary contains no {EOW_MARKER} symbols (built "
                    "with end_of_word=False?) — the appended marker would "
                    "shatter into single-character fallback tokens; pass "
                    "end_of_word=False"
                ),
            ).isNull()
        )
    vm = vm.select("__vm")

    def segment_word(w):
        s = F.concat(w, F.lit(EOW_MARKER)) if end_of_word else w
        n = F.length(s)

        def step(acc, _):
            pos = acc["pos"]
            cand = F.element_at("__vm", F.substr(s, pos, F.lit(1)))
            matches = F.filter(
                cand, lambda sym: F.substr(s, pos, F.length(sym)) == sym
            )
            tok = F.coalesce(F.element_at(matches, 1), F.substr(s, pos, F.lit(1)))
            return F.when(pos > n, acc).otherwise(
                F.struct(
                    (pos + F.length(tok)).alias("pos"),
                    F.concat(acc["toks"], F.array(tok)).alias("toks"),
                )
            )

        return F.aggregate(
            F.sequence(F.lit(1), n),
            F.struct(
                F.lit(1).alias("pos"), F.array().cast("array<string>").alias("toks")
            ),
            step,
            lambda acc: acc["toks"],
        )

    toks = F.when(token_count(text_col) > 0, tokens(text_col)).otherwise(
        F.array().cast("array<string>")
    )
    segmented = F.flatten(F.transform(toks, segment_word))
    return (
        df.crossJoin(F.broadcast(vm))
        .withColumn("n_tokens", token_count(text_col))
        .withColumn("__bt", segmented)
        .withColumn("n_bpe_tokens", F.size("__bt").cast("int"))
        .withColumn("bpe_text", F.array_join("__bt", " "))
        .drop("__vm", "__bt")
    )


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    end_of_word: bool = False,
) -> DataFrame:
    """Apply a learned merge list to text: whitespace-tokenize, expand
    each token to characters, replay the merges IN LEARNED ORDER (the
    BPE inference rule), return the flattened subword sequence per row.
    Pure scan-local string work — the merge list is a frozen artifact
    compiled into the projection as ONE literal array of (a, b) structs
    folded at RUNTIME by ``aggregate``; no join, no shuffle, no UDF.

    ``end_of_word`` must match the training flag (appends ``EOW_MARKER``
    to each word's start state); the merge list is driver-local here, so
    the mismatch check is a plain ``ValueError`` at build time rather
    than the frame path's runtime assert.

    The fold, not nested ``replace`` calls, is what makes this serve at
    production vocabulary sizes: one Replace expression per merge
    compiles a tree whose DEPTH grows with the merge count —
    StackOverflowError inside Catalyst at ≈512 merges, far below a real
    32k-merge vocabulary — while the literal array grows the plan in
    WIDTH only (two string literals per merge) and the analyzed tree
    stays constant-size (regression-pinned at ≥512 merges).  Per-row
    cost is unchanged: the same O(merges) replace passes, now as a
    runtime loop instead of a compiled expression spine."""
    from realtimechurnpredictiondataengineering_spark.functions.text import tokens

    # suffix-structural marker detection + both-directional guard —
    # same rationale and exemptions as _merge_batch (empty list exempt)
    has_eow = any(b.endswith(EOW_MARKER) for _, b in merges)
    if not end_of_word and has_eow:
        raise ValueError(
            f"bpe_segment: merge list contains {EOW_MARKER} symbols "
            "(trained with end_of_word=True) but the serve start state "
            "has no marker — pass end_of_word=True"
        )
    if end_of_word and merges and not has_eow:
        raise ValueError(
            f"bpe_segment: end_of_word=True but the merge list contains "
            f"no {EOW_MARKER} symbols (trained with end_of_word=False?) — "
            "the appended marker would never merge; pass end_of_word=False"
        )
    tail = f"  {EOW_MARKER}  " if end_of_word else "  "
    ms = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in merges
        ]
    )

    def segment_word(w):
        sym = F.aggregate(
            ms,
            F.concat(F.lit("  "), F.array_join(F.split(w, ""), "  "), F.lit(tail)),
            lambda acc, m: F.replace(
                acc,
                F.concat(F.lit(" "), m["a"], F.lit("  "), m["b"], F.lit(" ")),
                F.concat(F.lit(" "), m["a"], m["b"], F.lit(" ")),
            ),
        )
        return F.split(F.trim(sym), "  ")

    if not merges:
        # aggregate() needs a non-empty literal array type; zero merges
        # is just character segmentation (plus the marker symbol when on)
        chars = (
            (lambda w: F.concat(F.split(w, ""), F.array(F.lit(EOW_MARKER))))
            if end_of_word
            else (lambda w: F.split(w, ""))
        )
        return df.withColumn(
            out_col,
            F.flatten(F.transform(tokens(text_col), chars)),
        )
    return df.withColumn(
        out_col,
        F.flatten(F.transform(tokens(text_col), segment_word)),
    )

"""Column profiling (data-quality surface).

The `ANALYZE TABLE` / expectation-suite primitive: per-column row
count, null count, distinct count, min, max — two jobs regardless of
column count, never a per-column loop of scans, and the 1-row result
pivots to long form driver-free with ``stack``.

Why TWO aggregation passes instead of one wide agg: Spark's fast
HashAggregate requires fixed-width mutable aggregation buffers, and
``min``/``max`` over string columns carry string buffers — one agg
mixing those with exact multi-distinct forces a SortAggregate that
fully SORTS the distinct-dedup Expand (rows x (|cols|+1)) on every
profiled column.  Split, each pass gets its fast shape: the basic
pass (count/nulls/min/max) is keyless — no grouping, no sort, pure
map-side partials; the distinct pass carries only long buffers, so
the Expand dedups in a HashAggregate.  Each side pivots to long form
before a broadcast equi-join on ``col_name`` recombines them (a 1x1
crossJoin of the wide rows would plan a nested-loop join).

Min/max surface as strings so one schema carries every column type;
floating-point columns should be pre-cast to DECIMAL by the caller
for engine-portable text (double→string formatting differs across
engines).

At 100 TB exact distinct counts are still the expensive part (the
Expand multiplies the shuffle input); pass ``approx=True`` to switch
to HyperLogLog ``approx_count_distinct`` — no Expand at all, the
whole profile collapses back to ONE keyless pass (HLL buffers are
fixed-width, so the hash path survives the strings' sort fallback
being keyless-trivial) — which is what a scheduled profiling job
should run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str], approx: bool = False) -> DataFrame:
    """Profile ``cols``: one row per column with columns
    (col_name, n_rows, n_nulls, n_distinct, min_value, max_value).
    The label column is ``col_name``, not ``column`` — COLUMN is a
    reserved word in several SQL dialects an oracle might run in."""
    if not cols:
        raise ValueError("cols must name at least one column")
    basic_aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        basic_aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"__nulls_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    if approx:
        row = df.agg(
            *basic_aggs, *[F.approx_count_distinct(c).alias(f"__dist_{c}") for c in cols]
        )
        stack_args = ", ".join(
            f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
        )
        long_form = row.selectExpr(
            "__n",
            f"stack({len(cols)}, {stack_args})"
            " AS (col_name, n_nulls, n_distinct, min_value, max_value)",
        )
    else:
        # each 1-row side pivots to long form FIRST, then an equi-join on
        # col_name recombines them — a broadcast hash join, not the
        # nested-loop join a 1x1 crossJoin would plan
        dist_row = df.agg(
            *[F.count_distinct(F.col(c)).alias(f"__dist_{c}") for c in cols]
        )
        dist_stack = ", ".join(f"'{c}', __dist_{c}" for c in cols)
        dist_long = dist_row.selectExpr(
            f"stack({len(cols)}, {dist_stack}) AS (col_name, n_distinct)"
        )
        basic_stack = ", ".join(f"'{c}', __nulls_{c}, __min_{c}, __max_{c}" for c in cols)
        basic_long = df.agg(*basic_aggs).selectExpr(
            "__n",
            f"stack({len(cols)}, {basic_stack}) AS (col_name, n_nulls, min_value, max_value)",
        )
        long_form = basic_long.join(F.broadcast(dist_long), "col_name")
    return long_form.select(
        F.col("col_name"),
        F.col("__n").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def token_length_histogram(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Log2-bucketed token-length histogram — the corpus-shape summary a
    packing/chunking configuration is sized from (what fraction of
    documents fit one context window, how heavy is the long tail).

    Bucket b holds documents with token count in [2^b, 2^(b+1));
    empty documents land in bucket -1.  One scan-local projection
    (token_count + floor(log2)) and one tiny groupBy — the histogram has
    ≤ ~40 rows at any corpus size, so the aggregate is all map-side
    partials.  Returns (bucket, lo_tokens, n_docs, frac) sorted by
    bucket, frac rounded to 6.
    """
    from realtimechurnpredictiondataengineering_spark.functions.text import token_count

    from pyspark.sql import Window

    tc = token_count(text_col)
    bucket = F.when(tc == 0, F.lit(-1)).otherwise(
        F.floor(F.log2(tc.cast("double")))
    ).cast("int")
    hist = df.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count("*").alias("n_docs")
    )
    # normalizer as an unpartitioned window over the ALREADY-aggregated
    # histogram (≤ ~40 rows) — no second scan, no driver-side count.
    total = F.sum("n_docs").over(Window.partitionBy())
    return hist.select(
        "bucket",
        F.when(F.col("bucket") < 0, F.lit(0))
        .otherwise(F.pow(F.lit(2.0), F.col("bucket")).cast("long"))
        .alias("lo_tokens"),
        "n_docs",
        F.round(F.col("n_docs") / total, 6).alias("frac"),
    ).orderBy("bucket")


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group statistical drift between two snapshots of the same
    table — the data-quality monitor that catches a broken upstream
    producer (nulls spike, a value distribution shifts) before the
    corrupted snapshot lands in training data.

    Each side is one grouped aggregate (count, null rate, mean,
    population stddev — pop, not sample, so single-row groups yield 0.0
    identically on every engine); the two profile tables are
    group-count-sized, so the final full-outer join is negligible at any
    corpus scale.  Returns per group: counts, null rates, means and the
    mean delta, rounded to 4.
    """

    from realtimechurnpredictiondataengineering_spark.functions.scalar import snap

    def prof(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy(group_col).agg(
            F.count("*").alias(f"n_{side}"),
            F.round(
                F.avg(F.col(value_col).isNull().cast("double")), 4
            ).alias(f"null_rate_{side}"),
            snap(F.avg(value_col), 4).alias(f"mean_{side}"),
            F.round(F.stddev_pop(value_col), 4).alias(f"std_{side}"),
        )

    joined = prof(old, "old").join(prof(new, "new"), group_col, "full_outer")
    return joined.withColumn(
        "mean_delta",
        snap(F.coalesce("mean_new", F.lit(0.0)) - F.coalesce("mean_old", F.lit(0.0)), 4),
    )


def expectations_report(df: DataFrame, rules: dict[str, F.Column]) -> DataFrame:
    """Expectation-suite validation (the Great-Expectations primitive
    engine-side): each rule is a boolean Column over a row; the report
    gives per-rule violation counts over the whole frame.

    ONE keyless aggregation pass regardless of rule count — every rule
    compiles to a ``sum((NOT rule)::long)`` in the same HashAggregate
    (map-side partials, fixed-width buffers), then the 1-row result
    pivots to long form with ``stack`` exactly like ``column_profile``.
    A rule that evaluates to NULL on a row (three-valued logic) counts
    as a VIOLATION — an expectation that cannot be affirmed is not met.
    At 100 TB this is one scan, no shuffle beyond the single-row final
    merge.  Returns (rule, n_rows, n_violations, violation_rate,
    passed), one row per rule in ``rules`` insertion order.
    """
    if not rules:
        raise ValueError("rules must name at least one expectation")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, rule) in enumerate(rules.items()):
        aggs.append(
            F.sum((~F.coalesce(rule, F.lit(False))).cast("long")).alias(f"__v_{i}")
        )
    row = df.agg(*aggs)
    # rule names are spliced into stack()'s SQL as string literals —
    # escape backslashes FIRST (Spark's parser treats them as escape
    # sequences inside '...'), then double embedded quotes, so a name
    # like "o'brien\rule" round-trips verbatim instead of breaking (or
    # rewriting) the expression
    stack_args = ", ".join(
        "'{}', __v_{}".format(name.replace("\\", "\\\\").replace("'", "''"), i)
        for i, name in enumerate(rules)
    )
    return row.selectExpr(
        "__n", f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
    ).select(
        F.col("rule"),
        F.col("__n").cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.round(F.col("n_violations") / F.col("__n"), 6).alias("violation_rate"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def embedding_psi(
    reference: DataFrame,
    current: DataFrame,
    vec_col: str = "embedding",
    dims: int = 64,
    lo: float = -0.6,
    hi: float = 0.6,
    n_bins: int = 10,
) -> DataFrame:
    """Per-DIMENSION Population Stability Index between two embedding
    snapshots — the vector twin of ``psi_report`` and the drift signal a
    retrieval/embedding pipeline actually monitors: a retrained or
    corrupted encoder rarely moves the scalar quality score, but it
    moves coordinate distributions, and the per-dimension view shows
    WHICH coordinates moved (a single hot dimension is an encoder bug;
    uniform drift is a data shift).

    Plan: ONE ``posexplode`` scan per side into (dim, value), one
    grouped aggregate each onto the (dims × n_bins) histogram — after
    the aggregate everything is config-sized (640 rows at the
    defaults), so the grid join, the per-dim totals join, and the final
    per-dim sum are negligible at any corpus scale.  The bin grid is a
    driver-local literal frame (dims and n_bins are config), keeping
    the plan free of range×range cross joins.  Same numeric discipline
    as ``psi_report``: values clamp to the edge bins so out-of-range
    coordinates stay visible, Laplace +0.5 per bin keeps empty bins
    finite, NULL vectors are excluded, and each bin term snaps to the
    1e-9 grid before the per-dim sum (cross-engine ln/÷ last-ulp
    noise must not reach the sum).  Returns one row per dimension:
    (dim, psi) with psi rounded to 6.
    """
    width = (hi - lo) / n_bins
    spark = reference.sparkSession

    def binned(df: DataFrame, side: str) -> DataFrame:
        ex = df.filter(F.col(vec_col).isNotNull()).select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "__v")
        )
        # NULL coordinates keep their (dim, NULL-bin) group instead of
        # being filtered before the aggregate: posexplode emits every
        # position, so the persisted histogram then witnesses EVERY
        # observed dimension — which is what lets the dims-guard probe
        # below read max(dim) from the config-sized persisted frames
        # instead of re-scanning the vectors (an all-NULL coordinate
        # used to vanish here and under-report the observed width).
        # The grid join only matches real bins 0..n_bins-1, so NULL-bin
        # rows never reach the PSI terms or the per-dim totals.
        b = F.when(
            F.col("__v").isNotNull(),
            F.least(
                F.greatest(
                    F.floor((F.col("__v") - F.lit(lo)) / F.lit(width)), F.lit(0)
                ),
                F.lit(n_bins - 1),
            ).cast("int"),
        )
        return ex.groupBy(F.col("dim"), b.alias("bin")).agg(
            F.count("*").alias(f"__c_{side}")
        )

    from realtimechurnpredictiondataengineering_spark.cache import persist_tracked

    # the binned frames persist (config-sized: ≤ dims × n_bins rows) —
    # each side feeds both the grid join and the per-dim totals, so the
    # posexplode scans run once per side, not twice
    binned_ref = persist_tracked(binned(reference, "ref"))
    binned_cur = persist_tracked(binned(current, "cur"))
    grid = spark.createDataFrame(
        [(d, b) for d in range(dims) for b in range(n_bins)], "dim int, bin int"
    )
    joined = (
        grid.join(binned_ref, ["dim", "bin"], "left")
        .join(binned_cur, ["dim", "bin"], "left")
        .select(
            "dim",
            "bin",
            F.coalesce("__c_ref", F.lit(0)).alias("__cr"),
            F.coalesce("__c_cur", F.lit(0)).alias("__cc"),
        )
    )
    tot = joined.groupBy("dim").agg(
        F.sum("__cr").alias("__tr"), F.sum("__cc").alias("__tc")
    )
    p_ref = (F.col("__cr") + F.lit(0.5)) / (F.col("__tr") + F.lit(0.5) * n_bins)
    p_cur = (F.col("__cc") + F.lit(0.5)) / (F.col("__tc") + F.lit(0.5) * n_bins)
    term = F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 9)
    # configured-dims guard: a dims/encoder mismatch must fail loudly, not
    # read as "no drift" (coordinates beyond the grid would silently
    # vanish; configured dims absent from the data would report psi = 0.0
    # — both sides Laplace-smoothed from zero counts).  The probe reads
    # max(dim)+1 from the PERSISTED binned frames — scan-free, because
    # ``binned`` now keeps (dim, NULL-bin) groups for NULL coordinates,
    # so every observed dimension (including one that is NULL in every
    # vector) reaches the histogram; a fresh max(size(vec)) pass over
    # the raw vectors would cost one full extra scan of both inputs per
    # evaluation.  The 1-row result broadcasts into the term frame;
    # assert_true raises at runtime, keeping the check distributed — no
    # driver-side collect.  On empty/all-NULL-VECTOR inputs the binned
    # frames are empty, __max_sz is NULL, the == comparison is NULL, and
    # assert_true still fires — with a readable coalesced message.
    probe = (
        binned_ref.select("dim")
        .unionByName(binned_cur.select("dim"))
        .agg((F.max("dim") + 1).alias("__max_sz"))
    )
    checked = (
        joined.join(F.broadcast(tot), "dim")
        .crossJoin(F.broadcast(probe))
        .filter(
            F.assert_true(
                F.col("__max_sz") == dims,
                F.concat(
                    F.lit(f"embedding_psi: configured dims={dims} but observed vector size "),
                    F.coalesce(
                        F.col("__max_sz").cast("string"),
                        F.lit("NULL (empty or all-NULL input)"),
                    ),
                ),
            ).isNull()
        )
    )
    return (
        checked.groupBy(F.col("dim").cast("int").alias("dim"))
        .agg(F.round(F.sum(term), 6).alias("psi"))
    )


def psi_report(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two snapshots of a bounded
    score column — the standard model-monitoring drift metric
    (PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref); rule of thumb:
    <0.1 stable, 0.1-0.25 investigate, >0.25 drifted).

    Fixed-width bins over [lo, hi] (values clamp to the edge bins, so a
    broken upstream emitting out-of-range scores lands visibly in bin 0
    or n_bins-1 rather than vanishing); each side is ONE keyless-free
    grouped aggregate over its scan, the join is n_bins rows, and the
    Laplace smoothing (+0.5 per bin) keeps empty bins finite and
    identical on every engine.  NULL scores are excluded (they are
    `profile_drift`'s null-rate signal, not a bin).
    Returns (bin, lo_edge, p_ref, p_cur, psi_term) rounded to 6 — the
    headline PSI is `sum(psi_term)`, left per-bin so the report shows
    WHERE the mass moved.
    """
    width = (hi - lo) / n_bins

    def binned(df: DataFrame, side: str) -> DataFrame:
        b = F.least(
            F.greatest(
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(0)
            ),
            F.lit(n_bins - 1),
        ).cast("int")
        return (
            df.filter(F.col(value_col).isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count("*").alias(f"__c_{side}"))
        )

    bins = reference.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        bins.join(binned(reference, "ref"), "bin", "left")
        .join(binned(current, "cur"), "bin", "left")
        .select(
            "bin",
            F.coalesce("__c_ref", F.lit(0)).alias("__cr"),
            F.coalesce("__c_cur", F.lit(0)).alias("__cc"),
        )
    )
    tot = joined.agg(
        F.sum("__cr").alias("__tr"), F.sum("__cc").alias("__tc")
    )
    p_ref = (F.col("__cr") + F.lit(0.5)) / (F.col("__tr") + F.lit(0.5) * n_bins)
    p_cur = (F.col("__cc") + F.lit(0.5)) / (F.col("__tc") + F.lit(0.5) * n_bins)
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("lo_edge"),
            F.round(p_ref, 6).alias("p_ref"),
            F.round(p_cur, 6).alias("p_cur"),
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
        )
    )


def completeness_matrix(
    df: DataFrame,
    segment_col: str,
    cols: list[str],
) -> DataFrame:
    """Per-segment completeness grid — the data-quality monitor a
    production pipeline alerts on: for every (segment, column) cell, row
    count and NULL rate.  A column going dark in ONE segment (a producer
    dropped a field, a schema change missed one topic) is invisible in
    the global profile (``column_profile``) because the other segments
    dilute it; the grid localizes it.

    One scan, one aggregate: per-column null counts are conditional sums
    computed segment-wise (map-side partial), then the wide row unpivots
    via ``stack`` into the (segment, column) grid — output cardinality
    is segments × columns, so everything after the scan is negligible.
    Column names are injected as string literals; they come from the
    caller's schema (``df.columns``-derived), not from data, and are
    validated against it so a typo fails loudly instead of profiling a
    phantom column.
    """
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    aggs = [F.count("*").alias("__n")]
    for i, c in enumerate(cols):
        # positional aliases: a legitimate column name containing quotes,
        # backslashes, backticks, or spaces must not reach the generated
        # stack() SQL as an identifier
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{i}"))
    wide = df.groupBy(F.col(segment_col).alias("segment")).agg(*aggs)
    # names are spliced as string LITERALS — escape backslashes first
    # (Spark treats them as escape sequences inside '...'), then double
    # embedded quotes (the expectations_report rule)
    pairs = ", ".join(
        "'{}', __null_{}".format(c.replace("\\", "\\\\").replace("'", "''"), i)
        for i, c in enumerate(cols)
    )
    return (
        wide.selectExpr(
            "segment", "__n", f"stack({len(cols)}, {pairs}) AS (column, __nulls)"
        )
        .select(
            "segment",
            F.col("column"),
            F.col("__n").cast("long").alias("n"),
            F.round(F.col("__nulls") / F.col("__n"), 4).alias("null_rate"),
        )
    )

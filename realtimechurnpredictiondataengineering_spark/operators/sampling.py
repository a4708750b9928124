"""Deterministic sampling (training-data pipeline surface).

``df.sample()`` is nondeterministic across partition layouts — useless
for reproducible corpus construction or cross-engine checking.  These
operators derive the sampling decision from a content hash (md5 of the
key), so the same row makes the same cut on any cluster, any partitioning,
any engine:

- ``hash_sample`` — Bernoulli p%% sample keyed on a column.
- ``stratified_sample`` — exactly n rows per stratum, chosen by hash
  order (window top-n per group; WindowGroupLimit prunes before sort).

Both are single-scan (+ one key shuffle for the stratified variant) and
push the sampling predicate into the scan where possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from md5 of the column text —
    engine-portable (identical in DuckDB via the same hex arithmetic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 6), 16, 10).cast("bigint") % buckets


def hash_sample(df: DataFrame, key: str, percent: int) -> DataFrame:
    """Keep ~``percent``%% of rows, decided by the key's content hash."""
    return df.filter(hash_bucket(key) < percent)


def stratified_sample(df: DataFrame, stratum: str, key: str, n_per_stratum: int) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), picked by hash-of-key order so the draw is stable.  Ties on
    the hash break by the key itself."""
    order = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy(stratum).orderBy(order, F.col(key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def weighted_hash_sample(
    df: DataFrame,
    key: str,
    weight: Column | str,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Per-row weighted Bernoulli thinning: row kept with probability
    ``weight`` (a column in [0, 1]), decided by the key's content hash —
    the quality-weighted soft downsample (keep good documents with high
    probability, bad ones with low) that replaces a hard threshold when
    the pipeline wants a smooth quality→retention curve.

    Same deterministic machinery as ``hash_sample`` at 10⁶-bucket
    resolution: the same row makes the same cut on any cluster, any
    partitioning, any engine, and re-running the pipeline reproduces
    the corpus exactly.  One codegen'd filter over one scan — no
    shuffle, no RNG state.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    return df.filter(hash_bucket(key, buckets) < w * buckets)


def train_test_split(
    df: DataFrame, key: str, test_percent: int = 10, buckets: int = 100
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (train, test) split by content-hash bucket: the same
    row lands on the same side on any cluster, any partitioning, any rerun
    — the property that keeps eval sets leak-free when the corpus is
    rebuilt.  Complementary filters over one scan; no shuffle.  The
    threshold scales with ``buckets`` so ``test_percent`` means the same
    fraction at any bucket granularity."""
    threshold = round(buckets * test_percent / 100.0)
    b = hash_bucket(key, buckets)
    test = df.filter(b < threshold)
    train = df.filter(b >= threshold)
    return train, test


def source_mixture(
    df: DataFrame,
    mixture: dict[str, tuple[int, int]],
    source_col: str = "source",
    key: str = "doc_id",
    buckets: int = 100,
) -> DataFrame:
    """Weighted corpus mixing: per-source deterministic downsampling plus
    integer upsampling — the "data mixture" step that turns raw source
    proportions into training proportions (e.g. keep 40% of common-crawl,
    repeat wikipedia 3x).

    ``mixture`` maps source -> (keep_percent, repeats).  Sources absent
    from the dict are DROPPED — the mixture is the explicit allowlist.
    The keep decision is ``hash_bucket(key) < keep_percent`` (content
    hash, so the same row makes the same cut on any engine or cluster),
    and upsampling is ``explode(sequence(1, repeats))``, emitting an
    ``epoch`` column so downstream shuffles (packing, global sort) spread
    repeats instead of colocating byte-identical rows.

    The per-source rate/repeat lookup compiles to a literal CASE chain
    (the mixture is config, not data), so the whole operator is one scan
    with a codegen'd filter + fan-out: no join, no shuffle, and the
    filter prunes before the explode multiplies."""
    if not mixture:
        raise ValueError("mixture must name at least one source")
    src = F.col(source_col)
    rate = F.lit(None).cast("int")
    reps = F.lit(None).cast("int")
    for name, (keep_percent, repeats) in mixture.items():
        rate = F.when(src == name, F.lit(keep_percent)).otherwise(rate)
        reps = F.when(src == name, F.lit(repeats)).otherwise(reps)
    kept = df.filter(hash_bucket(key, buckets) < rate)
    return kept.withColumn("epoch", F.explode(F.sequence(F.lit(1), reps)))


def group_split(
    df: DataFrame,
    group_col: str,
    test_percent: int = 10,
    buckets: int = 100,
) -> tuple[DataFrame, DataFrame]:
    """Leakage-safe (train, test) split: the hash decision is keyed on a
    GROUP column (source, domain, dedup-cluster id), so every row of a
    group lands on the same side.  This is the split discipline for
    eval-set integrity — near-duplicate documents cluster within groups,
    and a row-keyed split (``train_test_split``) would strand one copy
    in train and its near-twin in test, silently inflating eval scores.

    Same plan shape as the row split: complementary codegen'd filters
    over one scan, no shuffle, no group registry to maintain — the group
    key itself carries the decision."""
    threshold = round(buckets * test_percent / 100.0)
    b = hash_bucket(group_col, buckets)
    test = df.filter(b < threshold)
    train = df.filter(b >= threshold)
    return train, test


def temperature_mixture_weights(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
) -> DataFrame:
    """Temperature-based source sampling weights (the multilingual /
    multi-source mixing rule from mT5/XLM-R: draw from source s with
    probability ∝ n_s^alpha).  ``alpha`` < 1 flattens the mixture toward
    small sources; 1.0 is proportional, 0.0 uniform.

    Output per source: raw count, normalized sampling weight, and the
    per-document inclusion rate (weight / share — >1 means the source
    must be upsampled/repeated to hit its target share).  Plan: one
    groupBy(source) aggregate, then the normalizer joins back via a
    single-row broadcast — the per-source table is config-sized at any
    corpus scale, so this is one shuffle over counts and nothing else.

    Returns (source, n_docs, weight, rate) with weight/rate rounded to 6.
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    totals = counts.agg(
        F.sum(F.pow(F.col("n_docs"), F.lit(alpha))).alias("__z"),
        F.sum("n_docs").alias("__n"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            F.col(source_col),
            F.col("n_docs"),
            F.round(F.pow(F.col("n_docs"), F.lit(alpha)) / F.col("__z"), 6).alias("weight"),
            F.round(
                (F.pow(F.col("n_docs"), F.lit(alpha)) / F.col("__z"))
                / (F.col("n_docs") / F.col("__n")),
                6,
            ).alias("rate"),
        )
    )


def weighted_reservoir_sample(
    df: DataFrame,
    key: str,
    weight: Column | str,
    k: int,
    buckets: int = 1 << 20,
) -> DataFrame:
    """Weighted sample of exactly ``k`` rows WITHOUT replacement
    (Efraimidis & Spirakis 2006, algorithm A-Res): every row draws the
    rank key ``log(u)/w`` — the log of ES's ``u^(1/w)``, same ordering,
    no pow saturation for large weights — with ``u`` a deterministic
    content-hash uniform in (0, 1); the global top-k by that key
    follows the A-Res inclusion rule with ``u`` standing in for the
    random draw (hash-uniform per row, but quantized to ``buckets``
    levels and shared across reruns — reproducibility is the point, at
    the price of being an approximation of a true random draw).  The
    complement of ``weighted_hash_sample``: Bernoulli thinning keeps a
    RATE, this keeps a COUNT — "pick exactly k documents,
    quality-proportional".

    Deterministic end to end (same row, same u, any engine/partitioning
    — rerunning reproduces the sample), and the top-k plans as
    TakeOrderedAndProject: per-partition partial top-k, no global sort.
    ``buckets`` must be a power of two ≤ 2**24: the bucket index is the
    md5 prefix's 24 bits mod ``buckets``, and a power-of-two modulus
    divides 2**24 evenly — a decimal modulus (an earlier revision used
    10**6) makes the low buckets ~6% likelier.  The rank key is
    snapped to the 1e-9 grid before ranking (log/division differ in
    the last ulp across engines) with the raw key as tie-break input:
    ties break by ``key`` asc, keeping the cut total.  Rows with
    non-positive weight are excluded up front (their draw probability
    is zero; leaving them in would put engine-specific inf/NaN handling
    on the ranking path).
    Returns the sampled rows as (key, weight-as-``weight_value``,
    sample_key), sample_key desc by construction.
    """
    if buckets & (buckets - 1) or buckets > 1 << 24:
        raise ValueError("buckets must be a power of two <= 2**24")
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (hash_bucket(key, buckets) + F.lit(0.5)) / F.lit(float(buckets))
    # snap (round + 0.0) rather than bare round: a weight large enough to
    # push log(u)/w inside (-5e-10, 0) would round to -0.0 in DuckDB but
    # +0.0 in Spark, flipping the tie-break order between engines
    es_key = F.round(F.log(u) / w, 9) + F.lit(0.0)
    return (
        df.filter(w > 0)
        .select(
            F.col(key),
            w.cast("double").alias("weight_value"),
            es_key.alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), F.asc(key))
        .limit(k)
    )

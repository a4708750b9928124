"""CDC (change-data-capture) ingestion operators (SURVEY §2.1 S5).

The reference consumes Debezium-formatted Postgres WAL changes from
Kafka (DezbeiumConnetor.py:23-44 configures the connector with the
``ExtractNewRecordState`` unwrap transform; Bronze1.py:86-90 subscribes
to the ``cdc_dbserver1.public.<table>`` topics).  The engine side of
that contract is pure Spark:

- ``unwrap_envelope`` — parse the Debezium JSON envelope
  (op/ts_ms/before/after) against an explicit payload schema and
  project the row image the way ``ExtractNewRecordState`` does:
  ``after`` for creates/updates/reads, ``before`` for deletes, plus
  ``_op``/``_ts_ms`` metadata columns.
- ``latest_state`` — collapse a bounded change log to current table
  state: last writer per key wins, deleted keys drop out.  One shuffle
  (window by key); at scale this is the standard snapshot-from-log
  compaction and benefits from AQE skew handling on hot keys.

Works identically on a batch change log and inside ``foreachBatch`` of
a streaming ingest; for continuous upsert maintenance pair it with a
Delta ``MERGE`` in the sink.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """Debezium envelope around a row payload schema."""
    return T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("before", payload_schema),
            T.StructField("after", payload_schema),
        ]
    )


def unwrap_envelope(
    df: DataFrame, payload_schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """Parse JSON Debezium envelopes and unwrap to row images.

    Returns one row per change with the payload columns flattened plus
    ``_op`` ('c'|'u'|'d'|'r') and ``_ts_ms`` (source change time).
    Malformed JSON yields null payload columns (from_json semantics),
    matching the reference's parse-then-validate flow.
    """
    env = df.select(F.from_json(F.col(value_col), envelope_schema(payload_schema)).alias("env"))
    image: Column = F.when(F.col("env.op") == "d", F.col("env.before")).otherwise(
        F.col("env.after")
    )
    return env.select(
        F.col("env.op").alias("_op"),
        F.col("env.ts_ms").alias("_ts_ms"),
        image.alias("_row"),
    ).select("_op", "_ts_ms", "_row.*")


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    op_col: str = "_op",
    seq_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2: each change becomes a versioned
    row with ``valid_from``/``valid_to`` (null = still current) and an
    ``is_current`` flag; a delete closes the key's history without
    emitting a live row.  One shuffle (window by key, ordered by change
    time) — the standard history-table build from a CDC log.

    ``seq_cols`` break timestamp ties (same-millisecond Debezium ops are
    common); without a unique (ts, *seq) ordering per key the version
    chain is partitioning-dependent."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (seq_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    versioned = changes.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w)
    )
    return versioned.filter(F.col(op_col) != "d").withColumn(
        "is_current", F.col("valid_to").isNull()
    )


def merge_frames(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "_op",
) -> DataFrame:
    """The MERGE INTO core as pure frames (no storage dependency): keep
    target rows whose key has no incoming change (anti-join on the
    change-key set), union the per-key change winners (``latest_state``),
    drop keys whose latest change is a delete — SCD type 1 upsert
    semantics, exactly what Delta's ``MERGE INTO`` executes, expressed
    on any target frame.  ``changes`` must carry the target's columns
    (plus ``op_col`` and the ``seq_cols``); the winner projection maps
    it onto the target schema.

    Scale shape: the only wide work is ``latest_state``'s per-key window
    over the CHANGE BATCH (small by definition) and the anti-join, whose
    build side is the distinct change-key set — AQE broadcasts it when
    the batch is small (the target scan never shuffles) and falls back
    to a shuffle join for backfill-sized batches; no hint is forced for
    exactly that reason (see ``merge_snapshot``)."""
    from realtimechurnpredictiondataengineering_spark.operators.joins import anti_join

    incoming = latest_state(changes, keys, seq_cols, op_col=op_col, drop_deletes=True)
    change_keys = changes.select(*keys).distinct()
    kept = anti_join(target, change_keys, on=keys)
    return kept.unionByName(incoming.select(*target.columns))


def merge_snapshot(
    spark,
    target_path: str,
    changes: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "_op",
) -> DataFrame:
    """Batch MERGE (SCD type 1 upsert) of a change batch into a stored
    snapshot: keep target rows whose key has no incoming change
    (anti-join), union the incoming winners (``latest_state``), drop
    deleted keys.  Returns the new snapshot DataFrame (caller writes it —
    on Delta this is literally ``MERGE INTO``; on parquet it is
    rewrite-on-merge, which is why real deployments put hot tables on
    Delta/Iceberg).  Write the result to a NEW location or via a staging
    dir — Spark cannot overwrite a parquet path a live plan still reads.
    The change-key anti-join is left to AQE: a typical change batch is
    tiny relative to the snapshot and auto-broadcasts (target scan never
    shuffles), but a backfill-sized batch would OOM under a forced
    broadcast hint, so none is given."""
    from realtimechurnpredictiondataengineering_spark.operators.joins import anti_join

    incoming = latest_state(changes, keys, seq_cols, op_col=op_col, drop_deletes=True)
    try:
        target = spark.read.parquet(target_path)
    except AnalysisException as exc:
        # classify by error class, not message substring — a wrapped error
        # mentioning some OTHER missing path must not silently bootstrap
        condition = (
            exc.getCondition() if hasattr(exc, "getCondition") else exc.getErrorClass()
        )
        if condition != "PATH_NOT_FOUND":
            raise
        return incoming  # first run: the change batch IS the snapshot
    change_keys = changes.select(*keys).distinct()
    kept = anti_join(target, change_keys, on=keys)
    return kept.unionByName(incoming.select(*target.columns))


def latest_state(
    changes: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "_op",
    drop_deletes: bool = True,
) -> DataFrame:
    """Current-state snapshot of a change log: per key, keep the row with
    the highest ``seq_cols`` (change time, then a unique tiebreaker so the
    winner is deterministic); keys whose latest change is a delete are
    removed when ``drop_deletes``."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in seq_cols])
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if drop_deletes:
        latest = latest.filter(F.col(op_col) != "d")
    return latest


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    keys: list[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time enrichment against an SCD2 dimension: each fact row
    joins the version whose validity interval contains its timestamp
    (``valid_from <= ts < valid_to``, open ``valid_to`` = still current).

    A plain equi-join on the natural key plus the interval as a residual
    predicate — per-key version intervals are disjoint by construction
    (``scd2_history``), so each fact matches at most one version and the
    join never amplifies rows.  One shuffle on the key, same as any
    fact-dim join; no range-join machinery needed because the key is an
    equi prefix.  A fact in a gap (after a delete closed the key's
    history) matches nothing — deleted entities do not resurrect; inner
    semantics by design (a left variant would need the interval inside
    the join condition, not a post-join filter that eats null rows)."""
    in_interval = (F.col(fact_ts) >= F.col(valid_from)) & (
        F.col(valid_to).isNull() | (F.col(fact_ts) < F.col(valid_to))
    )
    return facts.join(history, on=keys, how="inner").filter(in_interval)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Reconcile two table snapshots into per-key change rows:
    ``added`` (key only in new), ``removed`` (key only in old),
    ``changed`` (key in both, any compare column differs).  Unchanged
    keys are dropped.

    One full-outer join on the key — ``eqNullSafe`` everywhere (join
    condition AND value compare), so null keys pair up instead of
    splitting into phantom added+removed rows and null-vs-null values
    don't report phantom changes.  Row presence comes from explicit
    marker columns, not key nullness, for the same reason.  This is the
    audit half of CDC: where ``merge_snapshot`` applies a change log,
    ``snapshot_diff`` recovers one from two states."""
    o = old.select(*keys, *compare_cols).withColumn("_o_present", F.lit(True))
    n = new.select(*keys, *compare_cols).withColumn("_n_present", F.lit(True))
    for c in keys + compare_cols:
        o = o.withColumnRenamed(c, f"_o_{c}")
        n = n.withColumnRenamed(c, f"_n_{c}")
    cond = [F.col(f"_o_{k}").eqNullSafe(F.col(f"_n_{k}")) for k in keys]
    joined = o.join(n, cond, "full_outer")
    in_old = F.col("_o_present").isNotNull()
    in_new = F.col("_n_present").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    key_cols = [
        F.coalesce(F.col(f"_n_{k}"), F.col(f"_o_{k}")).alias(k) for k in keys
    ]
    return joined.withColumn("change_type", change).filter(
        F.col("change_type").isNotNull()
    ).select(*key_cols, "change_type")

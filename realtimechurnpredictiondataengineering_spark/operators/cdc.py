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

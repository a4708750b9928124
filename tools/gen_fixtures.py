"""Materialize the synthetic topic feed once to a committed parquet
fixture, so the sv01-sv04 Silver validation chains get a DuckDB-readable
input and graduate from rows-only to value-checked twins.

The feed itself is deterministic (seeded xxhash64 arithmetic,
sources/generator.py), but the ORACLE cannot replay Spark's xxhash64 —
materializing the wire frames is what makes both engines read identical
bytes.  Run from the repo root; writes fixtures/topic_feed.parquet as a
single sorted file (stable bytes → clean git diffs):

    PYTHONPATH=. python tools/gen_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from realtimechurnpredictiondataengineering_spark.session import get_spark
from realtimechurnpredictiondataengineering_spark.sources.generator import (
    synthetic_topic_feed,
    synthetic_transaction_collisions,
)

N_PER_TOPIC = 2000
# sf dir the gold-features scoring fixture snapshots (ml02's stream input)
FEATURES_SF_DIR = os.environ.get("SPARK_GRAFT_FIXTURE_SF", "/root/testdata/sf0.01")
# planted (customer_id, event_time) duplicate-key rows on the
# transaction topic, so sv02's deterministic-dedup survivor choice is
# LIVE in the value check (round-7 verdict, Missing #3)
N_COLLISIONS = 200
MIN_COLLISION_GROUPS = 150
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def write_gold_features(spark) -> None:
    """Snapshot the sf0.01 Gold feature frame (customer_id + the model's
    FEATURES, NULLs preserved — the coalesce defaults are the SCORER's
    contract, so the fixture must exercise them) to a committed parquet
    the ml02 streaming-scoring entry streams and the DuckDB oracle
    replays.  Stays in Arrow end-to-end after the Spark write so NULL
    cells survive as nulls (a pandas round trip would turn them into
    NaN, which neither engine's coalesce replaces)."""
    import shutil
    import tempfile

    from realtimechurnpredictiondataengineering_spark.ml import FEATURES
    from realtimechurnpredictiondataengineering_spark.plans.gold import churn_features

    feats = churn_features(spark, FEATURES_SF_DIR).select("customer_id", *FEATURES)
    tmp = tempfile.mkdtemp(prefix="gold_features_")
    try:
        feats.coalesce(1).write.mode("overwrite").parquet(tmp)
        tab = pq.read_table(tmp).sort_by([("customer_id", "ascending")])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # a DIRECTORY fixture (one stable file inside): the file streaming
    # source needs a directory base path, and a real feature feed lands
    # as a directory of files anyway
    out_dir = os.path.join(OUT, "gold_features")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "data.parquet")
    pq.write_table(tab, path, compression="zstd")
    print(f"wrote {tab.num_rows} feature rows -> {path}")


def main() -> None:
    spark = get_spark()
    write_gold_features(spark)
    feed = synthetic_topic_feed(spark, N_PER_TOPIC, seed="42")
    dup = synthetic_transaction_collisions(spark, N_COLLISIONS, N_PER_TOPIC, seed="42")
    dup_wire = dup.select(
        F.to_json(F.struct(*[F.col(c) for c in dup.columns])).alias("value"),
        F.lit("churn_transactions").alias("topic"),
    )
    pdf = feed.unionByName(dup_wire).toPandas()
    # total order (topic, value) so the file bytes are reproducible
    pdf = pdf.sort_values(["topic", "value"]).reset_index(drop=True)

    # the fixture must not silently regenerate collision-free: count the
    # duplicate (customer_id, event_time) groups the planted rows create
    tx = pdf[pdf["topic"] == "churn_transactions"]["value"].apply(
        lambda v: __import__("json").loads(v)
    )
    keys = tx.apply(lambda d: (d["customer_id"], d["event_time"]))
    n_groups = int((keys.value_counts() > 1).sum())
    assert n_groups >= MIN_COLLISION_GROUPS, (
        f"only {n_groups} duplicate-key groups on churn_transactions; "
        f"expected >= {MIN_COLLISION_GROUPS}"
    )

    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "topic_feed.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), path, compression="zstd"
    )
    print(f"wrote {len(pdf)} rows ({n_groups} planted dup-key groups) -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()

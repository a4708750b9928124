"""Batch sources (SURVEY §2.1 S3) over the driver's parquet star schema.

The reference loads Delta snapshots for Gold (`Gold1.py:51-58`); here the
same role is a parquet scan. Scans stay declarative so Catalyst pushes
filters and prunes columns into the reader — callers must NOT ``select *``
then drop columns driver-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver's table inventory (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Lazy parquet scan of one table; pushdown/pruning handled by Catalyst."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, *names: str) -> dict[str, DataFrame]:
    """Load several tables as a dict (all lazy)."""
    use = names or TABLES
    return {n: load_table(spark, n, sf_dir) for n in use}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works alongside
    the DataFrame API (one logical plan either way)."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


def delta_scan(spark: SparkSession, path: str) -> DataFrame:
    """Delta batch scan (S3). Falls back to parquet when the Delta jars are
    absent (this container); on a cluster with delta-spark this reads the
    transaction log properly."""
    try:
        return spark.read.format("delta").load(path)
    except Exception:
        return spark.read.parquet(path)

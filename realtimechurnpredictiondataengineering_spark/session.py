"""SparkSession construction with scale-aware defaults.

The reference pins tiny-local settings (``local[2]``, 2 shuffle partitions,
AQE off in Bronze — Bronze1.py:79-84, Silver1.py:7-11, Gold1.py:11-13).
This engine instead ships cluster-sane defaults and exposes the same knobs
(SURVEY §2.8 ST7): AQE on (runtime re-plan + skew-join + partition
coalescing), UTC session timezone (deterministic timestamp semantics and
DuckDB-oracle parity), Arrow enabled for the pandas boundary (K6).

On a real cluster none of the local-mode bits apply: the builder only sets
``master`` when none is configured, so ``spark-submit --master yarn/k8s``
wins.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Config that is correct at every scale (local[32] test box or a
# 1000-executor cluster). Anything sized to the local box stays out of
# this dict and is derived at build time.
ENGINE_CONF: dict[str, str] = {
    # Runtime re-planning: coalesce post-shuffle partitions, convert
    # sort-merge joins to broadcast when a side turns out small, split
    # skewed partitions. The single most important 100-TB knob.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamps (and DuckDB naive-UTC oracle parity).
    "spark.sql.session.timeZone": "UTC",
    # Parquet TIMESTAMP(NANOS) columns (driver testdata `events.ts`) are
    # unreadable by Spark natively; read as long, converted in
    # sources.batch.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for toPandas()/pandas_udf — the sanctioned Python boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Scans: respect parquet column pruning + predicate pushdown defaults;
    # cap per-task input so 100-TB scans parallelize (default 128m kept).
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast threshold: 64 MiB — dimension tables (region/nation/
    # customer-agg side) broadcast instead of shuffling the fact table.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Cap the plan strings Spark renders for UI/listener events.  With
    # AQE on, EVERY adaptive stage materialization re-prints the whole
    # plan (AdaptiveSparkPlanExec.onUpdatePlan -> explainString), and
    # iterative queries whose persisted stages nest via
    # InMemoryRelation.innerChildren render multi-MB trees dozens of
    # times per query — driver thread dumps during cc10_hits showed
    # ~11 s/run of driver CPU inside TreeNode.generateTreeString
    # (optimization guide §7.3).  64 KiB keeps the UI prefix useful;
    # plan-dump tooling raises this per-session (it is runtime-settable)
    # when a full tree is actually wanted.
    "spark.sql.maxPlanStringLength": str(64 * 1024),
    # canChangeCachedPlanOutputPartitioning was set true in r14 on the
    # theory that cached frames pinned tiny 96-way partitionings; the
    # r15 evidence pass could not reproduce any benefit (staged-table
    # consumer suite: 9.02/9.16 s with it on vs 8.91/8.84 s off at
    # sf0.1; consumer plans byte-identical) — reverted to the Spark
    # default (false) per the evidence-or-revert rule.
    # Streaming: state store kept small + RocksDB would be used on a real
    # cluster; local default store is fine for tests.
    "spark.sql.streaming.stateStore.stateSchemaCheck": "true",
}


def _master_configured() -> bool:
    """True when a master is already set by the deployment — via
    ``spark-submit --master`` (which sets the ``spark.master`` system
    property / SparkConf, NOT an env var) or the ``SPARK_MASTER`` env.
    Only when neither is present do we default to local[N]."""
    if "SPARK_MASTER" in os.environ:
        return True
    try:
        from pyspark import SparkConf

        return SparkConf().contains("spark.master")
    except Exception:  # pragma: no cover - SparkConf probe is best-effort
        return False


def _driver_memory_configured() -> bool:
    """True when the deployment already sized the driver heap — via
    ``spark-submit --driver-memory`` / ``spark.driver.memory`` (system
    property or SparkConf) or the ``SPARK_DRIVER_MEMORY`` env var that
    spark-submit consults."""
    if "SPARK_DRIVER_MEMORY" in os.environ:
        return True
    try:
        from pyspark import SparkConf

        return SparkConf().contains("spark.driver.memory")
    except Exception:  # pragma: no cover - SparkConf probe is best-effort
        return False


def _local_driver_memory() -> str:
    """Heap size for a self-launched local[N] session: a quarter of
    physical RAM, capped at 16 GiB, floored at 2 GiB.

    Without this, a local session runs on Spark's 1 GiB default — and in
    local mode that one JVM heap IS the executor memory for every
    concurrent task, the broadcast store, and the block-manager cache.
    Measured on the 32-core bench box: the full headline suite under the
    1 GiB default GC-throttles throughout and finally dies with
    ``java.lang.OutOfMemoryError: Java heap space`` near suite end
    (round-14 run: cc09/cc10 lost to the context shutdown), while the
    same suite under a right-sized heap runs clean (optimization guide
    §5: size memory to the workload, not the default).  Overridable via
    ``SPARK_GRAFT_DRIVER_MEM``; never applied when the deployment
    configures the driver itself (`_driver_memory_configured`)."""
    override = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if override:
        return override
    try:
        total = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError):  # pragma: no cover - non-POSIX fallback
        total = 8 * 1024**3
    gib = max(2, min(16, int(total / 4 / 1024**3)))
    return f"{gib}g"


def session_builder(
    app_name: str = "realtimechurnpredictiondataengineering-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession.Builder:
    """Return a configured builder; caller may still override anything."""
    builder = SparkSession.builder.appName(app_name)
    if master is None and not _master_configured():
        cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
        # We own the deployment (self-launched local JVM): size its heap.
        # On a real cluster master/driver memory come from spark-submit
        # and this branch never runs.
        if not _driver_memory_configured():
            builder = builder.config(
                "spark.driver.memory", _local_driver_memory()
            )
    conf = dict(ENGINE_CONF)
    # With AQE on, start shuffle.partitions at ~3x cores locally and let
    # coalescing shrink; on a cluster this should be ~2-3x total cores and
    # is expected to be overridden by the deployment.
    if shuffle_partitions is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
        shuffle_partitions = 3 * cpus
    conf["spark.sql.shuffle.partitions"] = str(max(shuffle_partitions, 4))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder


def get_spark(**kwargs) -> SparkSession:
    """Build (or fetch the active) engine session."""
    spark = session_builder(**kwargs).getOrCreate()
    tune_runtime(spark)
    return spark


def stream_state_partitions(spark: SparkSession) -> int:
    """Partition width for STATEFUL STREAMING queries: the session's
    default parallelism, or ``SPARK_GRAFT_STREAM_STATE_PARTITIONS``.

    Batch queries start at ~3× cores and let AQE coalesce post-shuffle
    partitions to the data; streaming state gets NO such correction —
    AQE does not run on streaming plans, and the width is pinned into
    the checkpoint at first batch.  Inheriting the batch-oriented 3×
    width therefore buys nothing (no coalescing will ever shrink it)
    and costs a fixed per-partition state-store overhead every
    micro-batch: measured on ll17_streaming_warc_ingest at sf0.1, 96
    state partitions ran 6-16 s where 8 ran 3.1 s, the cost scaling
    with the partition count, not the data.  Cores (= what can run
    concurrently) is the right default at every scale; deployments
    with state too large per core override via the env knob."""
    override = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS")
    if override:
        try:
            return max(int(override), 1)
        except ValueError as exc:
            raise ValueError(
                "SPARK_GRAFT_STREAM_STATE_PARTITIONS must be an integer, "
                f"got {override!r}"
            ) from exc
    return max(spark.sparkContext.defaultParallelism, 1)


class scoped_stream_width:
    """Context manager pinning ``spark.sql.shuffle.partitions`` to
    :func:`stream_state_partitions` around a streaming query's start +
    drain, restoring the batch width afterwards.  The conf is read at
    query start and written into the checkpoint, so the scope must
    cover ``start()`` through ``awaitTermination()``."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.saved = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set(
            "spark.sql.shuffle.partitions", str(stream_state_partitions(self.spark))
        )
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.saved)
        return False


def tune_runtime(spark: SparkSession) -> None:
    """Apply runtime-settable engine conf to an externally-built session.

    The driver hands our query functions its own SparkSession; these are
    the settings correctness depends on (timezone for oracle parity,
    Arrow for pandas ops), all runtime-mutable.
    """
    for key, value in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf may be static in some deployments
            pass

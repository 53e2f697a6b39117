"""SparkSession factory tuned for the engine's workload.

Defaults target correctness tests on local[N]; every knob is the one we
would also set on a real 1000-executor cluster (AQE, skew-join handling,
sane shuffle partitioning, Arrow for the few pandas-UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "grafink-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    AQE is enabled so runtime statistics re-plan shuffles: partition
    coalescing keeps small-SF tests fast while skew-join splitting is what
    protects the similarity self-join at 100 TB (hot objectIds).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # env-level reliable-checkpoint opt-in (see util.pin): handy for
    # bench/CI runs where no config file is in play
    ck = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ck:
        builder = builder.config("spark.grafink.checkpointDir", ck)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_runtime_conf(spark: SparkSession, conf: dict[str, str] | None) -> None:
    """Re-apply config-file Spark conf to a LIVE session.

    ``getOrCreate`` silently ignores builder conf when it reuses an
    existing session, so the CLI applies the config file's ``spark``
    block both ways: at build (fresh JVM — static conf applies) and
    here at runtime (reused session — runtime-settable keys like
    ``spark.grafink.*`` still take effect; static keys are skipped)."""
    for k, v in (conf or {}).items():
        try:
            spark.conf.set(k, str(v))
        except Exception:
            pass  # static conf on a live session: applied at build or not at all

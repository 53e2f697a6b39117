"""Small plan-shaping utilities shared across operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan currently has fewer
    partitions than requested (default: cluster parallelism).

    Heavy per-row operators (MinHash, SimHash, media kernels) are
    CPU-bound, so a small input file that Spark scans as 1–2 tasks
    would serialize the whole computation; one cheap shuffle of the raw
    input buys full-cluster parallelism. At real scale inputs already
    have thousands of partitions and this is a no-op (the partition
    count is read from the physical plan, nothing is executed).
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

"""Table maintenance: small-file compaction for parquet directories.

Streaming sinks (foreachBatch appends, availableNow microbatches) and
high-parallelism writes leave many small files; at 100 TB the scan cost
of a table is dominated by file-open overhead and footer reads once
files fall well under the 128 MB scan-split size. Compaction rewrites a
directory into ≈ target-sized files and swaps it atomically via the
Hadoop FileSystem API (works on local, hdfs://, s3a:// — same contract
as graph/storage's table swap).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession

from grafink_spark import fsutil


@dataclass
class CompactionStats:
    files_before: int
    files_after: int
    bytes_total: int


def _leaf_files(spark: SparkSession, path: str) -> list:
    fs, p, _ = fsutil._fs_and_path(spark, path)
    it = fs.listFiles(p, True)
    out = []
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            out.append(st)
    return out


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_cols: list[str] | None = None,
) -> CompactionStats:
    """Rewrite ``path`` (a parquet dir) into ``ceil(bytes/target)``
    files and atomically swap it in place. With ``partition_cols`` the
    hive layout is preserved (repartition on the partition columns so
    each output task writes one file per partition it owns).

    The swap is delete-then-rename of the directory — readers racing
    the swap should retry (same caveat as the graph store's swap; a
    real lakehouse table format would use a manifest commit instead).
    """
    before = _leaf_files(spark, path)
    total = sum(st.getLen() for st in before)
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    if partition_cols:
        (
            df.repartition(max(n, 1), *partition_cols)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(tmp)
        )
    else:
        df.repartition(n).write.mode("overwrite").parquet(tmp)
    fsutil.swap(spark, tmp, path)
    after = _leaf_files(spark, path)
    return CompactionStats(
        files_before=len(before),
        files_after=len(after),
        bytes_total=total,
    )


def file_clustering_stats(
    spark, path: str, col: str
):
    """Clustering health of a parquet layout for one column: per-file
    (min, max, rows) plus how many OTHER files each file's value range
    overlaps — the metric behind choosing/validating a sort, Z-order,
    or Hilbert layout (avg_overlap ≈ 0 → file pruning answers range
    predicates with ~1 file; ≈ n_files → the layout does nothing for
    this column). Returns a 1-row DataFrame
    (n_files, avg_overlap, max_overlap).

    Cost: one footer-cheap scan aggregated per input file (min/max/
    count partial-aggregate map-side), then an n_files²-sized range
    self-join — file counts are small even at 100 TB (thousands), so
    the pairwise step is trivial next to the scan."""
    from pyspark.sql import functions as F

    per_file = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("_f"), F.col(col).alias("_v"))
        .groupBy("_f")
        .agg(
            F.min("_v").alias("_lo"),
            F.max("_v").alias("_hi"),
            F.count(F.lit(1)).alias("_rows"),
        )
    )
    a = per_file.select(
        F.col("_f").alias("_fa"), F.col("_lo").alias("_la"), F.col("_hi").alias("_ha")
    )
    b = per_file.select(
        F.col("_f").alias("_fb"), F.col("_lo").alias("_lb"), F.col("_hi").alias("_hb")
    )
    overlaps = (
        a.crossJoin(b)
        .where(
            (F.col("_fa") != F.col("_fb"))
            & (F.col("_la") <= F.col("_hb"))
            & (F.col("_lb") <= F.col("_ha"))
        )
        .groupBy("_fa")
        .agg(F.count(F.lit(1)).alias("_n_overlap"))
    )
    joined = per_file.join(
        overlaps, per_file["_f"] == overlaps["_fa"], "left"
    ).select(F.coalesce(F.col("_n_overlap"), F.lit(0)).alias("_n"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.round(F.avg("_n"), 3).alias("avg_overlap"),
        F.max("_n").alias("max_overlap"),
    )

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
    sort_by: list[str] | None = None,
) -> CompactionStats:
    """Rewrite ``path`` (a parquet dir) into ``ceil(bytes/target)``
    files and atomically swap it in place. With ``partition_cols`` the
    hive layout is preserved (repartition on the partition columns so
    each output task writes one file per partition it owns).

    ``sort_by`` makes the compaction CLUSTERING-AWARE: rows are
    range-repartitioned + locally sorted on those columns, so each
    output file owns a disjoint value range and min/max file pruning
    answers range predicates with ~1 file (validate with
    :func:`file_clustering_stats` — avg_overlap drops to ~0). This is
    the linear-key sibling of the Z-order/Hilbert layouts: same scan,
    same write volume as a plain compaction, one range-exchange
    instead of a round-robin one.

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
    elif sort_by:
        (
            df.repartitionByRange(n, *sort_by)
            .sortWithinPartitions(*sort_by)
            .write.mode("overwrite")
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
    count partial-aggregate map-side), then an O(n log n) sweep over
    the 2·n_files interval endpoints — NO pairwise join. For file a,
    overlap(a) = n − #{b: hi_b < lo_a} − #{b: lo_b > hi_a} − 1 (the
    "entirely before" and "entirely after" sets are disjoint), and both
    counts fall out of one ordered cumulative sum each over the merged
    endpoint stream. At ~10⁶ files of a 100 TB table that's two single-
    column sorts of 2M tiny rows instead of 10¹² range comparisons."""
    from pyspark.sql import Window
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
    # Files whose column is all-NULL have a NULL range: they overlap
    # nothing (NULL comparisons are false) but still count as files.
    valid = per_file.where(F.col("_lo").isNotNull())
    null_files = per_file.where(F.col("_lo").isNull()).select(
        F.col("_f"), F.lit(0).cast("long").alias("_n")
    )

    # Sweep 1 — before(a) = #{b: hi_b < lo_a}: merge hi endpoints with
    # lo probes, order ascending with probes FIRST on ties so an equal
    # hi (which overlaps) is not counted, and take the running hi-count.
    hi_ev = valid.select(
        F.lit(None).cast("string").alias("_f"),
        F.col("_hi").alias("_val"),
        F.lit(1).alias("_is_end"),
    )
    lo_probe = valid.select(
        F.col("_f"), F.col("_lo").alias("_val"), F.lit(0).alias("_is_end")
    )
    w_asc = Window.orderBy(F.col("_val").asc(), F.col("_is_end").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    before = (
        hi_ev.unionByName(lo_probe)
        .withColumn("_before", F.sum("_is_end").over(w_asc))
        .where(F.col("_is_end") == 0)
        .select("_f", "_before")
    )

    # Sweep 2 — after(a) = #{b: lo_b > hi_a}: same stream mirrored, lo
    # endpoints descending with probes first on ties.
    lo_ev = valid.select(
        F.lit(None).cast("string").alias("_f"),
        F.col("_lo").alias("_val"),
        F.lit(1).alias("_is_end"),
    )
    hi_probe = valid.select(
        F.col("_f"), F.col("_hi").alias("_val"), F.lit(0).alias("_is_end")
    )
    w_desc = Window.orderBy(F.col("_val").desc(), F.col("_is_end").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    after = (
        lo_ev.unionByName(hi_probe)
        .withColumn("_after", F.sum("_is_end").over(w_desc))
        .where(F.col("_is_end") == 0)
        .select(F.col("_f").alias("_f2"), "_after")
    )

    n_valid = valid.agg(F.count(F.lit(1)).alias("_n_valid"))
    per_overlap = (
        before.join(after, before["_f"] == after["_f2"])
        .crossJoin(F.broadcast(n_valid))
        .select(
            "_f",
            (F.col("_n_valid") - F.col("_before") - F.col("_after") - 1)
            .cast("long")
            .alias("_n"),
        )
        .unionByName(null_files)
    )
    return per_overlap.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.round(F.avg("_n"), 3).alias("avg_overlap"),
        F.max("_n").alias("max_overlap"),
    )

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

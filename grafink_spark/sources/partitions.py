"""Partition path management.

Reference: common/src/main/scala/com/astrolabsoftware/grafink/common/
PartitionManager.scala:57-161 — enumerate `base/year=Y/month=M/day=D`
directories for a (startdate, duration) window, drop the ones that do not
exist (with a warning), and raise NoDataException when nothing is left.

At 100 TB the explicit path list is exactly what we want: Spark never
lists or footers-reads partitions outside the window. The padded layout
(`month=02`) matches the reference's PaddedPartitionManager; the unpadded
variant exists for the delete path. For non-directory-partitioned inputs
`partition_filter()` gives the equivalent pushed-down column predicate.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from datetime import date, timedelta

from pyspark.sql import Column
from pyspark.sql import functions as F

from grafink_spark.errors import NoDataException

log = logging.getLogger(__name__)

PARTITION_COLUMNS = ["year", "month", "day"]  # PartitionManager.scala:147


@dataclass
class PartitionManager:
    """Enumerates per-day partition dirs for startdate + duration days.

    padded=True → zero-padded month/day (PaddedPartitionManager,
    PartitionManager.scala:122-138); duration is validated 1..7 by the CLI
    (CLParser.scala:66-69) but not here — library callers may scan more.
    """

    start_date: date
    duration: int = 1
    padded: bool = True

    def days(self) -> list[date]:
        return [self.start_date + timedelta(days=i) for i in range(self.duration)]

    def partition_paths(self, base_path: str) -> list[str]:
        """All candidate day-dir paths (existence not checked)."""
        out = []
        for d in self.days():
            if self.padded:
                out.append(
                    f"{base_path}/year={d.year}/month={d.month:02d}/day={d.day:02d}"
                )
            else:
                out.append(f"{base_path}/year={d.year}/month={d.month}/day={d.day}")
        return out

    def valid_partition_paths(self, base_path: str) -> list[str]:
        """Existing day dirs; raises NoDataException if none exist
        (PartitionManager.scala:57-90 + Reader.scala:58-64)."""
        valid = []
        for d in self.days():
            padded = f"{base_path}/year={d.year}/month={d.month:02d}/day={d.day:02d}"
            unpadded = f"{base_path}/year={d.year}/month={d.month}/day={d.day}"
            # the reference has separate padded/unpadded managers; we accept
            # either layout (Spark's partitionBy writes unpadded values)
            candidates = [padded, unpadded] if self.padded else [unpadded, padded]
            hit = next((p for p in candidates if _path_exists(p)), None)
            if hit is not None:
                valid.append(hit)
            else:
                log.warning("partition path does not exist, skipping: %s", candidates[0])
        if not valid:
            raise NoDataException(
                f"no valid partition paths under {base_path} for "
                f"{self.start_date} +{self.duration}d"
            )
        return valid

    def partition_filter(self) -> Column:
        """Equivalent pushed-down predicate on (year, month, day) partition
        columns — lets Catalyst prune instead of hand-listing paths."""
        cond = F.lit(False)
        for d in self.days():
            cond = cond | (
                (F.col("year") == d.year)
                & (F.col("month") == d.month)
                & (F.col("day") == d.day)
            )
        return cond

    def delete_partitions(self, base_path: str) -> list[str]:
        """Remove day dirs for the window (PartitionManager.scala:100-112,
        delete mode with clearOnDelete). Returns removed paths.

        Routed through the Hadoop FileSystem API (ADVICE r1) so
        clearOnDelete works on hdfs:// / s3a:// URIs, not just the
        local filesystem; falls back to shutil only for local paths
        with no active SparkSession."""
        spark = _active_session()
        removed = []
        if spark is not None:
            from grafink_spark import fsutil

            for p in self.partition_paths(base_path):
                if fsutil.delete(spark, p):
                    removed.append(p)
            # prune now-empty month/year parents, like FS delete of a subtree
            for p in removed:
                parent = os.path.dirname(p)
                while parent != base_path and fsutil.exists(spark, parent):
                    fs, jp, _ = fsutil._fs_and_path(spark, parent)
                    if fs.listStatus(jp):
                        break
                    fs.delete(jp, False)
                    parent = os.path.dirname(parent)
            return removed
        if "://" in base_path:
            raise NoDataException(
                f"cannot delete remote partitions without an active "
                f"SparkSession: {base_path}"
            )
        import shutil

        for p in self.partition_paths(base_path):
            if os.path.isdir(p):
                shutil.rmtree(p)
                removed.append(p)
        for p in removed:
            parent = os.path.dirname(p)
            while parent != base_path and os.path.isdir(parent) and not os.listdir(
                parent
            ):
                os.rmdir(parent)
                parent = os.path.dirname(parent)
        return removed


def _active_session():
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession()


def _path_exists(path: str) -> bool:
    """Partition-existence check. Local paths use os (no JVM
    round-trip); remote URIs go through the Hadoop FileSystem API of
    the active session (previously assumed-to-exist, which pushed the
    failure into an opaque Spark read error)."""
    if "://" in path:  # e.g. hdfs:// s3a://
        spark = _active_session()
        if spark is None:
            return True  # no session to ask — let Spark's read fail loudly
        from grafink_spark import fsutil

        return fsutil.exists(spark, path)
    return os.path.isdir(path) or os.path.isfile(path)

"""Partitioned input reader.

Reference: core/src/main/scala/com/astrolabsoftware/grafink/services/reader/
Reader.scala:52-99 — load an explicit list of day-partition dirs with
`basePath` set (so year/month/day survive as columns), then:

1. ``keepCols``        — column pruning (Reader.scala:78-79)
2. ``keepColsRenamed`` — nested-field flatten/rename, e.g.
   ``candidate.jd → jd`` (Reader.scala:80,86)
3. ``newCols``         — arbitrary SQL scalar expressions, e.g.
   ``objectId || '_' || jd AS rowkey`` (Reader.scala:82-95)

All three stay inside one Catalyst projection, so parquet sees a pruned
ReadSchema and partition pruning happens at file listing time — this is
the whole input-side scale story: at 100 TB we read only the requested
days and only the requested columns.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grafink_spark.config import ReaderConfig
from grafink_spark.sources.partitions import PARTITION_COLUMNS, PartitionManager


@dataclass
class Reader:
    spark: SparkSession
    config: ReaderConfig

    def read(self, pm: PartitionManager) -> DataFrame:
        """Raw read of the valid day dirs, keeping partition columns
        (Reader.scala:66-70)."""
        paths = pm.valid_partition_paths(self.config.basePath)
        reader = self.spark.read.option("basePath", self.config.basePath)
        fmt = self.config.format.lower()
        if fmt == "csv":
            reader = reader.option("header", "true").option("inferSchema", "true")
        if self.config.mergeSchema and fmt in ("parquet", "orc"):
            # alert schemas evolve (new science columns appear); with
            # merge on, old days surface the new columns as null — the
            # footer union costs one extra listing pass, data reads are
            # unchanged
            reader = reader.option("mergeSchema", "true")
        return reader.format(fmt).load(paths)

    def read_and_process(self, pm: PartitionManager) -> DataFrame:
        """read → prune → flatten/rename → derived SQL columns
        (Reader.scala:75-99)."""
        return self.process(self.read(pm))

    def process(self, df: DataFrame) -> DataFrame:
        cfg = self.config
        cols = list(cfg.keepCols)
        if cols:
            # partition columns always survive pruning (Reader.scala:97)
            cols += [c for c in PARTITION_COLUMNS if c in df.columns]
            projection = [F.col(c) for c in cols]
        else:
            cols = list(df.columns)
            projection = [F.col(c) for c in df.columns]
        for rc in cfg.keepColsRenamed:
            projection.append(F.col(rc.f).alias(rc.t))
            cols.append(rc.t)
        df = df.select(*projection)
        if cfg.newCols:
            # selectExpr gives the full Spark SQL scalar surface, same as
            # the reference's temp-view + SELECT trick (Reader.scala:82-95)
            df = df.selectExpr(
                *cols, *[f"{nc.expr} AS {nc.name}" for nc in cfg.newCols]
            )
        return df

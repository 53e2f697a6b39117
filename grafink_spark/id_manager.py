"""Consecutive vertex-id assignment + parquet-backed id store.

Reference semantics (services/IDManagerSparkService.scala:85-141 and
org/apache/spark/sql/SparkExtensions.scala:36-55):

- ids are dense Longs, **consecutive**, starting at ``offset + 1`` where
  offset = max(id) over previously ingested data, seeded with
  ``reservedIdSpace`` when the store is empty (ids 1..N are reserved for
  fixed vertices). Asserted by IDManagerSparkServiceSpec.scala:75-90
  (5 rows, reserved=7 → ids {8..12}).

The reference drops to InternalRow surgery + RDD.zipWithIndex to avoid
row ser/de. In PySpark an RDD round-trip would pickle every row through
Python — instead we keep the whole thing as one Catalyst plan:

1. ``spark_partition_id()`` tags rows,
2. ``row_number()`` over a *per-partition* window gives local positions
   (sorts only within partitions — no global shuffle),
3. per-partition counts (a tiny aggregate, rows = #partitions) get
   cumulative offsets via a single-partition window and are broadcast
   back.

Cost at scale: one narrow pass + one broadcast hash join; no driver
collect of data, no Python serialization, no single-partition global
sort. ``ordered=True`` adds a repartitionByRange so ids follow a key
order deterministically (used by tests/oracles; same mechanics).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from grafink_spark.config import IDManagerConfig
from grafink_spark.sources.partitions import PARTITION_COLUMNS, PartitionManager

_PID = "__gs_pid"
_RN = "__gs_rn"
_OFF = "__gs_off"


def zip_with_index(
    df: DataFrame,
    offset: int = 0,
    id_col: str = "id",
    order_by: list[str] | None = None,
) -> DataFrame:
    """Assign consecutive Long ids offset+1 .. offset+count.

    order_by=None: ids follow Spark's current partition layout (fastest —
    no shuffle beyond what the input already has; matches the reference's
    zipWithIndex). order_by=[cols]: globally deterministic id order via
    range repartition + local sort (adds one shuffle).
    """
    original_cols = df.columns
    if order_by:
        df = df.repartitionByRange(*[F.col(c) for c in order_by])
        local_order = [F.col(c) for c in order_by]
    else:
        local_order = [F.monotonically_increasing_id()]

    tagged = df.withColumn(_PID, F.spark_partition_id())
    # tiny: one row per partition → cumulative offset via 1-partition window
    counts = tagged.groupBy(_PID).agg(F.count(F.lit(1)).alias("_c"))
    cum = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID, F.coalesce(F.sum("_c").over(cum), F.lit(0)).alias(_OFF)
    )
    local = Window.partitionBy(_PID).orderBy(*local_order)
    out = (
        tagged.withColumn(_RN, F.row_number().over(local))
        .join(F.broadcast(offsets), _PID)
        .withColumn(
            id_col,
            (F.col(_OFF) + F.col(_RN) + F.lit(offset)).cast(T.LongType()),
        )
        .select(id_col, *original_cols)  # id first (IDManagerSparkService.scala:116)
    )
    return out


@dataclass
class IDManager:
    """Parquet id store: previously ingested rows with ids ("loaded"),
    appended each run with the current batch (IDManagerSparkService.scala:88-141)."""

    spark: SparkSession
    config: IDManagerConfig

    def read_all(self, schema: T.StructType) -> DataFrame:
        """Full store scan; missing path → empty DF with ``id`` prepended
        to the batch schema (IDManagerSparkService.scala:88-100)."""
        import os

        path = self.config.dataPath
        # existence pre-check avoids a noisy JVM AnalysisException stack
        # trace on every first run; remote URIs still go the try/except way
        exists = True if "://" in path else os.path.exists(path)
        if exists:
            try:
                return self.spark.read.parquet(path)
            except Exception:
                pass
        full = T.StructType(
            [T.StructField("id", T.LongType(), True)] + list(schema.fields)
        )
        return self.spark.createDataFrame([], full)

    def fetch_max_id(self, loaded: DataFrame) -> int:
        """max(id) over the store; empty → reservedIdSpace
        (IDManagerSparkService.scala:132-141)."""
        row = loaded.agg(F.max("id").alias("m")).first()
        m = row["m"] if row else None
        return int(m) if m is not None else self.config.reservedIdSpace

    def process(
        self, current: DataFrame, order_by: list[str] | None = None
    ) -> tuple[DataFrame, DataFrame]:
        """Assign ids to the current batch, append to the store, return
        (loaded, current_with_ids) — the VertexData pair (Job.scala:52-56).
        """
        loaded = self.read_all(current.schema)
        offset = self.fetch_max_id(loaded)
        with_id = zip_with_index(current, offset=offset, order_by=order_by)
        with_id = with_id.cache()  # reused by every edge rule + the write
        writer = with_id.write.mode("append")
        parts = [c for c in PARTITION_COLUMNS if c in with_id.columns]
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(self.config.dataPath)
        return loaded, with_id

    def read_range(self, pm: PartitionManager) -> DataFrame:
        """Store rows for a date window (delete path, Job.scala:117-134).
        Partition-column filter → pruned scan."""
        return self.spark.read.parquet(self.config.dataPath).where(
            pm.partition_filter()
        )

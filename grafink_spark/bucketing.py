"""Bucketed tables: pre-shuffled storage so repeated joins and
aggregations on the same key run with NO exchange at query time.

At 100 TB the dominant cost of the engine's recurring joins (similarity
new×loaded, same-value new×old, id hydration) is re-shuffling the big
side every run. Writing the persistent side bucketed by the join key
moves that shuffle to write time, once; every subsequent join reads
bucket n of A and bucket n of B into the same task. This is Spark's
native answer to the reference's HBase region pre-split strategy
(grafink presplits JanusGraph edge-store regions so bulk loads don't
re-balance; here the "region" is a bucket file and the router is the
hash function Catalyst already plans with).

Bucketing metadata lives in the session catalog (in-memory by default;
a shared Hive metastore on a real cluster makes it durable across
jobs). The parquet files themselves carry the bucket id in the file
name, so a warehouse written once is re-registerable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    table. ``num_buckets`` should match the downstream join fan-out —
    buckets are the unit of parallelism for exchange-free joins, so at
    scale pick buckets ≈ target tasks (and the SAME count on both join
    sides; mismatched counts fall back to a shuffle on one side).

    Sorting within buckets lets the sort-merge join skip its sort step
    when each bucket is a single file (coalesce before writing if the
    input has more partitions than buckets and you want that)."""
    writer = df.write.bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.mode(mode).format("parquet").saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key: Catalyst sees both
    sides' output partitioning already satisfies the join's
    distribution requirement and plans a SortMergeJoin with no
    Exchange on either side (pinned in tests/test_bucketing.py).

    The join itself is ordinary ``DataFrame.join`` — this helper only
    documents/centralizes the contract; any equi-join or groupBy on the
    bucket column of these tables is exchange-free the same way."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def zorder_value(cols: list, bits: int = 16):
    """Z-order (Morton) curve value for N already-bounded non-negative
    integer columns: interleave the low ``bits`` bits of each column —
    rows close on the curve are close in EVERY dimension, so sorting
    storage by this value gives tight parquet row-group min/max on all
    participating columns at once (a single-column sort clusters only
    that column).

    Pure bit arithmetic (shift/mask/or), identical in Spark and any
    SQL engine; unrolled to bits×N terms inside whole-stage codegen.
    Callers with unbounded or float columns quantize first
    (e.g. ``pmod(col, 2^bits)`` or a min-max rank).
    """
    from pyspark.sql import functions as F

    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list,
    bits: int = 16,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out along the Z-order curve of
    ``cols``: range-partition by z-value into ``num_files`` tasks, sort
    within each, write. Every output file then covers a compact curve
    segment — tight min/max on ALL ``cols`` — so parquet row-group
    pruning (and file pruning with DSv2 stats) works for predicates on
    any of the dimensions, not just a lead sort column. This is the
    open-table-format OPTIMIZE ZORDER operation expressed with stock
    Spark primitives.

    One range shuffle (samples the z distribution) + local sorts —
    write-time cost identical to a linear sort-write.
    """
    z = zorder_value(cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def hilbert_value_df(
    df: DataFrame, x: str, y: str, bits: int = 8, out: str = "hval"
) -> DataFrame:
    """Append the Hilbert-curve index of two already-quantized
    non-negative integer columns (grid 2^bits × 2^bits). The Hilbert
    curve is the locality-better sibling of ``zorder_value``: every
    consecutive pair of curve positions is Manhattan-adjacent (no
    Morton "jumps" across the plane), so range predicates on either
    dimension touch fewer sorted-file segments.

    The classic xy2d state machine (one rotate/flip per bit level,
    MSB→LSB) is inherently sequential per bit, so it is unrolled as a
    withColumn chain — each level's rx/ry/x/y land as NAMED projection
    columns. That keeps the expression tree linear: CollapseProject
    declines to inline non-cheap CASE expressions referenced more than
    once, and codegen evaluates the stacked projections as local
    variables in one WholeStageCodegen stage. (A nested single
    expression would grow ~5× per level — 5^16 leaves at bits=16.)
    """
    df = (
        df.withColumn("_hx", F.col(x).cast("long"))
        .withColumn("_hy", F.col(y).cast("long"))
        .withColumn("_hd", F.lit(0).cast("long"))
    )
    for s in (1 << b for b in range(bits - 1, -1, -1)):
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        df = df.withColumn("_rx", rx).withColumn("_ry", ry)
        quad = (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry"))
        df = df.withColumn(
            "_hd", F.col("_hd") + F.lit(s * s).cast("long") * quad.cast("long")
        )
        # rotate/flip the quadrant frame (swap axes when ry == 0,
        # mirroring both when rx == 1)
        nx = F.when(F.col("_ry") == 1, F.col("_hx")).otherwise(
            F.when(F.col("_rx") == 1, F.lit(s - 1) - F.col("_hy")).otherwise(
                F.col("_hy")
            )
        )
        ny = F.when(F.col("_ry") == 1, F.col("_hy")).otherwise(
            F.when(F.col("_rx") == 1, F.lit(s - 1) - F.col("_hx")).otherwise(
                F.col("_hx")
            )
        )
        df = (
            df.withColumn("_nx", nx)
            .withColumn("_ny", ny)
            .withColumn("_hx", F.col("_nx"))
            .withColumn("_hy", F.col("_ny"))
        )
    return df.withColumn(out, F.col("_hd")).drop(
        "_hx", "_hy", "_hd", "_rx", "_ry", "_nx", "_ny"
    )


def hilbert_write(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 8,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """OPTIMIZE-style Hilbert layout: range-partition + sort by the
    curve index, write parquet. Same one-shuffle write cost as
    ``zorder_write``; file min/max stay tight on BOTH dimensions with
    strictly better worst-case locality (no bit-boundary jumps)."""
    staged = hilbert_value_df(df, x, y, bits=bits, out="_h")
    (
        staged.repartitionByRange(num_files, "_h")
        .sortWithinPartitions("_h")
        .drop("_h")
        .write.mode(mode)
        .parquet(path)
    )

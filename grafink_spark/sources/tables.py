"""Loader for the benchmark/test tables (TESTDATA.md layout).

The driver-generated parquet stores timestamps as INT64
TIMESTAMP(NANOS), which Spark's parquet reader rejects outright
(PARQUET_TYPE_ILLEGAL) unless ``spark.sql.legacy.parquet.nanosAsLong``
is on. This module owns that quirk in one place: set the flag (runtime
conf — works on any session, including the driver's), read the longs,
and rebuild proper TimestampType columns via ``timestamp_micros(ns/1000)``
(nanosecond→microsecond truncation, matching duckdb's TIMESTAMP cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# columns stored as TIMESTAMP(NANOS) in the source parquet
NANO_TS_COLUMNS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table; nano-timestamp longs become TimestampType."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # duckdb-oracle parity: timestamps are naive/UTC in the source data
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in NANO_TS_COLUMNS.get(name, []):
        if c not in df.columns:
            continue
        dt = dict(df.dtypes)[c]
        if dt == "bigint":
            df = df.withColumn(
                c, F.timestamp_micros((F.col(c) / 1000).cast("long"))
            )
        elif dt == "timestamp_ntz":
            # TIMESTAMP(MICROS, ntz) source files: session tz is UTC, so
            # the cast keeps the naive wall-clock duckdb reads
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for the SQL surface."""
    for t, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(t)

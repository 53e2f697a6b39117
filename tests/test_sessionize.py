"""Sessionization: batch window-function twin vs applyInPandasWithState
stream — identical session semantics."""

import os
import shutil

from pyspark.sql import functions as F

from grafink_spark.sources.tables import load_table
from grafink_spark.streaming.pipeline import read_event_stream
from grafink_spark.streaming.sessionize import sessionize_batch, sessionize_stream

SRC = "/root/testdata/sf0.001/events.parquet"


def _events(spark):
    return load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "value"
    )


def test_batch_sessions_sane(spark):
    ev = _events(spark)
    sess = sessionize_batch(ev, gap_seconds=1800)
    n_events = ev.count()
    agg = sess.agg(
        F.sum("n_events").alias("n"),
        F.min(F.col("session_start") <= F.col("session_end")).alias("ordered"),
    ).first()
    # every event lands in exactly one session; sessions are ordered
    assert agg.n == n_events
    assert agg.ordered is True
    # no two sessions of one user overlap within the gap: successive
    # starts must be > previous end + gap
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_start")
    bad = (
        sess.withColumn("prev_end", F.lag("session_end").over(w))
        .where(
            F.col("prev_end").isNotNull()
            & (
                F.col("session_start").cast("long")
                - F.col("prev_end").cast("long")
                <= 1800
            )
        )
        .count()
    )
    assert bad == 0


def test_stream_sessions_match_batch(spark, tmp_path):
    src_dir = str(tmp_path / "events_src")
    os.makedirs(src_dir, exist_ok=True)
    shutil.copy(SRC, os.path.join(src_dir, "part-0.parquet"))

    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = read_event_stream(spark, src_dir).select("user_id", "ts", "value")
        sess = sessionize_stream(stream, gap_seconds=1800, watermark="1 hour")
        q = (
            sess.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    # push the watermark far forward with one sentinel event so idle
    # sessions time out and emit on the second pass
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = spark.read.parquet(SRC)
    shift = (
        F.col("ts") + F.lit(365 * 24 * 3600 * 10**9)
        if dict(src.dtypes)["ts"] == "bigint"  # legacy long-nanos files
        else F.col("ts") + F.expr("INTERVAL 365 DAYS")
    )
    sentinel = (
        src.orderBy(F.col("ts").desc()).limit(1).withColumn("ts", shift)
    )
    sentinel.coalesce(1).write.mode("append").parquet(src_dir)
    run()

    got = spark.read.parquet(out)
    assert got.count() > 0

    batch = sessionize_batch(_events(spark), gap_seconds=1800).select(
        "user_id",
        "session_start",
        "session_end",
        F.col("n_events").alias("b_n"),
        F.round("sum_value", 6).alias("b_sum"),
    )
    joined = got.join(batch, ["user_id", "session_start", "session_end"], "inner")
    # every emitted session matches a batch session exactly
    assert joined.count() == got.count()
    assert (
        joined.where(
            (F.col("n_events") != F.col("b_n"))
            | (F.round("sum_value", 6) != F.col("b_sum"))
        ).count()
        == 0
    )
    # and after the sentinel, all real sessions have been emitted
    # (every batch session except possibly ones involving the sentinel)
    n_batch = batch.count()
    assert got.count() >= n_batch - 2


def test_ewma_stream_matches_recursion_across_batches(spark, tmp_path):
    """Per-key EWMA folded across TWO microbatches must equal the
    single-pass recursion over the full event sequence — state carries
    (last_ewma, n) across the batch boundary."""
    import pandas as pd

    from grafink_spark.streaming.sessionize import ewma_stream

    src_dir = str(tmp_path / "ewma_src")
    out = str(tmp_path / "ewma_out")
    ckpt = str(tmp_path / "ewma_ckpt")
    os.makedirs(src_dir, exist_ok=True)

    full = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_type", "ts", "value")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    half = len(full) // 2
    spark.createDataFrame(full.iloc[:half]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src_dir)

    def run():
        stream = (
            spark.readStream.schema("event_type string, ts timestamp, value double")
            .parquet(src_dir)
        )
        q = (
            ewma_stream(stream, alpha=0.3)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    spark.createDataFrame(full.iloc[half:]).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    run()

    got = (
        spark.read.parquet(out)
        .orderBy("event_type", "n")
        .toPandas()
    )
    assert len(got) == len(full)
    for k, grp in full.groupby("event_type"):
        grp = grp.sort_values("ts")
        cur = None
        want = []
        for x in grp["value"]:
            x = float(x)
            cur = x if cur is None else 0.3 * x + 0.7 * cur
            want.append(cur)
        g = got[got["event_type"] == k].sort_values("n")
        assert len(g) == len(want)
        assert max(abs(a - b) for a, b in zip(g["ewma"], want)) < 1e-9, k

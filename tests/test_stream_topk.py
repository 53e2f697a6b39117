"""Streaming running top-k: final stream emission per key equals the
batch grouped_topk over the full input; state stays k-bounded across
microbatches and dedupes redelivered rows."""

import os
import shutil

from pyspark.sql import functions as F

from grafink_spark.ops import grouped_topk
from grafink_spark.sources.tables import load_table
from grafink_spark.streaming.pipeline import read_event_stream
from grafink_spark.streaming.topk import running_topk_stream

SRC = "/root/testdata/sf0.001/events.parquet"


def _batch_topk(spark, k=5):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = grouped_topk(
        ev, ["event_type"], [F.col("value").desc(), "event_id"], k
    )
    return {
        (r.event_type, r.event_id, round(r.value, 9))
        for r in out.collect()
    }


def test_stream_topk_matches_batch_over_two_microbatches(spark, tmp_path):
    src_dir = str(tmp_path / "tk_src")
    os.makedirs(src_dir, exist_ok=True)

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    # two single-file microbatches: event_id split, second file includes
    # a redelivered overlap slice (dedupe-by-id must absorb it)
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        src_dir + "/b0"
    )
    ev.where(
        (F.col("event_id") % 2 == 1) | (F.col("event_id") % 10 == 0)
    ).coalesce(1).write.parquet(src_dir + "/b1")

    latest: dict[str, list] = {}

    def absorb(df, _bid):
        by_key: dict[str, list] = {}
        for r in df.collect():
            by_key.setdefault(r["key"], []).append(r)
        latest.update(by_key)

    stream = running_topk_stream(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*"),
        k=5,
    )
    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(absorb)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (key, r["event_id"], round(r["value"], 9))
        for key, rows in latest.items()
        for r in rows
    }
    assert got == _batch_topk(spark, k=5)


def test_stream_topk_state_is_k_bounded(spark, tmp_path):
    # feeding the same file twice must not grow the top-k past k or
    # duplicate ids (dedupe-by-id in the merge)
    src_dir = str(tmp_path / "tkb_src")
    os.makedirs(src_dir, exist_ok=True)
    shutil.copy(SRC, src_dir + "/a.parquet")
    shutil.copy(SRC, src_dir + "/b.parquet")

    rows = []
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    stream = running_topk_stream(
        spark.readStream.schema(ev.schema).parquet(src_dir), k=3
    )
    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(lambda df, _b: rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    per_key: dict[str, list] = {}
    for r in rows:
        per_key.setdefault(r["key"], []).append(r)
    for key, rs in per_key.items():
        by_emission = {}
        for r in rs:
            by_emission.setdefault(r["rank"], r)
        assert max(r["rank"] for r in rs) <= 3
        ids = [r["event_id"] for r in rs if r["rank"] == 1]
        # rank-1 id is stable across emissions of the same data
        assert len(set(ids)) == 1

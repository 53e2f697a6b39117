"""Streaming CDC apply: multi-microbatch merge, exactly-once replay."""

import os

from pyspark.sql import functions as F

SCHEMA = "k long, v string, _op string, _seq long"


def _write_changes(spark, path, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_cdc_stream_matches_batch_merge(spark, tmp_path):
    from grafink_spark.cdc import merge_changes
    from grafink_spark.streaming.cdc_apply import apply_cdc_stream

    src = str(tmp_path / "changes")
    os.makedirs(src, exist_ok=True)
    b1 = [(1, "a", "I", 1), (2, "b", "I", 2), (3, "c", "I", 3)]
    b2 = [(2, "b2", "U", 4), (3, None, "D", 5), (4, "d", "I", 6)]
    _write_changes(spark, src, b1, "b1")
    _write_changes(spark, src, b2, "b2")

    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    apply_cdc_stream(stream, table, ckpt, key="k")

    got = {(r.k, r.v) for r in spark.read.parquet(table).collect()}
    # batch twin applied in sequence order over everything
    batch = merge_changes(
        spark.createDataFrame([], "k long, v string"),
        spark.createDataFrame(b1 + b2, SCHEMA),
        "k",
    )
    want = {(r.k, r.v) for r in batch.collect()}
    assert got == want == {(1, "a"), (2, "b2"), (4, "d")}


def test_cdc_replayed_batch_is_noop(spark, tmp_path):
    from grafink_spark.streaming.cdc_apply import apply_cdc_stream

    src = str(tmp_path / "changes2")
    os.makedirs(src, exist_ok=True)
    _write_changes(spark, src, [(1, "a", "I", 1)], "b1")

    table = str(tmp_path / "table2")
    ckpt = str(tmp_path / "ckpt2")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    apply_cdc_stream(stream, table, ckpt, key="k")
    assert {(r.k, r.v) for r in spark.read.parquet(table).collect()} == {
        (1, "a")
    }

    # redeliver the SAME microbatch (fresh checkpoint, same batch id 0,
    # same commit-marker dir): the marker short-circuits before any
    # merge/swap work runs
    stream2 = spark.readStream.schema(SCHEMA).parquet(src)
    apply_cdc_stream(stream2, table, str(tmp_path / "ckpt3"), key="k")
    assert {(r.k, r.v) for r in spark.read.parquet(table).collect()} == {
        (1, "a")
    }


def test_complete_interrupted_swap(spark, tmp_path):
    """Crash window inside fsutil.swap (target deleted, tmp not yet
    renamed): recovery finishes the rename iff tmp is complete."""
    from grafink_spark import fsutil

    target = str(tmp_path / "table3")
    tmp = target + "__merge_tmp"
    spark.range(5).write.parquet(tmp)  # complete: has _SUCCESS
    assert fsutil.complete_interrupted_swap(spark, tmp, target)
    assert spark.read.parquet(target).count() == 5
    assert not fsutil.exists(spark, tmp)

    # existing target → no-op even with a stale tmp lying around
    spark.range(3).write.parquet(tmp)
    assert not fsutil.complete_interrupted_swap(spark, tmp, target)
    assert spark.read.parquet(target).count() == 5

    # dead partial write (no _SUCCESS) never recovers
    target2 = str(tmp_path / "table4")
    tmp2 = target2 + "__merge_tmp"
    os.makedirs(tmp2, exist_ok=True)
    with open(os.path.join(tmp2, "part-0.parquet"), "wb") as f:
        f.write(b"garbage")
    assert not fsutil.complete_interrupted_swap(spark, tmp2, target2)
    assert not fsutil.exists(spark, target2)

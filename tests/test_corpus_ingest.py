"""Streaming corpus ingest: incremental dedup across microbatches,
idempotent replay."""

import os

from pyspark.sql import functions as F

from grafink_spark import fsutil
from grafink_spark.streaming.corpus_ingest import (
    BATCH_COL,
    ingest_corpus_stream,
)

SCHEMA = "doc_id long, text string"


def _write_batch(spark, src_dir, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)


def _run(spark, src_dir, corpus, ckpt):
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    ingest_corpus_stream(stream, corpus, ckpt, available_now=True)


def test_cross_batch_dedup_and_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(
        spark,
        src,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # in-batch dup
            (3, "one unrelated document with its own words here"),
        ],
    )
    _run(spark, src, corpus, ckpt)
    got1 = spark.read.parquet(corpus)
    assert sorted(r.doc_id for r in got1.collect()) == [1, 3]

    # batch 2: one dup of the stored corpus, one genuinely new doc
    _write_batch(
        spark,
        src,
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),  # corpus dup
            (11, "completely fresh material never seen before now"),
        ],
    )
    _run(spark, src, corpus, ckpt)
    got2 = spark.read.parquet(corpus)
    assert sorted(r.doc_id for r in got2.collect()) == [1, 3, 11]
    assert BATCH_COL in got2.columns

    # replay guard: wipe the checkpoint so both files re-deliver — the
    # commit markers alone must keep the corpus unchanged
    import shutil

    shutil.rmtree(ckpt)
    _run(spark, src, corpus, str(tmp_path / "ckpt2"))
    got3 = spark.read.parquet(corpus)
    assert sorted(r.doc_id for r in got3.collect()) == [1, 3, 11]


def test_crash_mid_append_is_purged_on_replay(spark, tmp_path):
    # simulate batch 0 having crashed mid-append: tagged rows exist in
    # the corpus but no commit marker was written
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(99, "leftover row from the crashed attempt", 0)],
        "doc_id long, text string, _ingest_batch_id long",
    ).write.parquet(corpus)

    _write_batch(spark, src, [(1, "the real document of batch zero")])
    _run(spark, src, corpus, str(tmp_path / "ckpt"))
    got = spark.read.parquet(corpus)
    # the replayed batch 0 purged the crashed rows and wrote its own
    assert sorted(r.doc_id for r in got.collect()) == [1]

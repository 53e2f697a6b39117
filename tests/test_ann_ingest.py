"""Streaming IVF index maintenance: stream-appended vectors must be
immediately searchable, match the batch append exactly, and replay
without double-appending."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from grafink_spark.llm import simsearch as ss
from grafink_spark.streaming.ann_ingest import BATCH_COL, ingest_vectors_stream

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _write_vectors(spark, src: str, df, name: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, name))


def test_streaming_ivf_ingest_matches_batch_and_serves_fresh(spark, tmp_path):
    emb = spark.read.parquet(EMB)
    base = emb.where(F.col("vec_id") % 3 == 0)
    b1 = emb.where(F.col("vec_id") % 3 == 1)
    b2 = emb.where(F.col("vec_id") % 3 == 2)
    queries = emb.orderBy("vec_id").limit(3)

    path = str(tmp_path / "ivf_idx")
    ss.ivf_write_index(base, path, nlist=4, iters=1)

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = emb.schema
    _write_vectors(spark, src, b1, "b1")
    stream = spark.readStream.schema(schema).parquet(os.path.join(src, "*"))
    ingest_vectors_stream(
        stream, path, str(tmp_path / "ckpt"), available_now=True
    )
    _write_vectors(spark, src, b2, "b2")
    stream = spark.readStream.schema(schema).parquet(os.path.join(src, "*"))
    ingest_vectors_stream(
        stream, path, str(tmp_path / "ckpt"), available_now=True
    )

    stored = (
        spark.read.option("basePath", f"{path}/vectors")
        .option("mergeSchema", "true")
        .parquet(f"{path}/vectors")
    )
    assert stored.count() == emb.count()
    # every stream-appended row is batch-tagged and landed in a list dir
    assert stored.where(F.col(BATCH_COL).isNotNull()).count() == (
        b1.count() + b2.count()
    )

    # full-probe search over the streamed index == brute force over all
    got = sorted(
        (r.query_id, r.neighbor_id)
        for r in ss.ivf_topk_indexed(spark, path, queries, k=3, nprobe=4).collect()
    )
    want = sorted(
        (r.query_id, r.neighbor_id)
        for r in ss.brute_force_topk(emb, queries, k=3).collect()
    )
    assert got == want


def test_streaming_ivf_ingest_replay_is_noop(spark, tmp_path):
    emb = spark.read.parquet(EMB)
    base = emb.where(F.col("vec_id") % 2 == 0)
    b1 = emb.where(F.col("vec_id") % 2 == 1)

    path = str(tmp_path / "ivf_idx")
    ss.ivf_write_index(base, path, nlist=4, iters=1)

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_vectors(spark, src, b1, "b1")
    schema = emb.schema

    stream = spark.readStream.schema(schema).parquet(os.path.join(src, "*"))
    ingest_vectors_stream(stream, path, str(tmp_path / "ckpt"), available_now=True)
    n1 = spark.read.option("basePath", f"{path}/vectors").parquet(
        f"{path}/vectors"
    ).count()

    # fresh checkpoint replays batch 0 from the same files; the commit
    # marker must skip it instead of double-appending
    stream = spark.readStream.schema(schema).parquet(os.path.join(src, "*"))
    ingest_vectors_stream(stream, path, str(tmp_path / "ckpt2"), available_now=True)
    n2 = spark.read.option("basePath", f"{path}/vectors").parquet(
        f"{path}/vectors"
    ).count()
    assert n1 == n2 == emb.count()


def test_streaming_ivf_ingest_crash_purge_preserves_base(spark, tmp_path):
    """The crashed-attempt purge must remove ONLY the crashed batch's
    tagged rows: the initial ivf_write_index vectors carry no batch tag
    (NULL under mergeSchema) and must survive — a non-null-safe filter
    (`BATCH_COL != id`) would silently delete the whole resident
    index."""
    from grafink_spark import fsutil

    emb = spark.read.parquet(EMB)
    base = emb.where(F.col("vec_id") % 2 == 0)
    b1 = emb.where(F.col("vec_id") % 2 == 1)

    path = str(tmp_path / "ivf_idx")
    ss.ivf_write_index(base, path, nlist=4, iters=1)

    # simulate a batch-0 attempt that crashed after a partial append
    # (tagged rows present, commit marker never touched)
    junk = b1.limit(3).withColumn(BATCH_COL, F.lit(0))
    ss.ivf_index_append(spark, path, junk)

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_vectors(spark, src, b1, "b1")
    stream = spark.readStream.schema(emb.schema).parquet(os.path.join(src, "*"))
    ingest_vectors_stream(stream, path, str(tmp_path / "ckpt"), available_now=True)

    stored = (
        spark.read.option("basePath", f"{path}/vectors")
        .option("mergeSchema", "true")
        .parquet(f"{path}/vectors")
    )
    # base rows intact, junk purged, batch re-appended exactly once
    assert stored.where(F.col(BATCH_COL).isNull()).count() == base.count()
    assert stored.count() == emb.count()
    assert fsutil.exists(spark, os.path.join(path + "_commits", "0"))

"""Streaming graph ingest: incremental microbatches behave exactly like
sequential daily batch runs — consecutive ids across batches, new×old
edges to previously loaded vertices."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from grafink_spark.config import IDManagerConfig
from grafink_spark.graph.storage import GraphStore
from grafink_spark.id_manager import IDManager
from grafink_spark.rules.samevalue import SameValueClassifier
from grafink_spark.streaming.graph_ingest import stream_to_graph

SCHEMA = T.StructType(
    [
        T.StructField("objectId", T.StringType()),
        T.StructField("rfscore", T.DoubleType()),
    ]
)


def _write_batch(spark, src_dir, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)


def test_streaming_ingest_matches_batch_semantics(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, src, [("objA", 0.95), ("objB", 0.5)], "b1")

    idm = IDManager(
        spark, IDManagerConfig(dataPath=str(tmp_path / "ids"), reservedIdSpace=10)
    )
    store = GraphStore(spark, str(tmp_path / "graph"), task_size=100, parallelism=2)
    rules = [SameValueClassifier(["objectId"])]

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        stream_to_graph(
            stream, idm, store, rules, str(tmp_path / "ckpt"), available_now=True
        )

    run()
    v1 = store.vertices()
    assert sorted(r.id for r in v1.select("id").collect()) == [11, 12]
    assert store.edges().count() == 0  # distinct objectIds, no pairs

    # second microbatch: one repeat objectId, one new → ids continue at 13,
    # and the repeat links to the batch-1 vertex (new×old)
    _write_batch(spark, src, [("objA", 0.7), ("objC", 0.2)], "b2")
    run()
    ids = sorted(r.id for r in store.vertices().select("id").collect())
    assert ids == [11, 12, 13, 14]

    objA_ids = sorted(
        r.id for r in store.vertices().where(F.col("objectId") == "objA").collect()
    )
    assert len(objA_ids) == 2
    edges = {
        (r.src, r.dst)
        for r in store.edges().where(F.col("label") == "exactmatch").collect()
    }
    # both directions of the objA new×old pair
    a, b = objA_ids
    assert edges == {(a, b), (b, a)}

    # third run with no new files: no-op, nothing double-ingested
    run()
    assert store.vertices().count() == 4

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


def _setup(spark, tmp_path):
    idm = IDManager(
        spark, IDManagerConfig(dataPath=str(tmp_path / "ids"), reservedIdSpace=10)
    )
    store = GraphStore(spark, str(tmp_path / "graph"), task_size=100, parallelism=2)
    rules = [SameValueClassifier(["objectId"])]
    return idm, store, rules


def test_replay_of_committed_batch_is_skipped(spark, tmp_path):
    """Exactly-once case 1: batch crashed AFTER commit marker but before
    the streaming checkpoint advanced → the replay must be a no-op."""
    from grafink_spark.streaming.graph_ingest import ingest_batch

    idm, store, rules = _setup(spark, tmp_path)
    batch = spark.createDataFrame([("objA", 0.9), ("objA", 0.8)], SCHEMA)
    ingest_batch(batch, 0, idm, store, rules)
    v = sorted(r.id for r in store.vertices().select("id").collect())
    e = store.edges().count()
    assert v == [11, 12] and e == 2  # objA pair, both directions

    ingest_batch(batch, 0, idm, store, rules)  # full replay
    assert sorted(r.id for r in store.vertices().select("id").collect()) == v
    assert store.edges().count() == e
    # and the id store did not double-append either
    assert idm.read_all(batch.schema).count() == 2


def test_replay_of_half_written_batch_purges_then_reruns(spark, tmp_path):
    """Exactly-once case 2: batch crashed MID-append (vertices written,
    edges not, no commit marker) → replay purges the partial rows and
    re-runs; final state identical to a clean single run, same ids."""
    from grafink_spark.streaming.graph_ingest import ingest_batch

    idm, store, rules = _setup(spark, tmp_path)
    b0 = spark.createDataFrame([("objA", 0.9)], SCHEMA)
    ingest_batch(b0, 0, idm, store, rules)  # committed predecessor

    b1 = spark.createDataFrame([("objA", 0.7), ("objB", 0.2)], SCHEMA)
    real_write_edges = GraphStore.write_edges
    calls = {"n": 0}

    def crashing_write_edges(self, edges, rule, tags=None):
        calls["n"] += 1
        raise RuntimeError("simulated executor loss mid-batch")

    GraphStore.write_edges = crashing_write_edges
    try:
        try:
            ingest_batch(b1, 1, idm, store, rules)
            raise AssertionError("expected simulated crash")
        except RuntimeError:
            pass
    finally:
        GraphStore.write_edges = real_write_edges
    assert calls["n"] == 1
    # partial state on disk: batch-1 vertices+ids appended, no edges
    assert store.vertices().count() == 3
    assert store.edges().count() == 0

    ingest_batch(b1, 1, idm, store, rules)  # replay after crash
    ids = sorted(r.id for r in store.vertices().select("id").collect())
    assert ids == [11, 12, 13]  # same ids a clean run would assign
    edges = {
        (r.src, r.dst) for r in store.edges().collect()
    }
    objA = {
        r.id
        for r in store.vertices().where(F.col("objectId") == "objA").collect()
    }
    a, b = sorted(objA)
    assert edges == {(a, b), (b, a)}
    # replaying the now-committed batch again is still a no-op
    ingest_batch(b1, 1, idm, store, rules)
    assert store.vertices().count() == 3
    assert store.edges().count() == 2


def test_corrupt_id_store_raises_instead_of_restarting_ids(spark, tmp_path):
    """A corrupt (unreadable, but existing) id store must fail with the
    taxonomy's GetIdException (exit 3), not silently restart ids at
    reservedIdSpace (VERDICT r1 item 3)."""
    import pytest

    from grafink_spark.errors import GetIdException, exit_code_for

    store_dir = tmp_path / "ids"
    store_dir.mkdir()
    (store_dir / "part-00000.parquet").write_bytes(b"this is not parquet")
    idm = IDManager(
        spark, IDManagerConfig(dataPath=str(store_dir), reservedIdSpace=10)
    )
    batch = spark.createDataFrame([("objA", 0.9)], SCHEMA)
    with pytest.raises(GetIdException) as ei:
        idm.process(batch)
    assert exit_code_for(ei.value) == 3

    # an existing-but-EMPTY dir is still a valid fresh store
    empty_dir = tmp_path / "ids_empty"
    empty_dir.mkdir()
    idm2 = IDManager(
        spark, IDManagerConfig(dataPath=str(empty_dir), reservedIdSpace=10)
    )
    loaded = idm2.read_all(batch.schema)
    assert loaded.count() == 0 and "id" in loaded.columns

"""Graph store, catalog, query layer, fixed-vertex CSV, delete path."""

import pytest
from pyspark.sql import functions as F

from grafink_spark.graph.catalog import GraphCatalog, property_class_for
from grafink_spark.graph.query import GraphQuery
from grafink_spark.graph.sink import CallbackSink
from grafink_spark.graph.storage import GraphStore, get_parallelism
from grafink_spark.rules.samevalue import SameValueClassifier
from grafink_spark.sources.fixed_vertices import read_fixed_vertices
from tests.conftest import alert


def test_parallelism_formula():
    # EdgeProcessorSpec.scala:31-60 goldens
    assert get_parallelism(3000, 2500, 10) == 10
    assert get_parallelism(300000, 2500, 10) == 121
    assert get_parallelism(100, 2500, 10) == 10


@pytest.fixture()
def store(spark, tmp_path):
    return GraphStore(spark, str(tmp_path / "graph"), task_size=2500, parallelism=4)


def _load_graph(store, alerts_df):
    current = alerts_df(
        [
            alert(1, "obj1", 0.92, 0.95, 1, 0.0, "WD*", None, None),
            alert(2, "obj2", 0.35, 0.8999, 1, 0.0, "WD*", "ML", "ML"),
            alert(3, "obj1", 0.35, 0.8999, 2, 0.0, "WD*", "ML", "ML"),
        ]
    )
    loaded = alerts_df([])
    store.write_vertices(current, label="alert")
    rule = SameValueClassifier(["objectId"])
    edges = rule.classify(loaded, current)
    n = store.write_edges(edges, rule)
    return current, n


def test_write_and_query_graph(spark, store, alerts_df):
    _, n = _load_graph(store, alerts_df)
    # one pair (1,3) → both directions
    assert n == 2
    q = GraphQuery(store)
    assert q.vertex_count() == 3
    assert {r.src for r in q.out_e("exactmatch").collect()} == {1, 3}
    assert [r.neighbor_id for r in q.neighbors(1, "exactmatch").collect()] == [3]
    deg = {r.id: r.degree for r in q.degree().collect()}
    assert deg == {1: 1, 3: 1}
    vm = q.value_map(2)
    assert vm["objectId"] == "obj2" and vm["label"] == "alert"
    # point lookup
    assert q.V(objectId="obj1").count() == 2


def test_delete_vertices(spark, store, alerts_df):
    _load_graph(store, alerts_df)
    store.delete_vertices(spark.createDataFrame([(3,)], "id long"))
    q = GraphQuery(store)
    assert q.vertex_count() == 2
    assert store.edges().count() == 0  # both directions touched id 3


def _read_captured(capture_dir, kind):
    import json
    import os

    out = []
    for name in os.listdir(capture_dir):
        if name.startswith(kind + "-"):
            with open(os.path.join(capture_dir, name)) as f:
                out.extend(json.loads(line) for line in f)
    return out


def test_pluggable_sink_receives_partitions(spark, tmp_path, alerts_df):
    """A configured GraphSink gets the same materialized batches the
    parquet writer would (both edge directions, label/property_key), via
    per-partition iterators on the executors; the parquet tables are NOT
    written (SURVEY S6's foreachPartition extension point)."""
    capture = tmp_path / "captured"
    capture.mkdir()
    capture_dir = str(capture)

    # partition callbacks run in executor worker processes, so a driver-
    # side list can't capture — each dumps its rows to a unique JSONL
    # file in a shared dir. Defined as closures: cloudpickle ships them
    # by value (a test-module class isn't importable on the workers).
    def _dump(kind, rows):
        import json
        import os
        import uuid

        rows = [r.asDict() for r in rows]
        if not rows:
            return
        path = os.path.join(capture_dir, f"{kind}-{uuid.uuid4().hex}.jsonl")
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    sink = CallbackSink(
        lambda rows: _dump("v", rows), lambda rows: _dump("e", rows)
    )
    store = GraphStore(
        spark, str(tmp_path / "graph"), task_size=2500, parallelism=4, sink=sink
    )
    _load_graph(store, alerts_df)

    verts = _read_captured(str(capture), "v")
    assert len(verts) == 3
    assert {v["label"] for v in verts} == {"alert"}
    assert {v["objectId"] for v in verts} == {"obj1", "obj2"}

    edges = _read_captured(str(capture), "e")
    # one (1,3) pair → both directions materialized before the sink sees it
    assert {(e["src"], e["dst"]) for e in edges} == {(1, 3), (3, 1)}
    assert all(e["label"] == "exactmatch" for e in edges)
    assert all(e["property_key"] == "propertyname" for e in edges)

    # external sink short-circuits the parquet tables
    import os

    assert not os.path.exists(store.vertex_path)
    assert not os.path.exists(store.edge_path)


def test_catalog_idempotent_and_info(spark, tmp_path, alerts_df):
    cat = GraphCatalog(str(tmp_path / "g"))
    df = alerts_df([alert(1, "o", 0.1, 0.1, 0, 0.1, "U", None, None)])
    assert cat.create_vertex_label("alert", df=df)
    assert not cat.create_vertex_label("alert", df=df)  # skip-if-exists
    assert cat.create_edge_label("similarity", "value", "Integer")
    assert cat.create_index("byObjectId", "composite", "vertex", ["objectId"])
    info = cat.info()
    assert info["vertexLabels"] == ["alert"]
    assert info["edgeLabels"][0] == {"name": "similarity", "multiplicity": "MULTI"}
    names = {p["name"] for p in info["propertyKeys"]}
    assert {"objectId", "rfscore", "value"} <= names
    # reload from disk
    cat2 = GraphCatalog(str(tmp_path / "g"))
    assert cat2.info() == info


def test_type_mapping():
    # common/Utils.scala:31-41 incl. binary→String downcast + catch-all
    assert property_class_for("binary") == "String"
    assert property_class_for("bigint") == "Long"
    assert property_class_for("float") == "Float"
    assert property_class_for("struct<a:int>") == "String"


def test_fixed_vertex_csv(tmp_path):
    p = tmp_path / "fixed.csv"
    p.write_text(
        '1,"similarity","recipe","string","supernova"\n'
        '4,"similarity","recipe","string","catalog","equals","string","WD*"\n'
        '7,"similarity","recipe","string","intrecipe","equals","int",9\n'
        '9,"similarity","recipe","string","floatrecipe","equals","float",9.8\n'
        '11,"similarity","recipe","string","boolrecipe","equals","bool",false\n'
        '12,"similarity","recipe","string","unknownrecipe","equals","unknown","weird"\n'
    )
    vs = read_fixed_vertices(str(p), reserved_id_space=200)
    assert [v.id for v in vs] == [1, 4, 7, 9, 11, 12]
    assert vs[1].prop("equals") == "WD*"
    assert vs[2].prop("equals") == 9
    assert vs[3].prop("equals") == 9.8
    assert vs[4].prop("equals") is False
    assert vs[5].prop("equals") == "weird"

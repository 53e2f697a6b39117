"""/info HTTP API: catalog introspection, error degradation, bounded
cache — no Spark required."""

import json
import threading
import urllib.request

from grafink_spark.api import CacheFullError, CatalogCache, info_for, make_server
from grafink_spark.graph.catalog import GraphCatalog, PropertyKey


def _post(port, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/info",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=5) as r:
        return json.loads(r.read())


def _make_catalog(root):
    cat = GraphCatalog(str(root))
    cat.create_vertex_label(
        "alert", extra_properties=[PropertyKey("objectId", "String")]
    )
    cat.create_edge_label("similarity", "value", "Integer")
    cat.create_index("objectId_idx", "composite", "vertex", ["objectId"])


def test_info_endpoint(tmp_path):
    _make_catalog(tmp_path / "mygraph")
    server = make_server(port=0, root=str(tmp_path))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        info = _post(port, {"tableName": "mygraph"})
        assert info["error"] == ""  # reference default, not null
        assert info["vertexLabels"] == ["alert"]
        assert info["edgeLabels"] == [{"name": "similarity", "multiplicity": "MULTI"}]
        assert {"name": "value", "type": "Integer", "cardinality": "SINGLE"} in info[
            "propertyKeys"
        ]
        assert info["indexes"][0]["status"] == "ENABLED"

        # unknown table → empty schema + error string, still HTTP 200
        bad = _post(port, {"tableName": "nope"})
        assert bad["vertexLabels"] == [] and bad["error"]

        # malformed body → degrades the same way
        worse = _post(port, {})
        assert worse["error"]

        # path probes are rejected, not resolved (ADVICE r1)
        for probe in ("/etc", "../outside", "a/../../b", str(tmp_path / "mygraph")):
            out = _post(port, {"tableName": probe})
            assert out["vertexLabels"] == [] and out["error"], probe
    finally:
        server.shutdown()


def test_resolve_table_path(tmp_path):
    from grafink_spark.api import resolve_table_path

    assert resolve_table_path(str(tmp_path), "g1").endswith("g1")
    assert resolve_table_path(str(tmp_path), "sub/g1").endswith("sub/g1")
    for bad in ("", "/abs", "../up", "a/..", "a//b", ".", "s3a://bucket/x", "a\\..\\b"):
        try:
            resolve_table_path(str(tmp_path), bad)
            raise AssertionError(f"expected ValueError for {bad!r}")
        except ValueError:
            pass


def test_cache_capacity(tmp_path):
    cache = CatalogCache(capacity=2)
    for i in range(2):
        d = tmp_path / f"g{i}"
        _make_catalog(d)
        cache.get(str(d))
    # same key: cached, no error
    cache.get(str(tmp_path / "g0"))
    d3 = tmp_path / "g3"
    _make_catalog(d3)
    try:
        cache.get(str(d3))
        raise AssertionError("expected CacheFullError")
    except CacheFullError:
        pass
    # the HTTP layer degrades it to an error payload
    out = info_for(cache, "g3", root=str(tmp_path))
    assert "full" in out["error"]

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
    _make_catalog(tmp_path)
    server = make_server(port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        info = _post(port, {"tableName": str(tmp_path)})
        assert info["error"] is None
        assert info["vertexLabels"] == ["alert"]
        assert info["edgeLabels"] == [{"name": "similarity", "multiplicity": "MULTI"}]
        assert {"name": "value", "type": "Integer", "cardinality": "SINGLE"} in info[
            "propertyKeys"
        ]
        assert info["indexes"][0]["status"] == "ENABLED"

        # unknown table → empty schema + error string, still HTTP 200
        bad = _post(port, {"tableName": str(tmp_path / "nope")})
        assert bad["vertexLabels"] == [] and bad["error"]

        # malformed body → degrades the same way
        worse = _post(port, {})
        assert worse["error"]
    finally:
        server.shutdown()


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
    out = info_for(cache, str(d3))
    assert "full" in out["error"]

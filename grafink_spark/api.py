"""Schema-info HTTP API (replaces the reference's http4s server).

Reference: api/src/main/scala/com/astrolabsoftware/grafink/api/MgmtApi.scala:35-49
routes ``POST /info`` with body ``{"tableName": ...}`` to a JanusGraph
management query (InfoService.scala:37-102) through a capacity-bounded
per-table connection cache (JanusGraphConnectionManager.scala:45-80,
SimpleCache.scala:24-58); errors degrade to an empty schema plus an
``error`` string (MgmtApi.scala:46).

Here a "connection" is just the graph directory's JSON catalog, so the
server is stdlib ``http.server`` — no Spark, no extra dependencies. The
cache keeps the reference's semantics: capacity-bounded, error when
full."""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from grafink_spark.graph.catalog import GraphCatalog

EMPTY_INFO = {"vertexLabels": [], "edgeLabels": [], "propertyKeys": [], "indexes": []}


class CacheFullError(Exception):
    pass


class CatalogCache:
    """Per-table catalog cache, capacity-bounded, error on full
    (SimpleCache.scala:24-58: no eviction — a full cache is an error)."""

    def __init__(self, capacity: int = 10):
        self.capacity = capacity
        self._items: dict[str, GraphCatalog] = {}

    def get(self, table_name: str) -> GraphCatalog:
        if table_name in self._items:
            return self._items[table_name]
        if len(self._items) >= self.capacity:
            raise CacheFullError(
                f"catalog cache full (capacity {self.capacity})"
            )
        cat = GraphCatalog(table_name)
        self._items[table_name] = cat
        return cat


def resolve_table_path(root: str, table_name: str) -> str:
    """Map a request-body tableName to a graph directory under ``root``.

    The tableName is an opaque table identifier (as in the reference,
    where it names a JanusGraph table), NOT a filesystem path — absolute
    paths, drive/URI prefixes, and ``..`` segments are rejected so a
    request can't probe arbitrary readable paths on the host
    (ADVICE r1: api.py path traversal)."""
    import os

    if not table_name:
        raise ValueError("tableName is required")
    if os.path.isabs(table_name) or "://" in table_name or "\\" in table_name:
        raise ValueError(f"tableName must be relative: {table_name!r}")
    parts = table_name.split("/")
    if any(p in ("", ".", "..") for p in parts):
        raise ValueError(f"tableName contains forbidden segments: {table_name!r}")
    return os.path.join(root, table_name)


def info_for(cache: CatalogCache, table_name: str, root: str = ".") -> dict:
    """The /info response; failures degrade to empty schema + error
    string rather than an HTTP error (MgmtApi.scala:46)."""
    try:
        import os

        path = resolve_table_path(root, table_name)
        if not os.path.exists(os.path.join(path, "catalog.json")):
            return {**EMPTY_INFO, "error": f"no catalog at {table_name}"}
        # success carries error = "" — the reference's InfoResponse default
        # (RequestResponse.scala:4), so migrating clients checking
        # error == "" keep working
        return {**cache.get(path).info(), "error": ""}
    except CacheFullError as e:
        return {**EMPTY_INFO, "error": str(e)}
    except Exception as e:  # noqa: BLE001 — degrade, never 500
        return {**EMPTY_INFO, "error": f"{type(e).__name__}: {e}"}


def make_server(
    host: str = "127.0.0.1",
    port: int = 0,
    cache_capacity: int = 10,
    root: str = ".",
):
    """Build (but don't start) the HTTP server; ``server.server_address``
    carries the bound port when port=0. ``root`` is the directory graph
    tables live under — tableName in request bodies is resolved against
    it and confined to it."""
    cache = CatalogCache(cache_capacity)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 — stdlib API
            if self.path.rstrip("/") != "/info":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(length) or b"{}")
                table = body.get("tableName", "")
            except (ValueError, json.JSONDecodeError):
                table = ""
            payload = json.dumps(info_for(cache, table, root=root)).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):  # quiet
            pass

    return ThreadingHTTPServer((host, port), Handler)


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="grafink-spark-api")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=9073)
    p.add_argument("--cache-capacity", type=int, default=10)
    p.add_argument(
        "--root", default=".", help="directory graph tables are resolved under"
    )
    args = p.parse_args(argv)
    server = make_server(args.host, args.port, args.cache_capacity, root=args.root)
    print(f"grafink-spark /info API on {server.server_address}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

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


def info_for(cache: CatalogCache, table_name: str) -> dict:
    """The /info response; failures degrade to empty schema + error
    string rather than an HTTP error (MgmtApi.scala:46)."""
    try:
        import os

        if not os.path.exists(os.path.join(table_name, "catalog.json")):
            return {**EMPTY_INFO, "error": f"no catalog at {table_name}"}
        return {**cache.get(table_name).info(), "error": None}
    except CacheFullError as e:
        return {**EMPTY_INFO, "error": str(e)}
    except Exception as e:  # noqa: BLE001 — degrade, never 500
        return {**EMPTY_INFO, "error": f"{type(e).__name__}: {e}"}


def make_server(host: str = "127.0.0.1", port: int = 0, cache_capacity: int = 10):
    """Build (but don't start) the HTTP server; ``server.server_address``
    carries the bound port when port=0."""
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
            payload = json.dumps(info_for(cache, table)).encode()
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
    args = p.parse_args(argv)
    server = make_server(args.host, args.port, args.cache_capacity)
    print(f"grafink-spark /info API on {server.server_address}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Key-value id store — the reference's alternative IDManager backend
(SURVEY §2 S10, the last coverage row).

Reference behavior (core/src/main/scala/com/astrolabsoftware/grafink/
hbase/HBaseClient.scala:90-147 and services/IDManager.scala:55-77): a KV
table keyed ``"{yyyy-MM-dd}-{graphTableName}"`` holds the day's valid
max vertex id under a (columnFamily, qualifier) cell; ``fetchID`` reads
that cell and fails with GetIdException when it is absent; a ``get``
against a missing table first creates the table
(createTableIfNotExists); ``put`` upserts one cell. The reference marks
the whole client "currently not being used in the job" — its production
path is the parquet-max-id IDManager that this engine implements in
``id_manager.py``.

Spark-first framing: on Spark the id store IS a table, so the parquet
backend stays the default. This module exists for (a) reference parity
and (b) deployments that already operate an external counter service:

- ``KVStore`` — the minimal client protocol (get / put / create table).
- ``FileKVStore`` — filesystem implementation through the Hadoop
  FileSystem API (fsutil), so the same code serves file://, hdfs:// and
  s3a:// URIs; one JSON file per table, atomic replace on put. Right
  for single-writer batch jobs (the reference's usage pattern — one
  daily job writes, readers read).
- ``HappyBaseKVStore`` — adapter for a real HBase cluster via the
  public ``happybase`` client, import-gated (not installed here).
- ``KVIDManager`` — fetch/store with the reference's key format and
  failure contract.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import date
from typing import Protocol

from pyspark.sql import SparkSession

from grafink_spark import fsutil
from grafink_spark.errors import GetIdException, GrafinkException


class KVStore(Protocol):
    """Minimal KV client surface (HBaseClient.scala:46-56)."""

    def get(self, table: str, row_key: str, cf: str, qualifier: str) -> str | None:
        """Value of one cell, or None when row/cell is absent. A missing
        table is created empty first (HBaseClient.scala:104-110)."""
        ...

    def put(self, table: str, row_key: str, cf: str, qualifier: str, value: str) -> None:
        ...

    def create_table_if_not_exists(self, table: str, cf: str) -> None:
        ...


class FileKVStore:
    """One JSON file per table under ``root``; cells stored HBase-style
    as ``{row_key: {"cf:qualifier": value}}``. All I/O goes through the
    Hadoop FileSystem API so remote URIs work; puts are atomic
    (tmp + delete-and-rename), which is all a single-writer daily batch
    job needs — concurrent writers should use a real KV service
    (HappyBaseKVStore)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def _table_path(self, table: str) -> str:
        if "/" in table or table.startswith("."):
            raise GrafinkException(f"invalid KV table name: {table!r}")
        return f"{self.root}/{table}.json"

    def _load(self, table: str) -> dict:
        raw = fsutil.read_text(self.spark, self._table_path(table))
        return json.loads(raw) if raw else {}

    def create_table_if_not_exists(self, table: str, cf: str) -> None:
        path = self._table_path(table)
        if not fsutil.exists(self.spark, path):
            fsutil.write_text(self.spark, path, "{}")

    def get(self, table: str, row_key: str, cf: str, qualifier: str) -> str | None:
        # reference get auto-creates a missing table (HBaseClient.scala:104)
        self.create_table_if_not_exists(table, cf)
        cell = self._load(table).get(row_key, {})
        return cell.get(f"{cf}:{qualifier}")

    def put(self, table: str, row_key: str, cf: str, qualifier: str, value: str) -> None:
        data = self._load(table)
        data.setdefault(row_key, {})[f"{cf}:{qualifier}"] = str(value)
        fsutil.write_text(self.spark, self._table_path(table), json.dumps(data))


class HappyBaseKVStore:
    """Real-HBase adapter over the public ``happybase`` Thrift client.
    Import-gated: this sandbox has no HBase, so constructing it without
    the library installed raises with a clear message; the protocol
    methods mirror FileKVStore so jobs swap backends via config only."""

    def __init__(self, host: str, port: int = 9090):
        try:
            import happybase  # noqa: F401
        except ImportError as e:  # pragma: no cover - env has no happybase
            raise GrafinkException(
                "HappyBaseKVStore requires the 'happybase' package and a "
                "reachable HBase Thrift server; install happybase or use "
                "FileKVStore"
            ) from e
        self._conn = happybase.Connection(host, port)  # pragma: no cover

    # pragma: no cover - exercised only against a live cluster
    def create_table_if_not_exists(self, table: str, cf: str) -> None:
        if table.encode() not in self._conn.tables():
            self._conn.create_table(table, {cf: {}})

    def get(self, table: str, row_key: str, cf: str, qualifier: str) -> str | None:
        self.create_table_if_not_exists(table, cf)
        row = self._conn.table(table).row(row_key.encode())
        v = row.get(f"{cf}:{qualifier}".encode())
        return v.decode() if v is not None else None

    def put(self, table: str, row_key: str, cf: str, qualifier: str, value: str) -> None:
        self._conn.table(table).put(
            row_key.encode(), {f"{cf}:{qualifier}".encode(): value.encode()}
        )


@dataclass
class KVIDManager:
    """fetchID against a KV backend (IDManager.scala:55-77).

    Key format ``"{yyyy-MM-dd}-{graphTableName}"`` (makeIdKey +
    PartitionManager.dateFormat, PartitionManager.scala:146); a missing
    cell raises GetIdException (exit code 3). ``store_id`` is the write
    side the reference leaves to an external process."""

    store: KVStore
    table: str = "IDManagement"  # idManager.hbase defaults (application.conf)
    cf: str = "cf1"
    qualifier: str = "id"

    def _key(self, day: date, graph_table: str) -> str:
        return f"{day.isoformat()}-{graph_table}"

    def fetch_id(self, day: date, graph_table: str) -> int:
        v = self.store.get(self.table, self._key(day, graph_table), self.cf, self.qualifier)
        if v is None:
            raise GetIdException(
                f"Error getting validId from table {self.table} for "
                f"{self._key(day, graph_table)}"
            )
        return int(v)

    def store_id(self, day: date, graph_table: str, value: int) -> None:
        self.store.put(
            self.table, self._key(day, graph_table), self.cf, self.qualifier, str(value)
        )


__all__ = ["KVStore", "FileKVStore", "HappyBaseKVStore", "KVIDManager"]

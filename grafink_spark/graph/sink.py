"""Pluggable graph-sink connectors.

The reference's production sink loads vertices/edges into JanusGraph
per-partition: each Spark partition opens a storage connection, iterates
its rows, and commits (core/.../processor/vertex/VertexProcessor.scala:203-219,
processor/EdgeProcessor.scala:151-187). This engine's default sink is
the parquet table write in :class:`GraphStore`, but the per-partition
connector shape is kept as a first-class extension point so a user can
bulk-load any external store (JanusGraph, HBase, a KV service) without
touching the load pipeline:

- :class:`GraphSink` — the interface ``GraphStore`` routes writes
  through when configured.
- :class:`ForeachPartitionSink` — adapter that hands each partition's
  rows to ``vertex_partition`` / ``edge_partition`` on the executors
  (``df.foreachPartition`` — the plan stays distributed; nothing is
  collected to the driver). Subclasses must be picklable: they are
  serialized to executors, so open connections lazily *inside* the
  partition callback, never in ``__init__``.

At 100 TB the write parallelism knobs stay in ``GraphStore`` (edge
repartition count from the reference's taskSize formula), so a
connector sees the same bounded-size, src-co-located partitions the
parquet sink writes.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Iterator

from pyspark.sql import DataFrame, Row


class GraphSink(ABC):
    """Destination for materialized graph batches.

    ``write_vertices`` receives one row per vertex (id, label +
    property columns); ``write_edges`` receives edge rows with both
    directions already materialized (src, dst, propVal, label,
    property_key + any bookkeeping tags), repartitioned by src."""

    @abstractmethod
    def write_vertices(self, df: DataFrame, label: str) -> None: ...

    @abstractmethod
    def write_edges(self, df: DataFrame, label: str) -> None: ...


class ForeachPartitionSink(GraphSink):
    """Per-partition bulk-load adapter (the reference's JanusGraph
    pattern): override ``vertex_partition`` / ``edge_partition`` with
    "open connection → iterate rows → commit" logic; each runs once per
    Spark partition on an executor."""

    def write_vertices(self, df: DataFrame, label: str) -> None:
        df.foreachPartition(self.vertex_partition)

    def write_edges(self, df: DataFrame, label: str) -> None:
        df.foreachPartition(self.edge_partition)

    @abstractmethod
    def vertex_partition(self, rows: Iterator[Row]) -> None: ...

    @abstractmethod
    def edge_partition(self, rows: Iterator[Row]) -> None: ...


class CallbackSink(ForeachPartitionSink):
    """ForeachPartitionSink from two plain callables — handy when the
    connector logic is a function rather than a class (tests, notebooks,
    quick integrations). The callables are shipped to executors via
    Spark's cloudpickle, so closures work; they must not capture
    unpicklable state (open sockets, SparkSession)."""

    def __init__(self, vertex_fn, edge_fn):
        self._vertex_fn = vertex_fn
        self._edge_fn = edge_fn

    def vertex_partition(self, rows: Iterator[Row]) -> None:
        self._vertex_fn(rows)

    def edge_partition(self, rows: Iterator[Row]) -> None:
        self._edge_fn(rows)

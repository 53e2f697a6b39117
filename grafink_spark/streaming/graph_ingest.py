"""Streaming graph construction — the reference's daily batch job as a
Structured Streaming pipeline.

The reference (Job.scala:71-115) runs once per day over yesterday's
partition. Here the same stages — consecutive id assignment, edge
classification against previously loaded vertices, graph-table sink —
run per microbatch via ``foreachBatch``: the streaming engine tracks
which input files are new (checkpointed), and each batch plays the role
of one "day".

Semantics match the batch job exactly because every stage already
distinguishes *loaded* (everything previously ingested, read from the
id store) from *current* (this batch): new×new and new×old edges both
materialize, ids continue consecutively from the store's max.

Delivery: the sinks append parquet, so a crashed-and-retried microbatch
can double-append (at-least-once). Exactly-once would wrap the batch in
a transactional table format; with plain parquet, dedup on (id) /
(src,dst,label) at read time or idempotent re-runs from a clean
checkpoint are the operational answers. The checkpoint guarantees no
input file is *skipped*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from grafink_spark.graph.catalog import GraphCatalog
from grafink_spark.graph.storage import GraphStore
from grafink_spark.id_manager import IDManager
from grafink_spark.rules.base import ClassifierRule


def stream_to_graph(
    stream: DataFrame,
    id_manager: IDManager,
    store: GraphStore,
    rules: list[ClassifierRule],
    checkpoint_path: str,
    vertex_label: str = "alert",
    available_now: bool = True,
):
    """Run a streaming DataFrame of alert-shaped rows into the graph
    store. Returns the StreamingQuery (already started; terminated
    before return when ``available_now``)."""
    catalog = GraphCatalog(store.root)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        loaded, current = id_manager.process(batch_df)
        catalog.create_vertex_label(vertex_label, df=current)
        store.write_vertices(current, label=vertex_label)
        for rule in rules:
            catalog.create_edge_label(rule.edge_label, rule.property_key, "String")
            edges = ClassifierRule.validate(rule.classify(loaded, current))
            store.write_edges(edges, rule)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.trigger(processingTime="30 seconds").start()
    return q

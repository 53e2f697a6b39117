"""Streaming ANN index maintenance: a vector stream appended into a
persisted IVF index.

The similarity-search twin of ``corpus_ingest``: each microbatch of new
embeddings is assigned to the index's EXISTING centroids
(``ivf_index_append`` — no retrain, no rewrite of resident lists) and
lands in the same ``list_id=`` partition directories, so probe-time
partition pruning is unchanged for readers; ``ivf_topk_indexed``
serves fresh vectors immediately after the batch commits. Exactly-once
via the batch-id tag + commit-marker replay guard shared with
corpus_ingest/graph_ingest: a replayed batch whose marker exists is
skipped, and a half-written batch's rows are purged (filter-and-swap)
before re-appending.

At scale: per microbatch the work is one centroid-matrix broadcast
assignment over the batch (batch-sized, not corpus-sized) + one
partitioned append — the per-batch cost is independent of the resident
index size. Centroids drift as the corpus grows; retrain with
``ivf_write_index`` when recall sags, as in any IVF serving stack.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafink_spark import fsutil
from grafink_spark.llm.simsearch import ivf_index_append
from grafink_spark.streaming.exactly_once import BATCH_COL, purge_batch_rows


def ingest_vectors_stream(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    available_now: bool = True,
):
    """Run the stream; each microbatch appends its centroid-assigned
    vectors to ``index_path`` (created beforehand by
    ``ivf_write_index``). Returns the query handle (already awaited
    when ``available_now``)."""
    spark = vec_stream.sparkSession
    vectors_path = f"{index_path}/vectors"

    def process(batch: DataFrame, batch_id: int) -> None:
        marker = os.path.join(
            index_path.rstrip("/") + "_commits", str(batch_id)
        )
        if fsutil.exists(spark, marker):
            return
        # null-safe shared purge: the initial ivf_write_index rows carry
        # no batch tag and must survive a crashed batch's cleanup
        purge_batch_rows(spark, vectors_path, batch_id, part_cols=["list_id"])
        ivf_index_append(
            spark,
            index_path,
            batch.withColumn(BATCH_COL, F.lit(batch_id)),
            vec_col=vec_col,
            id_col=id_col,
        )
        fsutil.touch(spark, marker)

    writer = vec_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()

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

BATCH_COL = "_ingest_batch_id"


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

    def _purge(batch_id: int) -> None:
        """Rewrite the vector store without a crashed attempt's tagged
        rows (filter-and-swap; runs only on replay)."""
        # mergeSchema: the store mixes the initial ivf_write_index files
        # (no batch column) with appended tagged files — default footer
        # sampling could miss BATCH_COL and silently skip the purge
        df = (
            spark.read.option("basePath", vectors_path)
            .option("mergeSchema", "true")
            .parquet(vectors_path)
        )
        if BATCH_COL not in df.columns:
            return
        if df.where(F.col(BATCH_COL) == batch_id).limit(1).count() == 0:
            return
        tmp = vectors_path.rstrip("/") + "__purge_tmp"
        df.where(F.col(BATCH_COL) != batch_id).write.partitionBy(
            "list_id"
        ).mode("overwrite").parquet(tmp)
        fsutil.swap(spark, tmp, vectors_path)

    def process(batch: DataFrame, batch_id: int) -> None:
        fsutil.complete_interrupted_swap(
            spark, vectors_path.rstrip("/") + "__purge_tmp", vectors_path
        )
        marker = os.path.join(
            index_path.rstrip("/") + "_commits", str(batch_id)
        )
        if fsutil.exists(spark, marker):
            return
        _purge(batch_id)
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

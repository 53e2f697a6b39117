"""Streaming corpus construction with incremental dedup.

The document twin of ``graph_ingest``: each microbatch of raw documents
is deduplicated against the corpus accumulated so far (exact dedup
within the batch → LSH+Jaccard against the stored corpus via
``drop_incremental_near_duplicates``) and only the survivors are
appended. The streaming engine's file tracking makes each input file
process exactly once; the batch_id tag + commit marker replay guard
mirrors graph_ingest's exactly-once recipe in its simplest form (skip
a batch whose marker exists; survivors of a half-written batch are
purged by the marker check because appends happen before the marker).

At scale: per microbatch the stored corpus is banded ONCE (one scan +
one shuffle keyed by band) and only candidate buckets do pairwise work
— the batch side is tiny, so the per-batch cost is ~corpus scan, the
same as any incremental index maintenance.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafink_spark import fsutil
from grafink_spark.llm.dedup import (
    drop_exact_duplicates,
    drop_incremental_near_duplicates,
)
from grafink_spark.streaming.exactly_once import BATCH_COL, purge_batch_rows


def ingest_corpus_stream(
    docs_stream: DataFrame,
    corpus_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    available_now: bool = True,
):
    """Run the stream; each microbatch appends its dedup survivors to
    ``corpus_path``. Returns the query handle (already awaited when
    ``available_now``)."""
    spark = docs_stream.sparkSession

    def process(batch: DataFrame, batch_id: int) -> None:
        # markers live BESIDE the parquet dir — the purge's swap
        # replaces corpus_path wholesale and must not eat them
        marker = os.path.join(
            corpus_path.rstrip("/") + "_commits", str(batch_id)
        )
        if fsutil.exists(spark, marker):
            return
        # shared null-safe purge (streaming/exactly_once.py): also
        # finishes a previous purge's interrupted swap before anything
        # reads (or concludes the absence of) the corpus; an externally
        # seeded corpus (untagged rows) survives a crashed batch
        purge_batch_rows(spark, corpus_path, batch_id)
        new = drop_exact_duplicates(batch, text_col, id_col)
        try:
            corpus = spark.read.parquet(corpus_path)
        except Exception as e:
            from grafink_spark.id_manager import _is_path_empty_error

            if not _is_path_empty_error(e):
                raise  # corrupt corpus must not silently skip dedup
            corpus = None
        if corpus is not None and not corpus.isEmpty():
            new = drop_incremental_near_duplicates(
                new, corpus, text_col, id_col, threshold=threshold
            )
        else:
            from grafink_spark.llm.dedup import drop_near_duplicates

            new = drop_near_duplicates(
                new, text_col, id_col, threshold=threshold
            )
        new.withColumn(BATCH_COL, F.lit(batch_id)).write.mode(
            "append"
        ).parquet(corpus_path)
        fsutil.touch(spark, marker)

    writer = (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()

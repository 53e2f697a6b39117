"""Document chunking for training-data preparation: split each document
into overlapping fixed-size token windows (the standard pre-tokenization
step before packing sequences into a context window).

Pure expression pipeline — tokens are staged once per row, chunk starts
come from ``sequence`` and the per-chunk text from ``slice``; the only
non-narrow cost is the explode's row multiplication (≈ n_tokens/stride
rows per document), which is the operator's output, not overhead. No
shuffle at all: chunking composes with a downstream repartition/pack
stage (see llm/corpus.py shard packing) without adding an exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """One row per (document, chunk): whitespace tokens ``[s, s+window)``
    for each start ``s`` in ``0, stride, 2·stride, … < n_tokens``. The
    final chunk is the partial tail (``n_chunk_tokens < window``) unless
    the token count lands exactly on a stride boundary.

    Columns: ``id_col, chunk_id, n_chunk_tokens, chunk_text`` where
    ``chunk_id = s / stride`` (dense, 0-based, per document).

    ``window > stride`` gives overlapping chunks (the usual setting so
    no boundary context is lost); ``window == stride`` is exact
    partitioning.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    staged = df.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    )
    exploded = staged.select(
        id_col,
        "_toks",
        F.posexplode(
            F.sequence(
                F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(stride)
            )
        ).alias("chunk_id", "_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, F.lit(window))
    return exploded.select(
        id_col,
        "chunk_id",
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )

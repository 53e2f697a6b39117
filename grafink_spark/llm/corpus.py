"""End-to-end training-corpus preparation — the composition a 100 TB
pipeline actually runs, built entirely from the engine's own operators:

    exact dedup → quality filter → language filter → near-dup drop
    → per-doc token accounting

Plan shape: stages 1-3 are one groupBy(md5) plus pure projections (no
extra shuffle beyond the dedup); stage 4 is the single-shuffle LSH +
candidate-verify + component pipeline from ``dedup.py``, run over the
already-shrunk survivor set (filter-first ordering is the point — at
scale quality/lang drop most rows before any pairwise work happens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafink_spark.llm.dedup import drop_exact_duplicates, drop_near_duplicates
from grafink_spark.llm.text import lang_id, quality_score


def prepare_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.75,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Surviving documents with (doc_id, lang_pred, n_tokens,
    quality_score) — ready for tokenization/packing."""
    base_cols = df.columns
    deduped = drop_exact_duplicates(df, text_col, id_col)
    scored = quality_score(deduped, text_col).where(
        F.col("quality_score") >= min_quality
    )
    tagged = lang_id(scored, text_col).where(F.col("lang_pred").isin(*langs))
    # the survivor set feeds the LSH pipeline, the component losers
    # anti-join, and the final projection — cache it once (the filters
    # upstream are the expensive expressions: quality regexes + 4-lang
    # stopword votes)
    tagged = tagged.cache()
    kept_ids = drop_near_duplicates(
        tagged.select(*base_cols),
        text_col,
        id_col,
        threshold=jaccard_threshold,
    ).select(id_col)
    return tagged.join(kept_ids, id_col).select(
        id_col, "lang_pred", "n_tokens", "quality_score"
    )

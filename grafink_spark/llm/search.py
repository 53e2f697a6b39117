"""BM25 keyword search over a document corpus.

The reference's read surface is graph lookups; a training-data engine
also needs corpus retrieval (inspect dedup clusters, pull eval-leak
suspects, spot-check quality buckets). Classic BM25 (Robertson et al.),
k1/b defaults from Lucene.

Scale/determinism design:
- Query terms are a small LITERAL list, so per-doc term frequencies are
  row-local array counts (size∘filter) — no explode, no shuffle; a doc
  never leaves its partition until the top-k.
- Corpus stats (N, avgdl) and per-term document frequencies come from
  ONE 1-row global aggregate, broadcast back — so the whole query is
  two corpus passes (stats, score) with no wide shuffle at all.
- The per-doc score sums term contributions in FIXED query order (a
  static expression, not a data-ordered aggregate), and every aggregate
  input is an exact integer in double range, so the floating-point
  result is reproducible and the DuckDB oracle matches bitwise.
- Top-k goes through orderBy(...).limit(k) — Spark's distributed
  TakeOrderedAndProject, no single-task global sort; ranks are then
  assigned on the k survivors only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def bm25_search(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k (id, score, rank) for a bag-of-words query; ties break to
    the lowest id. Documents matching no query term never surface."""
    qterms = list(dict.fromkeys(query.lower().split()))
    if not qterms:
        raise ValueError("empty query")

    staged = docs.select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("__toks"),
    ).select(id_col, F.size("__toks").alias("dl"), F.col("__toks"))

    def _count_of(t: str):
        # one-arg lambda only: a second parameter would receive the
        # array index from F.filter, not this closure's term
        return F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(t)))

    tf = staged.select(
        id_col,
        "dl",
        *[_count_of(t).alias(f"tf_{i}") for i, t in enumerate(qterms)],
    )
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(qterms))
        ],
    )

    any_hit = None
    for i in range(len(qterms)):
        h = F.col(f"tf_{i}") > 0
        any_hit = h if any_hit is None else any_hit | h
    scored = tf.where(any_hit).crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(qterms)):
        tf_i = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
            + 1.0
        )
        denom = tf_i + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        term_score = idf * (tf_i * (k1 + 1.0)) / denom
        score = term_score if score is None else score + term_score
    topk = (
        scored.select(id_col, score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return topk.select(
        id_col, "score", F.row_number().over(w).alias("rank")
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Materialize the corpus inverted index: one row per token with
    (token, df, total_tf, postings), postings being the doc-sorted
    "id:tf" list rendered as a string (engine-portable; a real sink
    would keep the array<struct> form).

    Scale design: per-doc term frequencies aggregate BEFORE the posting
    build (explode → groupBy(id, token)), so the token shuffle carries
    one row per (doc, distinct term), not per occurrence; the posting
    list then assembles with ONE groupBy(token). Stopword-token rows
    are the classic hot keys — their postings lists are large but each
    is a single aggregation value built via map-side partial
    collect_list; a production sink would cap or shard giant postings
    (Lucene's skip lists), noted here as the extension point.
    """
    tf = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_id", "tf"))),
                    lambda s: F.concat_ws(
                        ":", s["_id"].cast("string"), s["tf"].cast("string")
                    ),
                ),
            ).alias("postings"),
        )
        .where(F.col("df") >= min_df)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_n: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N rankings (the standard hybrid-
    retrieval combiner, Cormack et al.): fused(d) = Σ_i 1/(k + rank_i(d))
    over the lists that contain d. Rank-based, so BM25 and cosine
    scores need no calibration against each other.

    Determinism: each list's contribution is extracted with a tagged
    max() and the terms are added in FIXED list order — double addition
    is not associative, so a bag-style sum() over the union would be
    partition-order dependent. One union + one hash agg; with top_n,
    the final rank filter compiles to WindowGroupLimit.

    Returns (id, rrf_score, rank) — rank only when ``top_n`` is set."""
    if not rankings:
        raise ValueError("need at least one ranking")
    tagged = None
    for i, r in enumerate(rankings):
        t = r.select(
            F.col(id_col).alias("_id"),
            F.lit(i).alias("_src"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias("_c"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    per_src = tagged.groupBy("_id").agg(
        *[
            F.max(F.when(F.col("_src") == i, F.col("_c"))).alias(f"_c{i}")
            for i in range(len(rankings))
        ]
    )
    score = None
    for i in range(len(rankings)):
        term = F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
        score = term if score is None else (score + term)
    out = per_src.select(
        F.col("_id").alias(id_col), score.alias("rrf_score")
    )
    if top_n is None:
        return out
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
    )

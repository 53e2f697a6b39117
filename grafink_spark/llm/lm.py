"""Statistical n-gram LM quality scoring (CCNet-style).

CCNet filters web text by perplexity under a language model; the
distributed analogue trains a bigram LM *on the corpus itself* (or any
reference corpus) and scores every document by its mean log-probability
— fluent/common text scores high, gibberish and boilerplate-mangled
text score low. Everything is DataFrame expressions + equi joins; no
Python in the data path.

Model: add-alpha-smoothed bigram conditional

    P(w2 | w1) = (c(w1 w2) + alpha) / (c(w1 ·) + alpha * V)

with V the unigram vocabulary size. A document's score is the mean of
ln P over its bigrams, accumulated in position order so the result is
bit-deterministic (and reproducible by the SQL oracle).

Scale design (100 TB corpus):

- Training is two hash aggregations (bigram counts, then the w1
  marginal from the bigram table — never a second corpus pass).
- Scoring joins doc-bigrams to the count tables on (w1, w2) / (w1).
  The LM table scales with DISTINCT bigrams, not corpus size, but its
  hot keys (stopword bigrams) are exactly the high-frequency rows —
  leave AQE skew-join on, or pre-broadcast the top-K rows if the
  count table fits memory after a frequency cutoff.
- The per-doc fold is collect_list bounded by document length — the
  same per-row bound every array op in this package carries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from grafink_spark.llm.text import tokens


def _doc_bigrams(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, pos, w1, w2) — one row per adjacent token pair; documents
    with fewer than two tokens contribute nothing."""
    t = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_t")
    )
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("_t") - 2),
        lambda i: F.struct(
            F.element_at("_t", i + 1).alias("w1"),
            F.element_at("_t", i + 2).alias("w2"),
        ),
    )
    return t.where(F.size("_t") >= 2).select(
        "_id", F.posexplode(pairs).alias("pos", "bg")
    ).select("_id", "pos", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def bigram_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus bigram table (w1, w2, c12) — one shuffle on the pair key."""
    return (
        _doc_bigrams(df, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )


def vocab_size(df: DataFrame, text_col: str = "text") -> int:
    """Distinct-unigram count over the corpus."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .agg(F.countDistinct("w"))
        .first()[0]
    )


def lm_score(
    df: DataFrame,
    train: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
) -> DataFrame:
    """(id, n_bigrams, avg_logp): mean ln P(w2|w1) per document under
    the add-alpha bigram LM trained on ``train`` (default: ``df``
    itself — self-perplexity, the CCNet quality signal).

    avg_logp accumulates in position order (sorted fold), so the value
    is independent of partitioning and matches the SQL oracle bitwise
    before rounding."""
    train = train if train is not None else df
    c12 = bigram_counts(train, text_col, id_col)
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = vocab_size(train, text_col)

    bg = _doc_bigrams(df, text_col, id_col)
    scored = (
        bg.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .select(
            "_id",
            "pos",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.lit(float(v)))
            ).alias("logp"),
        )
    )
    ordered: Column = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "logp"))),
        lambda s: s["logp"],
    )
    total = F.aggregate(
        ordered, F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (total / F.count(F.lit(1))).alias("avg_logp"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_bigrams",
            "avg_logp",
        )
    )


def perplexity_bucket_filter(
    docs: DataFrame,
    group_col: str = "lang",
    buckets: int = 3,
    keep: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
) -> DataFrame:
    """CCNet-style perplexity-bucket quality filter (Wenzek et al.,
    2020): score every document with the add-alpha bigram LM
    (:func:`lm_score`), split each ``group_col`` group (language) into
    ``buckets`` equal-depth tiles by score — bucket 1 = head (highest
    mean log-prob = lowest perplexity) — and keep buckets ``<= keep``
    (head + middle; the tail is the noisy web slop CCNet drops).

    Buckets rank on the ROUNDED score (6 dp) so the tiling is immune to
    cross-engine libm ulp drift in ln(); ties break on doc id. One
    vocabulary-sized model shuffle (inherited from lm_score) plus one
    per-group window shuffle — no pairwise work, scales linearly.
    Documents with no bigrams (< 2 tokens) are unscorable and drop, as
    in CCNet."""
    from pyspark.sql import Window

    scored = lm_score(docs, text_col=text_col, id_col=id_col, alpha=alpha)
    j = scored.select(
        id_col, F.round("avg_logp", 6).alias("avg_logp")
    ).join(docs.select(id_col, group_col), id_col)
    w = Window.partitionBy(group_col).orderBy(
        F.col("avg_logp").desc(), F.col(id_col).asc()
    )
    return (
        j.withColumn("bucket", F.ntile(buckets).over(w))
        .where(F.col("bucket") <= keep)
        .select(id_col, group_col, "avg_logp", "bucket")
    )

"""Multinomial Naive Bayes text classification — model TRAINING as a
DataFrame program.

The quality/language classifiers in LLM data pipelines (fastText-style
filters) are trained on corpus-scale token statistics; multinomial NB
is the count-based member of that family and its training IS a pair of
hash aggregations, so the whole train+score loop stays inside Catalyst
with no Python and no driver-side model object beyond two scalars:

    P(c)    = docs_c / N
    P(w|c)  = (count(w,c) + alpha) / (count(*,c) + alpha * V)
    score(d,c) = ln P(c) + sum_w tf(w,d) * ln P(w|c)

Scale design (100 TB corpus):
- Training: one token explode + groupBy(class, token) — partial
  aggregation collapses the shuffle to the distinct (class, token)
  table, which scales with vocabulary, not corpus size.
- Scoring: doc-term frequencies cross-joined with the (tiny,
  broadcast) class table, then an equi join to the likelihood table
  on (class, token) — AQE's skew handling covers hot stopword keys.
- The per-(doc, class) sum folds in sorted token order
  (collect_list + aggregate, the same trick as llm/lm.py), so scores
  are bit-deterministic under any partitioning and the SQL oracle
  reproduces them exactly; argmax inherits that determinism with a
  min-label tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafink_spark.util import pin

from grafink_spark.llm.text import tokens


def nb_classify(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    train: DataFrame | None = None,
) -> DataFrame:
    """(id, pred, score): most probable class per document under a
    multinomial NB model trained on ``train`` (default: ``df`` itself —
    resubstitution, the smoke-test mode; pass a held-out frame for real
    evaluation). ``score`` is the winning class's log-posterior (up to
    the shared evidence constant). Ties break to the smaller label.
    Documents with no tokens produce no row."""
    train = train if train is not None else df
    tok_tr = train.select(
        F.col(label_col).alias("_c"), F.explode(tokens(text_col)).alias("_w")
    )
    # the (class, token) count table is the trained model — materialize
    # it ONCE (localCheckpoint): tot, the vocab count, and the scoring
    # join below all consume it, and without the pin each consumer
    # would re-run the corpus-scale token explode
    twc = (
        tok_tr.groupBy("_c", "_w")
        .agg(F.count(F.lit(1)).alias("_cwc"))
        .transform(pin)
    )
    tot = twc.groupBy("_c").agg(F.sum("_cwc").alias("_totc"))
    v = twc.select("_w").distinct().count()
    # doc counts: one cheap (non-explode) pass; N derives from the
    # collected per-class rows instead of a separate full count()
    counts = (
        train.groupBy(F.col(label_col).alias("_c"))
        .agg(F.count(F.lit(1)).alias("_nd"))
        .collect()
    )
    n = sum(r["_nd"] for r in counts)
    nd = train.sparkSession.createDataFrame(counts)
    classes = tot.join(nd, "_c").select(
        "_c", "_totc", F.log(F.col("_nd") / F.lit(float(n))).alias("_lnprior")
    )

    dt = (
        df.select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("_w"))
        .groupBy("_id", "_w")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    contrib = F.col("_tf").cast("double") * F.log(
        (F.coalesce(F.col("_cwc"), F.lit(0)) + F.lit(alpha))
        / (F.col("_totc") + F.lit(alpha) * F.lit(float(v)))
    )
    terms = (
        dt.crossJoin(F.broadcast(classes))
        .join(twc, ["_c", "_w"], "left")
        .select("_id", "_c", "_w", "_lnprior", contrib.alias("_lp"))
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("_w", "_lp"))),
        lambda s: s["_lp"],
    )
    folded = F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x)
    per_class = terms.groupBy("_id", "_c").agg(
        (F.first("_lnprior") + folded).alias("_score")
    )
    best = F.min_by(
        F.struct(F.col("_c"), F.col("_score")),
        F.struct((-F.col("_score")).alias("_n"), F.col("_c")),
    )
    return (
        per_class.groupBy("_id")
        .agg(best.alias("_b"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_b._c").alias("pred"),
            F.col("_b._score").alias("score"),
        )
    )

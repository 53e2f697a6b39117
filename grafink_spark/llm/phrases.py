"""BPE-style phrase mining: iterative most-frequent-adjacent-pair
merging over the corpus's token streams — the token-level shape of
byte-pair-encoding tokenizer training (Sennrich et al., 2016), run as
a DataFrame program.

Each round: (1) count adjacent token pairs corpus-wide (one explode +
hash agg — partial-aggregates to the distinct-pair table), (2) pick
the most frequent pair (count desc, then lexicographic — fully
deterministic), (3) rewrite every document's token array with a
greedy LEFT-TO-RIGHT fold that replaces each non-overlapping
occurrence ("a b a b a" → "a_b a_b a", exactly canonical BPE's greedy
merge order). The fold is a Catalyst ``aggregate`` over the array —
no Python — and the SQL oracle replays it with DuckDB's
``list_reduce`` using the identical CASE, so every intermediate corpus
state is engine-identical.

Scale: per round, the pair count is the only corpus-wide shuffle; the
chosen pair is a 1-row driver scalar; the rewrite is a narrow map.
``localCheckpoint`` per round pins the rewritten arrays (the fold
chain would otherwise re-execute cumulatively). Rounds are inherently
sequential — that's BPE; production tokenizers batch thousands of
merges, here k stays small and each round is one cheap pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafink_spark.util import pin

from grafink_spark.llm.text import tokens


def _merge_pair(arr, w1: str, w2: str, merged: str):
    """Greedy left-to-right replacement of adjacent (w1, w2) in a token
    array — pure expressions (slice/concat fold)."""
    init = F.slice(arr, 1, 1)
    rest = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
    folded = F.aggregate(
        rest,
        init,
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == w1) & (x == F.lit(w2)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.when(F.size(arr) == 0, arr).otherwise(folded)


def phrase_merge(
    docs: DataFrame,
    rounds: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "_",
) -> DataFrame:
    """(id, toks) after ``rounds`` BPE-style merges of the corpus's
    most frequent adjacent token pair (joined with ``sep``)."""
    cur = docs.select(
        F.col(id_col).alias("_id"), tokens(text_col).alias("_t")
    ).transform(pin)
    for _ in range(rounds):
        # docs with < 2 tokens contribute no pairs (sequence(1, 0)
        # would generate DESCENDING indices — filter, don't clamp)
        pairs = (
            cur.where(F.size("_t") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("_t") - 1),
                        lambda i: F.struct(
                            F.element_at("_t", i).alias("w1"),
                            F.element_at("_t", i + 1).alias("w2"),
                        ),
                    )
                ).alias("p")
            )
            .groupBy("p.w1", "p.w2")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        top = pairs.orderBy(
            F.col("_c").desc(), F.col("w1").asc(), F.col("w2").asc()
        ).first()
        if top is None or top["_c"] < 2:
            break
        w1, w2 = top["w1"], top["w2"]
        cur = cur.select(
            "_id", _merge_pair(F.col("_t"), w1, w2, f"{w1}{sep}{w2}").alias("_t")
        ).transform(pin)
    return cur.select(F.col("_id").alias(id_col), F.col("_t").alias("toks"))


def learn_merges(
    docs: DataFrame,
    rounds: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "_",
) -> list[tuple[str, str, str]]:
    """Learn an ordered BPE merge list ``[(w1, w2, merged), ...]`` from
    ``docs`` — the training half of the tokenizer train/apply split.
    Identical round semantics to :func:`phrase_merge` (most frequent
    adjacent pair, count desc then lexicographic, greedy left-to-right
    rewrite between rounds, stop when no pair repeats); the learned
    merges are driver-side scalars, so applying them elsewhere needs no
    join against the training corpus."""
    cur = docs.select(
        F.col(id_col).alias("_id"), tokens(text_col).alias("_t")
    ).transform(pin)
    merges: list[tuple[str, str, str]] = []
    for _ in range(rounds):
        pairs = (
            cur.where(F.size("_t") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("_t") - 1),
                        lambda i: F.struct(
                            F.element_at("_t", i).alias("w1"),
                            F.element_at("_t", i + 1).alias("w2"),
                        ),
                    )
                ).alias("p")
            )
            .groupBy("p.w1", "p.w2")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        top = pairs.orderBy(
            F.col("_c").desc(), F.col("w1").asc(), F.col("w2").asc()
        ).first()
        if top is None or top["_c"] < 2:
            break
        w1, w2 = top["w1"], top["w2"]
        merges.append((w1, w2, f"{w1}{sep}{w2}"))
        cur = cur.select(
            "_id", _merge_pair(F.col("_t"), w1, w2, f"{w1}{sep}{w2}").alias("_t")
        ).transform(pin)
    return merges


def apply_merges(
    docs: DataFrame,
    merges: list[tuple[str, str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply an ordered merge list (from :func:`learn_merges`) to a
    corpus — the tokenizer-apply step. Pure narrow map: every merge is
    the same greedy left-to-right Catalyst fold the trainer used, chained
    in merge order with no shuffle and no join (the merge table rides in
    the expression tree as literals). For production-sized merge lists
    (thousands), checkpoint every ~8 merges to bound expression depth —
    here k stays small by construction."""
    out = docs.select(
        F.col(id_col).alias("_id"), tokens(text_col).alias("_t")
    )
    for w1, w2, merged in merges:
        out = out.select(
            "_id", _merge_pair(F.col("_t"), w1, w2, merged).alias("_t")
        )
    return out.select(F.col("_id").alias(id_col), F.col("_t").alias("toks"))

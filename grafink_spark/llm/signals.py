"""Gopher-style repetition and document-shape signals.

The reference engine is an alert-graph builder with no text layer
(grafink `core/src/main/scala/com/astrolabsoftware/grafink/processor/`
stops at classifier rules); these are the standard large-corpus quality
filters (Rae et al. 2021, "Scaling Language Models ... Gopher",
appendix A1.1) an LLM training-data pipeline runs alongside dedup:
duplicate-line fractions, bullet/ellipsis line shape, and n-gram
repetition (top-gram and duplicated-gram occupancy).

Scale notes: line/word signals are pure per-row expressions — narrow,
no shuffle, whole-stage codegen. N-gram repetition explodes tagged
(id, n, gram) rows from a SINGLE scan (one flatten of per-n transforms,
one explode) and aggregates with two keyed shuffles, both with map-side
partial aggregation; the only skew bound is document length itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

BULLET_PREFIXES = ("- ", "* ", "• ")


def _safe_frac(num: Column, den: Column) -> Column:
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def line_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document line-shape features, computed row-local:
    n_lines, dup_line_fraction (1 - distinct/total), bullet_line_fraction
    (lines starting with -, * or a bullet), ellipsis_line_fraction
    (lines ending in ...)."""
    staged = df.select("*", F.split(F.col(text_col), "\n").alias("__lines"))
    lines = F.col("__lines")
    n = F.size(lines)
    is_bullet = lambda l: (  # noqa: E731
        l.startswith(BULLET_PREFIXES[0])
        | l.startswith(BULLET_PREFIXES[1])
        | l.startswith(BULLET_PREFIXES[2])
    )
    return staged.select(
        *df.columns,
        n.alias("n_lines"),
        _safe_frac(n - F.size(F.array_distinct(lines)), n).alias(
            "dup_line_fraction"
        ),
        _safe_frac(F.size(F.filter(lines, is_bullet)), n).alias(
            "bullet_line_fraction"
        ),
        _safe_frac(
            F.size(F.filter(lines, lambda l: l.endswith("..."))), n
        ).alias("ellipsis_line_fraction"),
    )


def gram_array(toks: Column, n: int) -> Column:
    """Array of space-joined n-grams over a token array ([] if too short).
    The sequence() is guarded: Spark's sequence(1, 0) counts DOWN."""
    if n == 1:
        return toks
    joined = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        joined
    )


def ngram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """(id, n, gram, cnt) occurrence counts for every requested n-gram
    order, from one scan: the per-n gram arrays are tagged with n,
    flattened, and exploded once."""
    staged = df.select(F.col(id_col), tokens(text_col).alias("__toks"))

    def _tag(n: int):
        # NB: the lambda must take exactly one arg — a second parameter
        # would make F.transform pass the array index into it
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.flatten(
        F.array(
            *[
                F.transform(gram_array(F.col("__toks"), n), _tag(n))
                for n in ns
            ]
        )
    )
    exploded = staged.select(id_col, F.explode(tagged).alias("__g")).select(
        id_col, F.col("__g.n").alias("n"), F.col("__g.gram").alias("gram")
    )
    return exploded.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def _run_stats(grams: Column) -> Column:
    """struct(top, dup, total) gram-occurrence stats, computed ROW-LOCAL:
    sort the gram array, then one fold counts run lengths — top = longest
    run, dup = occurrences inside runs longer than 1. Equivalent to the
    explode→count→rollup values with zero data movement; per-row cost is
    O(g log g) in the doc's own gram count."""
    sorted_g = F.array_sort(grams)
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("top"),
        zero.alias("dup"),
    )

    def step(acc: Column, g: Column) -> Column:
        same = acc["prev"] == g
        closed_top = F.greatest(acc["top"], acc["run"])
        closed_dup = acc["dup"] + F.when(
            acc["run"] > 1, acc["run"]
        ).otherwise(zero)
        return F.struct(
            g.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["top"]).otherwise(closed_top).alias("top"),
            F.when(same, acc["dup"]).otherwise(closed_dup).alias("dup"),
        )

    def finish(acc: Column) -> Column:
        return F.struct(
            F.greatest(acc["top"], acc["run"]).alias("top"),
            (
                acc["dup"]
                + F.when(acc["run"] > 1, acc["run"]).otherwise(zero)
            ).alias("dup"),
            F.size(grams).cast("long").alias("total"),
        )

    return F.aggregate(sorted_g, init, step, finish)


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Per-document n-gram repetition: for each order n,
    top_{n}gram_fraction (occurrences of the most frequent gram / total
    occurrences) and dup_{n}gram_fraction (occurrences of grams seen
    more than once / total). Documents with no tokens get 0.0.

    Entirely row-local (sorted run-length folds over the gram arrays) —
    no explode, no shuffle, no join; the earlier explode→groupBy→join
    formulation shuffled every gram occurrence twice."""
    staged = df.select("*", tokens(text_col).alias("__toks"))
    stats = staged.select(
        "*",
        *[
            _run_stats(gram_array(F.col("__toks"), n)).alias(f"__st_{n}")
            for n in ns
        ],
    )
    frac_cols = []
    for n in ns:
        st = F.col(f"__st_{n}")
        for which in ("top", "dup"):
            frac_cols.append(
                F.when(st["total"] > 0, st[which] / st["total"])
                .otherwise(F.lit(0.0))
                .alias(f"{which}_{n}gram_fraction")
            )
    return stats.select(*df.columns, *frac_cols)


def document_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Line-shape + n-gram repetition signals in one DataFrame."""
    return repetition_signals(
        line_signals(df, text_col), id_col, text_col, ns
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_tokens: int = 100000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    max_dup_line: float = 0.3,
    max_bullet_line: float = 0.9,
    max_ellipsis_line: float = 0.3,
) -> DataFrame:
    """Gopher-rules document filter (Rae et al. 2021, Table A1 defaults):
    token-count band, mean word length band, ≥ fraction of words with an
    alphabetic character, ≥ 2 distinct stopwords, and the line-shape
    caps (duplicate / bullet / ellipsis lines). Survivors only, with the
    deciding metrics attached. One row-local projection pass composed
    with :func:`line_signals` — every fraction is an exact int/int
    division, so the threshold decisions are engine-identical."""
    from .text import DEFAULT_STOPWORDS

    staged = line_signals(df, text_col).select(
        "*", tokens(text_col).alias("__t")
    )
    t = F.col("__t")
    n = F.size(t)
    mean_len = F.when(
        n > 0,
        F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        / n,
    ).otherwise(F.lit(0.0))
    # Case-fold once: Gopher's Table A1 rules are case-insensitive —
    # all-caps words still count as alphabetic, and sentence-initial
    # capitalized stopwords ('The') must hit the (lowercase) stoplist.
    tl = F.transform(t, F.lower)
    alpha_frac = _safe_frac(
        F.size(F.filter(tl, lambda x: x.rlike("[a-z]"))), n
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(tl),
            F.array(*[F.lit(w) for w in DEFAULT_STOPWORDS]),
        )
    )
    keep = (
        (n >= min_tokens)
        & (n <= max_tokens)
        & (mean_len >= min_word_len)
        & (mean_len <= max_word_len)
        & (alpha_frac >= min_alpha_frac)
        & (n_stop >= min_stopwords)
        & (F.col("dup_line_fraction") <= max_dup_line)
        & (F.col("bullet_line_fraction") <= max_bullet_line)
        & (F.col("ellipsis_line_fraction") <= max_ellipsis_line)
    )
    return (
        staged.where(keep)
        .select(
            id_col,
            n.cast("long").alias("n_tokens"),
            mean_len.alias("mean_word_len"),
            n_stop.cast("long").alias("n_stopwords"),
        )
    )

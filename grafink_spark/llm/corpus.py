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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grafink_spark.llm.dedup import drop_exact_duplicates, drop_near_duplicates
from grafink_spark.llm.text import lang_id, quality_score
from pyspark.sql import types as T

from grafink_spark.util import pin


def prepare_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.75,
    jaccard_threshold: float = 0.5,
    max_dup_3gram: float | None = None,
    benchmark: DataFrame | None = None,
    contam_ngram: int = 8,
) -> DataFrame:
    """Surviving documents with (doc_id, lang_pred, n_tokens,
    quality_score) — ready for tokenization/packing.

    Optional stages (both run BEFORE the pairwise near-dup work, so
    they shrink the expensive part): ``max_dup_3gram`` drops documents
    whose duplicated-3-gram occupancy exceeds the bound (Gopher
    repetition rule); ``benchmark`` drops documents sharing any
    ``contam_ngram``-gram with that eval set (decontamination)."""
    base_cols = df.columns
    deduped = drop_exact_duplicates(df, text_col, id_col)
    scored = quality_score(deduped, text_col).where(
        F.col("quality_score") >= min_quality
    )
    tagged = lang_id(scored, text_col).where(F.col("lang_pred").isin(*langs))
    if max_dup_3gram is not None:
        from grafink_spark.llm.signals import repetition_signals

        tagged = repetition_signals(tagged, id_col, text_col, ns=(3,)).where(
            F.col("dup_3gram_fraction") <= max_dup_3gram
        ).drop("top_3gram_fraction", "dup_3gram_fraction")
    if benchmark is not None:
        tagged = decontaminate(
            tagged, benchmark, id_col, text_col, n=contam_ngram
        )
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


def assign_offsets(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    out_col: str = "_start",
) -> DataFrame:
    """Exclusive running token offset per row in ``order_col`` order —
    the global-cumsum primitive under shard packing AND sequence
    packing.

    Scale shape: a running sum needs global order, but a single global
    window would serialize. Instead: range-repartition + local sort
    (localCheckpoint pins the sampled layout), per-partition token sums
    (one tiny aggregate), then an Arrow ``mapInPandas`` adds the
    broadcast partition offset to a vectorized local cumsum — no
    shuffle beyond the range partitioning, no single-partition stage."""
    d = (
        df.repartitionByRange(F.col(order_col))
        .sortWithinPartitions(order_col)
        .transform(pin)
    )
    tagged = d.withColumn("_pid", F.spark_partition_id())
    sums = {
        r["_pid"]: r["_s"]
        for r in tagged.groupBy("_pid").agg(F.sum(tokens_col).alias("_s")).collect()
    }
    offsets, running = {}, 0
    for pid in sorted(sums):
        offsets[pid] = running
        running += sums[pid] or 0

    out_schema = T.StructType(
        list(d.schema.fields) + [T.StructField(out_col, T.LongType())]
    )
    cols = [f.name for f in out_schema.fields]

    def run(batches):
        start = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if start is None:
                start = offsets[int(pdf["_pid"].iloc[0])]
            cs = pdf[tokens_col].cumsum() + start
            start = int(cs.iloc[-1])
            out = pdf.copy()
            out[out_col] = (cs - pdf[tokens_col]).astype("int64")
            yield out.drop(columns=["_pid"])[cols]

    return tagged.mapInPandas(run, out_schema)


def assign_shards(
    df: DataFrame,
    budget_tokens: int,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> DataFrame:
    """Pack documents (in ``order_col`` order) into training shards of
    ≈ ``budget_tokens`` tokens: shard_id = floor(running_total_before /
    budget) — the standard offset-bin packing, built on
    :func:`assign_offsets`."""
    out = assign_offsets(df, tokens_col, order_col)
    # SQL `div` = exact integral division on longs; the double-division
    # form ((_start / b).cast long) loses integer precision past 2^53
    # cumulative tokens and can land a boundary doc in the wrong bin
    return out.withColumn(
        "shard_id", F.expr(f"_start div {int(budget_tokens)}")
    ).drop("_start")


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> DataFrame:
    """Pretraining sequence packing: documents stream (in ``order_col``
    order) into fixed ``seq_len``-token training sequences; a document
    crossing a boundary SPLITS — one output row per (doc, sequence)
    piece with its position:

      (… input cols …, seq_id, begin_in_seq, n_taken, piece)

    ``piece`` numbers a doc's fragments 0..k; Σ n_taken per doc equals
    its token count, and Σ n_taken per seq_id is exactly ``seq_len``
    (except the final partial sequence) — the attention-mask /
    position-id layout every packed-pretraining loader needs. Built on
    :func:`assign_offsets` (no global window) + a narrow per-row
    sequence explode over the spanned sequences. Zero-token docs
    produce no pieces."""
    out = assign_offsets(df, tokens_col, order_col)
    n = F.col(tokens_col)
    # exact integral division (SQL `div`) — see assign_shards
    first = F.expr(f"_start div {int(seq_len)}")
    last = F.expr(f"(_start + `{tokens_col}` - 1) div {int(seq_len)}")
    exploded = out.where(n > 0).select(
        "*", F.explode(F.sequence(first, last)).alias("seq_id")
    )
    p_begin = F.greatest(F.col("_start"), F.col("seq_id") * seq_len)
    p_end = F.least(
        F.col("_start") + n, (F.col("seq_id") + 1) * F.lit(seq_len)
    )
    return exploded.select(
        *[c for c in df.columns],
        "seq_id",
        (p_begin - F.col("seq_id") * seq_len).cast("long").alias("begin_in_seq"),
        (p_end - p_begin).cast("long").alias("n_taken"),
        (F.col("seq_id") - first).cast("long").alias("piece"),
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic hash-based stratified sampling: a row survives iff
    the first 4 hex digits of md5(id) fall under its stratum's fraction
    of 0xFFFF. Reproducible across runs/engines (no RNG state), one
    narrow filter — the sampling a 100 TB mixture pipeline needs."""
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("int")
    frac = F.lit(default_fraction)
    for stratum, p in fractions.items():
        frac = F.when(F.col(stratum_col) == stratum, F.lit(p)).otherwise(frac)
    return df.where(bucket < frac * 65536)


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark-contamination hits: for every corpus document sharing
    at least one ``n``-gram with the benchmark set, the count of
    distinct benchmark grams it contains — the standard eval-leakage
    check run before a corpus ships.

    At scale the benchmark side is tiny (thousands of eval documents)
    next to the corpus: its distinct gram set broadcasts, so the only
    big-data cost is one narrow explode of the corpus and a broadcast
    semi-join — no corpus shuffle at all until the per-doc count, which
    aggregates only the (rare) hit rows. Set broadcast_benchmark=False
    if the benchmark gram set outgrows executor memory."""
    from grafink_spark.llm.signals import gram_array
    from grafink_spark.llm.text import tokens

    bgrams = benchmark.select(
        F.explode(gram_array(tokens(text_col), n)).alias("gram")
    ).distinct()
    if broadcast_benchmark:
        bgrams = F.broadcast(bgrams)
    dgrams = docs.select(
        F.col(id_col), F.explode(gram_array(tokens(text_col), n)).alias("gram")
    )
    return (
        dgrams.join(bgrams, "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_contaminated_grams"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Corpus rows with every benchmark-contaminated document removed."""
    hits = contamination(
        docs, benchmark, id_col, text_col, n, broadcast_benchmark
    )
    return docs.join(hits.select(id_col), on=id_col, how="left_anti")


def mixture_sample(
    df: DataFrame,
    alpha: float = 0.5,
    target_fraction: float = 0.3,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture sampling: sample each source at a rate
    that reweights the corpus toward p_s ∝ n_s^alpha (alpha < 1 boosts
    small sources — the standard multilingual/source-mixture rule), at
    an expected ``target_fraction`` of total rows. Rates cap at 1 (no
    upsampling); row selection is the same deterministic md5-bucket
    rule as stratified_sample, so the draw is reproducible across runs
    and engines.

    rate_s = min(1, target_fraction · N · n_s^alpha / Σ_t n_t^alpha / n_s)

    Plan/scale: one groupBy(source) to the per-source counts (rows =
    source cardinality), a 1-row total, and a broadcast join of the
    tiny rates table back onto the corpus — the big table is touched
    once, filtered by a narrow expression."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    # totals as whole-partition window aggs over the tiny counts table
    # (rows = source cardinality), avoiding a self-join on its lineage
    w = Window.partitionBy(F.lit(1))
    rates = counts.select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(target_fraction)
            * F.sum("_n").over(w)
            * F.pow("_n", F.lit(alpha))
            / F.sum(F.pow("_n", F.lit(alpha))).over(w)
            / F.col("_n"),
        ).alias("_rate"),
    )
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("int")
    return (
        df.join(F.broadcast(rates), source_col)
        .where(bucket < F.col("_rate") * 65536)
        .drop("_rate")
    )


def dataset_split(
    df: DataFrame,
    fractions: tuple[float, float] = (0.9, 0.05),
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the first 4 hex digits
    of md5(id) place each row in train (< fractions[0]), val
    (< fractions[0]+fractions[1]) or test — the split every training
    run needs to be reproducible across engines and re-runs (no RNG
    state, no sort order dependence: the hash IS the assignment).

    Plan/scale: one narrow projection — no shuffle, no sample(); a
    100 TB corpus splits in a single map pass and any subset of files
    yields the same per-row assignment.
    """
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("int")
    train_hi = fractions[0] * 65536
    val_hi = (fractions[0] + fractions[1]) * 65536
    return df.withColumn(
        out_col,
        F.when(bucket < train_hi, F.lit("train"))
        .when(bucket < val_hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def kfold_assign(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: fold = first 4 md5 hex digits
    of the id mod k — the cross-validation sibling of
    :func:`dataset_split`. Hash-based (not modulo on the raw id) so
    sequential ids don't stripe systematically; zero-shuffle map pass,
    reproducible on any file subset."""
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("int")
    return df.withColumn(out_col, bucket % k)

def group_kfold_assign(
    df: DataFrame,
    k: int = 5,
    group_col: str = "source",
    out_col: str = "fold",
) -> DataFrame:
    """GROUP-aware k-fold assignment: the fold is hashed from the GROUP
    key, so every row of a group lands in the same fold — the
    leakage-safe split when near-identical rows cluster within a group
    (same crawl domain, same source, same user). sklearn's GroupKFold,
    as a zero-shuffle deterministic map pass — the same hash rule as
    :func:`kfold_assign`, keyed on the group instead of the row id."""
    return kfold_assign(df, k=k, id_col=group_col, out_col=out_col)


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    smoothing: float = 1.0,
) -> DataFrame:
    """(doc_id, dsir_score) importance log-weights for Data Selection
    via Importance Resampling (Xie et al., NeurIPS 2023 — the standard
    pretraining-data selection recipe): featurize documents as hashed
    unigram+bigram counts, fit two add-λ-smoothed multinomial models —
    p̂ on the (small) ``target`` corpus, q̂ on the ``raw`` pool — and
    score every raw document with

        score(d) = Σ_grams  log p̂(bucket(g)) − log q̂(bucket(g))

    High scores = raw documents whose n-gram profile looks like the
    target distribution.

    Plan/scale: gram extraction is one explode per corpus (linear in
    token count, narrow); both models are groupBy(bucket) aggregations
    whose output is ≤ ``buckets`` rows (map-side partials make the
    shuffle vocabulary-sized, corpus-independent); the per-document
    score is a BROADCAST join of the ≤8k-row log-ratio table onto the
    per-(doc, bucket) counts followed by one keyed sum. No pairwise
    work anywhere — the whole selection is two linear passes.

    Determinism: bucket = md5-hex prefix mod ``buckets`` (engine-
    reproducible, used by every sampler here); the per-document sum
    casts each double addend to decimal(38,18) so accumulation order
    cannot move scores across the round(6) oracle boundary (the
    pagerank rule). Empty-text documents score 0.0.
    """
    from grafink_spark.llm.signals import ngram_counts

    def bucketed(df: DataFrame) -> DataFrame:
        g = ngram_counts(df, id_col=id_col, text_col=text_col, ns=(1, 2))
        return g.select(
            id_col,
            (
                F.conv(F.substring(F.md5("gram"), 1, 6), 16, 10).cast("long")
                % buckets
            ).alias("_b"),
            "cnt",
        )

    tb = bucketed(target).groupBy("_b").agg(F.sum("cnt").alias("_cp"))
    raw_b = bucketed(raw).groupBy(id_col, "_b").agg(F.sum("cnt").alias("_c"))
    qb = raw_b.groupBy("_b").agg(F.sum("_c").alias("_cq"))
    model = tb.join(qb, "_b", "full_outer").select(
        "_b",
        F.coalesce("_cp", F.lit(0)).alias("_cp"),
        F.coalesce("_cq", F.lit(0)).alias("_cq"),
    )
    totals = model.agg(F.sum("_cp").alias("_tp"), F.sum("_cq").alias("_tq"))
    lam = F.lit(float(smoothing))
    lam_b = F.lit(float(smoothing) * buckets)
    log_ratio = (
        model.crossJoin(F.broadcast(totals)).select(
            "_b",
            (
                F.log((F.col("_cp") + lam) / (F.col("_tp") + lam_b))
                - F.log((F.col("_cq") + lam) / (F.col("_tq") + lam_b))
            ).alias("_lr"),
        )
    )
    scored = (
        raw_b.join(F.broadcast(log_ratio), "_b")
        .groupBy(id_col)
        .agg(
            F.sum((F.col("_lr") * F.col("_c")).cast("decimal(38,18)"))
            .cast("double")
            .alias("dsir_score")
        )
    )
    return (
        raw.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            id_col, F.coalesce("dsir_score", F.lit(0.0)).alias("dsir_score")
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    smoothing: float = 1.0,
) -> DataFrame:
    """Top-``k`` raw documents by DSIR importance weight (ties broken by
    id — fully deterministic; the paper's Gumbel-noise sampling can be
    layered on by adding a seeded-hash Gumbel column before the sort).
    orderBy+limit compiles to TakeOrdered — no global sort
    materialization."""
    s = dsir_scores(raw, target, text_col, id_col, buckets, smoothing)
    return s.orderBy(F.col("dsir_score").desc(), F.col(id_col).asc()).limit(k)

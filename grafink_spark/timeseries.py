"""Time-series operators over event tables: sliding-window aggregation,
gap-filling resample with forward-fill, funnel analysis, and cohort
retention. All pure DataFrame compositions — no UDFs, no driver loops —
so Catalyst sees every expression and the plans survive a 100× scale-up.

The reference engine has no time-series surface (its only temporal logic
is the daily batch-date partition pruning, SURVEY §2.1); these are part
of the beyond-reference analytics layer a 100 TB event store needs.

Scale notes per operator are in the docstrings; the common theme is ONE
hash shuffle on the entity key, with every later step either local to
that partitioning or a pre-aggregated (and therefore small) rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sliding_window_agg(
    events: DataFrame,
    ts: str = "ts",
    window: str = "1 hour",
    slide: str = "15 minutes",
    group_cols: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Sliding (hopping) window counts + value sum: each event lands in
    ``window/slide`` overlapping epoch-aligned windows.

    Works unchanged on a bounded DataFrame or a stream (pass
    ``watermark`` to bound streaming state; on a batch input the
    watermark is a no-op). Spark's WindowExec expands each row into its
    containing windows BEFORE the shuffle, so the exchange carries
    window/slide × input rows — keep the ratio small (4 here) and
    pre-filter columns; there is exactly one shuffle, on
    (window, group_cols).
    """
    src = events.withWatermark(ts, watermark) if watermark else events
    gcols = group_cols if group_cols is not None else ["event_type"]
    return (
        src.groupBy(F.window(ts, window, slide).alias("win"), *gcols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *gcols,
            "n_events",
            "sum_value",
        )
    )


def resample_ffill(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    value: str = "value",
    unique: str = "event_id",
    step: str = "1 day",
    trunc: str = "day",
) -> DataFrame:
    """Gap-filled regular resample per key: one row per (key, bucket)
    from the key's first to its last observed bucket, carrying the most
    recent observed value forward through empty buckets.

    Last-in-bucket is deterministic: the observation with the greatest
    (ts, unique) wins (``max_by`` with a struct ordering key; the struct
    buffer makes this a SortAggregate — acceptable, since the window
    step downstream needs a (key, bucket) sort anyway).

    Plan/scale: gap-fill WITHOUT a calendar join — each observation
    emits its own bucket plus the empty buckets up to the next
    observation (``lead`` + ``sequence`` explode), so the plan is one
    groupBy shuffle on (key, bucket), one window shuffle on (key), and
    a narrow generate. No grid × observations join, no second
    forward-fill window over the filled output. State per key is one
    row per OBSERVED bucket; the explode emits gap rows straight into
    the output. A pathological key observed once with a years-long gap
    to ... emits nothing extra (its single row has no lead), so skew is
    bounded by real observation counts.
    """
    bucket = F.date_trunc(trunc, F.col(ts)).alias("bucket")
    obs = (
        df.groupBy(F.col(key), bucket)
        .agg(
            F.max_by(
                F.col(value), F.struct(F.col(ts), F.col(unique))
            ).alias("value")
        )
    )
    w = Window.partitionBy(key).orderBy("bucket")
    gaps = obs.withColumn("_next", F.lead("bucket").over(w))
    return gaps.select(
        F.col(key),
        F.explode(
            F.sequence(
                F.col("bucket"),
                F.coalesce(
                    F.col("_next") - F.expr(f"interval {step}"),
                    F.col("bucket"),
                ),
                F.expr(f"interval {step}"),
            )
        ).alias("bucket"),
        F.col("value"),
    )


def rolling_agg(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    value: str = "value",
    span_seconds: int = 3600,
) -> DataFrame:
    """Per-key trailing-window aggregates: for every row, the count and
    mean of ``value`` over the key's rows in the preceding
    ``span_seconds`` (inclusive of the current row) — the standard
    moving-average / rate-limiter shape.

    Plan/scale: one hash shuffle on the key, then a RANGE-framed window
    over epoch seconds — Spark evaluates it with a sliding two-pointer
    pass per partition (no per-row rescan of the frame). Skew bound =
    the hottest key's row count, same as any per-key window.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.unix_timestamp(F.col(ts)))
        .rangeBetween(-span_seconds, 0)
    )
    return df.select(
        F.col(key),
        F.col(ts),
        F.col(value),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.avg(value).over(w).alias("avg_trailing"),
    )


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    key: str = "user_id",
    ts: str = "ts",
    stage_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: one output row with, per stage, how
    many keys reached it — where "reached stage i" means an event of
    stage i at-or-after the key's first qualifying stage i-1 event.

    Plan/scale: ONE hash shuffle on the key; each stage is an
    unordered-frame window aggregate over the same partitioning
    (Catalyst reuses the exchange across the chained selects), then a
    global count rollup over one boolean row per event — partial
    aggregation makes the final exchange a few rows per task.
    """
    out = events.select(key, ts, stage_col)
    w = Window.partitionBy(key)
    prev = None
    for i, stage in enumerate(stages):
        cond = F.col(stage_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts) >= F.col(prev))
        t = f"_t{i}"
        out = out.withColumn(t, F.min(F.when(cond, F.col(ts))).over(w))
        prev = t
    # one row per key (any event row carries the same window values)
    per_key = out.groupBy(key).agg(
        *[F.first(f"_t{i}").alias(f"_t{i}") for i in range(len(stages))]
    )
    return per_key.agg(
        *[
            F.count(F.col(f"_t{i}")).alias(f"n_{stage}")
            for i, stage in enumerate(stages)
        ]
    )


def cohort_retention(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: keys are cohorted by the period of
    their first event; output counts distinct keys active per
    (cohort_period, periods_since_cohort).

    Plan/scale: one window shuffle on the key for the cohort min, a
    distinct on (cohort, offset, key) — which partial-aggregates
    map-side — then the small (cohorts × offsets) rollup. No join of a
    per-key cohort table back onto the events (the window form reuses
    the single key partitioning instead).
    """
    secs = {"day": 86400, "week": 604800}[period]
    p = F.date_trunc(period, F.col(ts))
    w = Window.partitionBy(key)
    with_cohort = events.select(
        F.col(key), p.alias("_p")
    ).withColumn("cohort", F.min("_p").over(w))
    return (
        with_cohort.select(
            "cohort",
            F.floor(
                (F.unix_timestamp("_p") - F.unix_timestamp("cohort")) / secs
            ).alias("offset"),
            F.col(key),
        )
        .distinct()
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def session_window_agg(
    events: DataFrame,
    ts: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    value: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Native session-window aggregation (``F.session_window``): events
    of one key whose gaps are <= ``gap`` merge into one session
    (touching windows merge, so an idle gap of exactly ``gap`` still
    extends the session — a new one starts only when the gap is
    STRICTLY greater); ``session_end`` is the last event + gap
    (Spark's half-open window end).

    This is the engine-native sibling of :func:`sessionize_batch` /
    the applyInPandasWithState streaming sessionizer: same grouping
    semantics (up to the >= vs > boundary, documented there), but the
    merge runs inside Spark's SessionWindow state store, which on a
    stream merges windows incrementally per key and expires state by
    watermark — no Python, no custom state tuple.

    Plan/scale: exactly one shuffle on (key); window merging is a
    sort-based per-partition pass. Works unchanged on a bounded frame
    (watermark ignored) or a stream (pass ``watermark``).
    """
    src = events.withWatermark(ts, watermark) if watermark else events
    return (
        src.groupBy(F.session_window(ts, gap).alias("sess"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value).alias("sum_value"),
        )
        .select(
            key,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def seasonal_decompose(
    events: DataFrame,
    ts: str = "ts",
    value: str = "value",
    period: int = 7,
    bucket: str = "day",
) -> DataFrame:
    """Classical additive seasonal decomposition of a bucketed series:

      observed = trend + seasonal + residual

    - ``observed``: per-bucket sum of ``value``;
    - ``trend``: centered ``period``-bucket moving average (edge
      buckets with an incomplete window keep their partial average —
      documented, deterministic);
    - ``seasonal``: mean detrended value per position-in-period
      (day-of-week for period=7), re-centered to sum to zero;
    - ``residual``: the rest.

    Plan/scale: one bucket aggregation (map-side combined), one
    ordered window over the BUCKETED series (thousands of rows, not
    events — the window never touches raw data), one tiny
    period-sized aggregate joined back. All window frames are
    ROWS-bounded → single sort, no point collapsing."""
    # every aggregate sums DECIMAL addends then divides doubles: exact,
    # order-independent sums make trend/seasonal engine-identical (a
    # double avg differs between Spark's sliding frames and another
    # engine's segment trees in the last ulps)
    dec = "decimal(27,6)"
    b = events.groupBy(F.date_trunc(bucket, F.col(ts)).alias("bucket")).agg(
        F.sum(F.col(value).cast(dec)).cast("double").alias("observed")
    )
    half = period // 2
    w = Window.orderBy("bucket").rowsBetween(-half, half)
    trend = (
        F.sum(F.col("observed").cast(dec)).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    t = b.withColumn("trend", trend).withColumn(
        "pos", F.dayofweek("bucket") if bucket == "day" else F.expr("0")
    )
    det = t.withColumn("_d", F.col("observed") - F.col("trend"))
    seas = det.groupBy("pos").agg(
        (
            F.sum(F.col("_d").cast(dec)).cast("double")
            / F.count(F.lit(1))
        ).alias("_s")
    )
    seas_mean = seas.agg(
        (
            F.sum(F.col("_s").cast(dec)).cast("double") / F.count(F.lit(1))
        ).alias("_sm")
    )
    out = (
        det.join(F.broadcast(seas), "pos")
        .crossJoin(F.broadcast(seas_mean))
        .select(
            "bucket",
            "observed",
            "trend",
            (F.col("_s") - F.col("_sm")).alias("seasonal"),
            (
                F.col("observed")
                - F.col("trend")
                - (F.col("_s") - F.col("_sm"))
            ).alias("residual"),
        )
    )
    return out


def rolling_median(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    value: str = "value",
    span_seconds: int = 3600,
) -> DataFrame:
    """Per-key trailing-window EXACT median of ``value`` over the
    preceding ``span_seconds`` — the robust sibling of
    :func:`rolling_agg`'s mean (one outlier can't drag it).

    Medians are order statistics, not sums, so the result is exactly
    deterministic under any partitioning or engine — no decimal
    tricks needed. Plan: one hash shuffle on the key, a RANGE-framed
    window; the percentile buffer re-collects each frame (O(frame)
    per row, vs the mean's O(1) sliding update) — the price of
    exactness; swap percentile for percentile_approx when frames are
    huge."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.unix_timestamp(F.col(ts)))
        .rangeBetween(-span_seconds, 0)
    )
    return df.select(
        F.col(key),
        F.col(ts),
        F.col(value),
        F.expr(f"percentile({value}, 0.5)").over(w).alias("median_trailing"),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
    )


def linear_attribution(
    events: DataFrame,
    conversion: str = "purchase",
    touch: str = "click",
    window_seconds: int = 3600,
    key: str = "user_id",
    ts: str = "ts",
    stage_col: str = "event_type",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch linear attribution: each conversion's value splits
    equally across the user's ``touch`` events in the preceding
    ``window_seconds`` (inclusive); output is per-touch attributed
    revenue. Conversions with no in-window touch contribute nothing
    (they'd go to a "direct" bucket upstream).

    Plan/scale: one banded interval join (each side bucketed by
    floor(ts/window), touch probes its own and the next bucket — the
    same exhaustive ±bucket trick as range_join, never a theta join),
    then one count window per conversion and a per-touch rollup. All
    shuffles are keyed; the pair space is bounded by touches ×
    conversions per (user, window-bucket)."""
    conv = events.where(F.col(stage_col) == conversion).select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("_cid"),
        F.unix_timestamp(ts).alias("_cts"),
        F.col(value).alias("_cval"),
    )
    tch = events.where(F.col(stage_col) == touch).select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("_tid"),
        F.unix_timestamp(ts).alias("_tts"),
    )
    conv_b = conv.select(
        "*",
        F.explode(
            F.array(
                (F.floor(F.col("_cts") / window_seconds) - 1).cast("long"),
                F.floor(F.col("_cts") / window_seconds).cast("long"),
            )
        ).alias("_b"),
    )
    tch_b = tch.withColumn(
        "_b", F.floor(F.col("_tts") / window_seconds).cast("long")
    )
    pairs = (
        conv_b.join(tch_b, ["_k", "_b"])
        .where(
            (F.col("_tts") <= F.col("_cts"))
            & (F.col("_tts") >= F.col("_cts") - window_seconds)
        )
        .select("_k", "_cid", "_cval", "_tid")
    )
    w = Window.partitionBy("_cid")
    share = (F.col("_cval") / F.count(F.lit(1)).over(w)).alias("_share")
    return (
        pairs.select("_k", "_tid", share)
        .groupBy(F.col("_tid").alias(id_col))
        .agg(
            F.sum(F.col("_share").cast("decimal(27,9)"))
            .cast("double")
            .alias("attributed_value"),
            F.count(F.lit(1)).alias("n_conversions"),
        )
    )


def cusum_changepoints(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    value: str = "value",
    slack_k: float = 0.5,
    h_k: float = 4.0,
) -> DataFrame:
    """One-sided CUSUM change-point detection per key over daily sums:
    flag the days where the cumulative positive drift of the series
    exceeds ``h_k``·sigma — the classic mean-shift detector (faster to
    alarm than per-point z-scores, which never accumulate evidence).

    The textbook recursion C_t = max(0, C_{t-1} + x_t − mu − slack) is
    not a windowed expression, but its closed form is: with
    d_t = x_t − mu − slack and S_t = Σ_{i≤t} d_i,
    C_t = S_t − min(0, min_{j≤t} S_j). Both the prefix sum and the
    running min are single ordered-window passes — no recursion, no
    UDF. All accumulations use decimal addends (engine-exact: window
    sums associate differently between Spark's incremental fold and
    DuckDB's segment tree, which skews raw doubles).

    Returns (key, day, x, cusum, is_alarm); one shuffle for the daily
    rollup, one for the per-key stats join, windows reuse the daily
    partitioning."""
    d6 = "decimal(27,6)"
    d12 = "decimal(27,12)"
    daily = (
        df.groupBy(
            F.col(key).alias("_k"), F.date_trunc("day", F.col(ts)).alias("day")
        )
        .agg(F.sum(F.col(value).cast(d6)).cast("double").alias("_x"))
    )
    stats = daily.groupBy("_k").agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(F.col("_x").cast(d12)).cast("double").alias("_sx"),
        F.sum((F.col("_x") * F.col("_x")).cast(d12)).cast("double").alias("_sxx"),
    )
    j = daily.join(stats, "_k")
    mu = F.col("_sx") / F.col("_n")
    var = F.greatest(
        F.lit(0.0), F.col("_sxx") / F.col("_n") - mu * mu
    )
    sigma = F.sqrt(var)
    d = (F.col("_x") - mu - F.lit(slack_k) * sigma).cast(d12)
    w = Window.partitionBy("_k").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_s = j.withColumn("_S", F.sum(d).over(w)).withColumn(
        "_minS", F.min(F.col("_S")).over(w)
    )
    cusum = (
        F.col("_S") - F.least(F.lit(0).cast(d12), F.col("_minS"))
    ).cast("double")
    return with_s.select(
        F.col("_k").alias(key),
        "day",
        F.col("_x").alias("x"),
        cusum.alias("cusum"),
        (cusum > F.lit(h_k) * sigma).alias("is_alarm"),
    )


def ewma_trailing(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    value: str = "value",
    alpha: float = 0.3,
    window: int = 16,
) -> DataFrame:
    """Finite-window EWMA per key over daily sums: weighted average of
    the trailing ``window`` days with weights alpha·(1−alpha)^lag,
    normalized over the lags actually present (so the series starts
    unbiased instead of decaying from zero) — the standard smoothing
    feature for monitoring/forecast baselines.

    Engine-exactness: the weights are PYTHON-computed literals baked
    into both plans — a runtime pow(1−alpha, lag) can differ in the
    last ulp between libm implementations. The trailing values are
    collected per row from an ordered window frame (deterministic
    order) and folded newest-last in fixed array order.

    Plan: one daily-rollup shuffle, one ordered window; the fold is a
    per-row expression over ≤ ``window`` elements."""
    d6 = "decimal(27,6)"
    weights = []
    decay = 1.0
    for _ in range(window):
        weights.append(alpha * decay)
        decay = decay * (1.0 - alpha)
    w_arr = F.array(*[F.lit(w) for w in weights])
    daily = (
        df.groupBy(
            F.col(key).alias("_k"), F.date_trunc("day", F.col(ts)).alias("day")
        )
        .agg(F.sum(F.col(value).cast(d6)).cast("double").alias("_x"))
    )
    win = (
        Window.partitionBy("_k")
        .orderBy("day")
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    arr = F.collect_list("_x").over(win)  # oldest → newest, frame-ordered
    staged = daily.withColumn("_arr", arr)
    n = F.size("_arr")
    idx = F.sequence(F.lit(0), n - 1)
    num = F.aggregate(
        F.transform(
            idx,
            lambda i: F.element_at(F.col("_arr"), i + 1)
            * F.element_at(w_arr, n - i),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(idx, lambda j: F.element_at(w_arr, j + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return staged.select(
        F.col("_k").alias(key),
        "day",
        F.col("_x").alias("x"),
        (num / den).alias("ewma"),
    )


def ewma_recursive(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    value: str = "value",
    alpha: float = 0.3,
) -> DataFrame:
    """INFINITE-memory EWMA per key over daily sums — the true
    recursion e_t = alpha·x_t + (1−alpha)·e_{t−1}, seeded with the
    first observation. Unlike :func:`ewma_trailing` (finite window,
    pure expressions), the unbounded recursion is not expressible as a
    window aggregate without numerically explosive (1−alpha)^{-t}
    rescaling, so this is the repo's canonical justified-Pandas case:
    one Arrow ``applyInPandas`` per key group, each group sorted by day
    and folded locally — O(group) memory, no driver involvement, and
    the per-key series is exactly the shape a key-partitioned stream
    would deliver (see ``ewma_stream``).

    The DuckDB oracle replays the identical recursion as a recursive
    CTE, so even this Pandas-path operator is value-checked."""
    d6 = "decimal(27,6)"
    daily = (
        df.groupBy(
            F.col(key).alias("_k"), F.date_trunc("day", F.col(ts)).alias("day")
        )
        .agg(F.sum(F.col(value).cast(d6)).cast("double").alias("_x"))
    )
    key_type = daily.schema["_k"].dataType.simpleString()
    out_schema = f"_k {key_type}, day timestamp, _x double, ewma double"
    a = float(alpha)
    b = 1.0 - a

    def fold(pdf):
        pdf = pdf.sort_values("day").reset_index(drop=True)
        out = []
        cur = None
        for x in pdf["_x"]:
            x = float(x)
            cur = x if cur is None else a * x + b * cur
            out.append(cur)
        pdf["ewma"] = out
        return pdf

    return (
        daily.groupBy("_k")
        .applyInPandas(fold, out_schema)
        .select(
            F.col("_k").alias(key), "day", F.col("_x").alias("x"), "ewma"
        )
    )


def holt_trend(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    value: str = "value",
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing per key over daily
    sums — the coupled recursion

        l_t = alpha·x_t + (1−alpha)·(l_{t−1} + b_{t−1})
        b_t = beta·(l_t − l_{t−1}) + (1−beta)·b_{t−1}

    seeded l_1 = x_1, b_1 = 0 (trend learns from the second point).
    Adds the one-step-ahead fit f_t = l_{t−1} + b_{t−1}. Like
    :func:`ewma_recursive`, the level/trend pair is a linear recurrence
    whose unbounded horizon has no stable window-aggregate form, so the
    per-key fold runs as one Arrow ``applyInPandas`` group — O(group)
    memory, sorted by day, no driver involvement. The DuckDB oracle
    replays the identical recursion as a recursive CTE.

    Plan/scale: one shuffle to daily sums (decimal — partition-order
    independent), one shuffle on the key for the fold; series length
    per key is bounded by the calendar, not the corpus."""
    d6 = "decimal(27,6)"
    daily = (
        df.groupBy(
            F.col(key).alias("_k"), F.date_trunc("day", F.col(ts)).alias("day")
        )
        .agg(F.sum(F.col(value).cast(d6)).cast("double").alias("_x"))
    )
    key_type = daily.schema["_k"].dataType.simpleString()
    out_schema = (
        f"_k {key_type}, day timestamp, _x double, "
        "level double, trend double, fitted double"
    )
    a = float(alpha)
    bb = float(beta)

    def fold(pdf):
        pdf = pdf.sort_values("day").reset_index(drop=True)
        levels, trends, fits = [], [], []
        lev = tr = None
        for x in pdf["_x"]:
            x = float(x)
            if lev is None:
                fits.append(x)
                lev, tr = x, 0.0
            else:
                fit = lev + tr
                fits.append(fit)
                new_lev = a * x + (1.0 - a) * fit
                tr = bb * (new_lev - lev) + (1.0 - bb) * tr
                lev = new_lev
            levels.append(lev)
            trends.append(tr)
        pdf["level"] = levels
        pdf["trend"] = trends
        pdf["fitted"] = fits
        return pdf

    return (
        daily.groupBy("_k")
        .applyInPandas(fold, out_schema)
        .select(
            F.col("_k").alias(key),
            "day",
            F.col("_x").alias("x"),
            "level",
            "trend",
            "fitted",
        )
    )


def frequent_sequences(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    event: str = "event_type",
    tiebreak: str = "event_id",
    k: int = 3,
    top: int = 20,
) -> DataFrame:
    """Top frequent consecutive k-grams of ``event`` across per-key
    timelines (sequential-pattern support counting, the contiguous
    special case): each key's events are ordered by (ts, tiebreak),
    every window of k consecutive events contributes one occurrence of
    its ``a>b>c`` gram, grams ranked by total count (ties broken by
    gram text so the result is deterministic).

    Plan/scale: one shuffle on the key for the ordering window
    (``lead`` is a local sort within each key's partition — no pair
    space), one hash shuffle on the gram for the count (map-side
    partial agg first), and the top-N is a TakeOrdered — never a
    global sort of all grams."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    steps = [F.col(event)] + [
        F.lead(event, i).over(w) for i in range(1, k)
    ]
    # EVERY step must be non-null: concat_ws silently skips NULLs, so a
    # NULL event mid-window would otherwise count a truncated gram as a
    # full k-gram (and diverge from SQL's NULL-propagating ||). Gram
    # text uses '>' as separator — event names must not contain it.
    full = steps[0].isNotNull()
    for s in steps[1:]:
        full = full & s.isNotNull()
    grams = df.select(
        F.concat_ws(">", *steps).alias("gram"),
        full.alias("_full"),
    ).where(F.col("_full"))
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram").asc())
        .limit(top)
    )

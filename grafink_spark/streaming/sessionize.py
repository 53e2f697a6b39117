"""Gap-based user sessionization — the custom stateful operator.

Two implementations with identical session semantics (a session closes
when a user is idle for longer than ``gap``):

- ``sessionize_batch``: window functions (lag → session-boundary flag →
  running sum → group), fully SQL-expressible, duckdb-oracle-checkable.
- ``sessionize_stream``: ``applyInPandasWithState`` over a watermarked
  stream (Arrow-batched; state = the one open session per user; closed
  sessions emit in append mode, idle sessions emit via event-time
  timeout when the watermark passes last_ts + gap).

At scale the streaming state is one small tuple per active user key —
bounded by the watermark — and the batch variant is a single shuffle on
user_id (the two window functions and the final groupBy share the
partitioning, so Catalyst plans one Exchange).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

# open-session state: (start_us, last_us, n_events, sum_value)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def sessionize_batch(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Sessions per user from a bounded events DataFrame
    (user_id, ts timestamp, value): (user_id, session_start,
    session_end, n_events, sum_value)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # via timestamp: direct TIMESTAMP_NTZ→long casts are rejected
    secs = F.col("ts").cast("timestamp").cast("long")
    prev = F.lag(secs).over(w)
    flagged = events.select(
        "user_id",
        "ts",
        "value",
        F.when(prev.isNull() | ((secs - prev) > gap_seconds), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    ).drop("session_seq")


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization of (user_id, ts, value) via
    applyInPandasWithState. Emits each session once, when it closes —
    either because a later event of the same user exceeds the gap, or
    because the event-time watermark passes last_ts + gap (timeout)."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    gap_us = gap_seconds * 1_000_000

    def _emit(user_id: int, st: tuple) -> "pd.DataFrame":
        start_us, last_us, n, s = st
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                "sum_value": [s],
            }
        )

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: Any
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                st = tuple(state.get)
                state.remove()
                yield _emit(user_id, st)
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        cur = tuple(state.get) if state.exists else None
        for ts, value in zip(rows["ts"], rows["value"]):
            ts_us = int(ts.value // 1_000)  # pandas ns → µs
            if cur is None:
                cur = (ts_us, ts_us, 1, float(value))
            elif ts_us - cur[1] > gap_us:
                yield _emit(user_id, cur)
                cur = (ts_us, ts_us, 1, float(value))
            else:
                cur = (
                    cur[0],
                    max(cur[1], ts_us),
                    cur[2] + 1,
                    cur[3] + float(value),
                )
        if cur is not None:
            state.update(cur)
            # close the open session once the watermark passes last+gap
            state.setTimeoutTimestamp(cur[1] // 1_000 + gap_seconds * 1_000)

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def ewma_stream(
    events: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    value: str = "value",
    alpha: float = 0.3,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sibling of :func:`grafink_spark.timeseries.ewma_recursive`:
    per-key EWMA folded across microbatches with
    ``applyInPandasWithState`` — state is ONE (last_ewma, n_seen) tuple
    per key, so state size is O(keys) regardless of stream length.
    Each batch's rows are sorted by event time and folded in order;
    emits one row per input event with the running EWMA. Replays of
    the same sorted prefix produce identical doubles, and the batch
    twin (``ewma_recursive``'s per-event variant) is the exactness
    oracle in tests."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    a = float(alpha)
    b = 1.0 - a
    # key type derived from the stream's own schema (as the batch twin
    # does) — a hardcoded string key breaks bigint user ids at Arrow
    # conversion time
    key_type = events.schema[key].dataType.simpleString()
    out_schema = (
        f"{key} {key_type}, {ts} timestamp, x double, ewma double, n long"
    )
    state_schema = "ewma double, n long"

    def fn(key_t, pdfs, state):
        import pandas as pd  # noqa: PLC0415

        (k,) = key_t
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts)
        if state.exists:
            cur, n = state.get
        else:
            cur, n = None, 0
        out_ts, out_x, out_e = [], [], []
        for t, x in zip(rows[ts], rows[value]):
            x = float(x)
            cur = x if cur is None else a * x + b * cur
            n += 1
            out_ts.append(t)
            out_x.append(x)
            out_e.append(cur)
        state.update((cur, n))
        yield pd.DataFrame(
            {
                key: k,
                ts: out_ts,
                "x": out_x,
                "ewma": out_e,
                "n": range(n - len(out_ts) + 1, n + 1),
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark(ts, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )

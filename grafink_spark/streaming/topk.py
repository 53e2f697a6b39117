"""Streaming running top-k per key — a bounded-state custom stateful
operator via applyInPandasWithState.

Keeps, per key, the k best (value, id) rows seen so far and re-emits a
key's current top-k whenever a microbatch changes it (update-shaped
output). The batch twin is ``ops.grouped_topk`` — a drained stream's
final emission per key equals the batch operator over the full input,
which is what the test pins.

Scale: state is exactly k scalars per key (no growth with stream
length, no watermark needed — top-k over all history is monotone:
a row outside the current top-k can never re-enter). One shuffle on
the key per microbatch; Arrow-batched merge inside the worker.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("values", T.ArrayType(T.DoubleType())),
    ]
)


def running_topk_stream(
    events: DataFrame,
    k: int = 5,
    key_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(key, rank, event_id, value) — per-key top-k by (value desc,
    id asc), re-emitted whenever it changes. ``events`` may be a stream
    or a bounded DataFrame (availableNow drains to the final top-k)."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: Any
    ) -> Iterator["pd.DataFrame"]:
        (key_val,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        pairs = list(zip(rows[id_col].astype(int), rows[value_col].astype(float)))
        if state.exists:
            ids, vals = state.get
            pairs += list(zip(ids, vals))
        # dedupe by id (redelivery-safe), then top-k: value desc, id asc
        best: dict[int, float] = {}
        for i, v in pairs:
            best[i] = v
        top = sorted(best.items(), key=lambda t: (-t[1], t[0]))[:k]
        state.update(([i for i, _ in top], [v for _, v in top]))
        yield pd.DataFrame(
            {
                "key": [key_val] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "event_id": [i for i, _ in top],
                "value": [v for _, v in top],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        TOPK_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

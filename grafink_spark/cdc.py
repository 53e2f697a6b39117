"""Change-data-capture operators: MERGE-style upsert and SCD2 ranges.

The reference is a pure daily-append pipeline (SURVEY §1.1: IDManager
parquet append, `IDManagerSparkService.scala:112-130`); it has no
update/delete merge. A training-data pipeline ingesting curated or
re-crawled sources needs one: apply a changeset (inserts / updates /
deletes) to a large base table, and track row history as effective
date ranges (SCD type 2).

Scale design (100 TB base, changeset ≪ base):

- ``merge_changes`` is ONE shuffle of the changeset + one join against
  the base on the merge key. When the changeset fits the broadcast
  threshold Catalyst turns the anti-join into a broadcast hash join and
  the base table never shuffles at all — the dominant cost is the base
  scan + rewrite, which is the floor for any merge. Multiple changes
  per key are resolved by a seq-desc window over the (small) changeset
  only, never over the base.
- On a real deployment the rewrite should be partition-scoped
  (copy-on-write only the partitions containing changed keys);
  ``touched_partitions`` computes that pruning set from the changeset
  so callers can `replaceWhere` just those partitions.
- ``scd2_ranges`` is a single window (`lead` over the per-key change
  sequence) — one hash shuffle on the key, no joins, no state beyond a
  per-key sort, so it scales linearly with history size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OP_COL = "_op"
SEQ_COL = "_seq"

INSERT = "I"
UPDATE = "U"
DELETE = "D"


def latest_changes(changes: DataFrame, key: str) -> DataFrame:
    """Resolve multiple changes per key to the one with the highest
    ``_seq`` (ties broken by op descending so reapplied snapshots are
    deterministic). Window over the changeset only — the base table is
    never touched."""
    w = Window.partitionBy(key).orderBy(
        F.col(SEQ_COL).desc(), F.col(OP_COL).desc()
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    broadcast_keys: bool = True,
) -> DataFrame:
    """MERGE INTO base USING changes ON base.key = changes.key:

    - ``_op = 'D'`` → row removed,
    - ``_op = 'U'`` / ``'I'`` → changeset row wins (full-row payload).

    Returns the merged table with the base schema. The base side is a
    single left-anti join against the deduplicated change keys —
    broadcast by default (the design point is changeset ≪ base; the
    window over the changeset hides size stats from the static planner,
    and waiting for AQE to flip the SortMergeJoin would already have
    shuffled the full base side). Pass ``broadcast_keys=False`` for a
    changeset too large to broadcast.
    """
    resolved = latest_changes(changes, key)
    keep_cols = base.columns
    anti_keys = resolved.select(key)
    if broadcast_keys:
        anti_keys = F.broadcast(anti_keys)
    survivors = base.join(anti_keys, on=key, how="left_anti")
    upserts = resolved.where(F.col(OP_COL) != DELETE).select(*keep_cols)
    return survivors.unionByName(upserts)


def touched_partitions(
    changes: DataFrame, partition_expr, key: str
) -> list:
    """Distinct partition values containing any changed key — the
    `replaceWhere` pruning set for a copy-on-write merge. Changeset-
    sized work only (one shuffle of the changeset)."""
    return [
        r[0]
        for r in changes.select(partition_expr.alias("_p"))
        .distinct()
        .collect()
    ]


def scd2_ranges(
    history: DataFrame,
    key: str,
    change_ts: str,
    order_tiebreak: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change history (one row
    per version of a key) into effective-dated ranges.

    Adds ``valid_from`` (= the row's change timestamp), ``valid_to``
    (= next version's timestamp, null while current) and ``is_current``.
    ``order_tiebreak`` makes same-timestamp versions deterministic.
    One window shuffle on the key; no joins.
    """
    w = Window.partitionBy(key).orderBy(
        F.col(change_ts).asc(), F.col(order_tiebreak).asc()
    )
    return (
        history.withColumn("valid_from", F.col(change_ts))
        .withColumn("valid_to", F.lead(change_ts).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def incremental_agg(
    old_state: DataFrame,
    new_rows: DataFrame,
    group: str,
    value: str,
    cnt_col: str = "cnt",
    sum_col: str = "sum_value",
) -> DataFrame:
    """Incremental rollup maintenance: refresh a (group, cnt, sum)
    summary with a new batch WITHOUT rescanning history — the batch is
    partially aggregated and summed into the stored state (count and sum are commutative monoids; avg/stddev derive
    from them downstream). At 100 TB this turns the daily "recompute
    the corpus rollup" into work proportional to the batch.

    Retractions: pass deleted rows with negated counts upstream (a row
    with ``cnt = -1, sum = -value``) — the same merge subtracts them.

    One shuffle on the group key over state ∪ batch-partials; the state
    side is group-cardinality-sized, so the cost is the batch scan.
    """
    batch = new_rows.groupBy(group).agg(
        F.count(F.lit(1)).alias(cnt_col), F.sum(value).alias(sum_col)
    )
    return (
        old_state.select(group, cnt_col, sum_col)
        .unionByName(batch)
        .groupBy(group)
        .agg(
            F.sum(cnt_col).alias(cnt_col),
            F.sum(sum_col).alias(sum_col),
        )
        .where(F.col(cnt_col) > 0)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level reconciliation between two table snapshots: every key
    classified added / removed / changed / unchanged — the data-diff
    audit run after a migration, backfill, or CDC replay. Comparison is
    an md5 over the compared columns' canonical string forms (null →
    sentinel), so the wide column set collapses to one hash per side
    before the single full-outer key join; at 100 TB both sides shuffle
    once on the key, nothing else moves."""
    compare_cols = compare_cols or [
        c for c in old.columns if c not in keys
    ]

    def hashed(df: DataFrame, tag: str) -> DataFrame:
        # hash each column FIRST: md5 digests are fixed-length hex, so
        # concatenating them is unambiguous — no separator collision
        # ('a\x01', 'b') vs ('a', '\x01b'), and NULL ('null' marker)
        # can't be forged by any real value's digest
        h = F.md5(
            F.concat_ws(
                "",
                *[
                    F.coalesce(
                        F.md5(F.col(c).cast("string")), F.lit("null")
                    )
                    for c in compare_cols
                ],
            )
        )
        return df.select(*keys, h.alias(f"_h_{tag}"))

    j = hashed(old, "old").join(hashed(new, "new"), keys, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") == F.col("_h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, status.alias("row_status"))

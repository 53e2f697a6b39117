"""Physical-plan linter: the scale-killer checklist as code.

Every pattern here is one the round reviews hunt by hand — a
CartesianProduct that explodes quadratically, a row-at-a-time Python
UDF that serializes the hot path, a nested-loop join that was meant to
be an equi join. ``lint_plan`` turns that review into a reusable check
so it can run over the WHOLE query registry per round (see
``tests/test_planlint.py``) and over user queries in CI.

Codes (errors unless noted):

- ``cartesian``      — CartesianProduct in the executed plan. Almost
  always an unintended cross join; quadratic at scale.
- ``row-udf``        — BatchEvalPython: a row-at-a-time Python UDF.
  10-100× slower than Arrow-batched Pandas UDFs and breaks
  whole-stage codegen around it.
- ``bnlj``           — BroadcastNestedLoopJoin (warning). Legitimate
  ONLY when the broadcast side is a 1-row/constant-bound aggregate
  (scalar totals, thresholds); anything larger re-scans the build side
  per row.
- ``single-part``    — Exchange SinglePartition feeding a non-terminal
  operator (warning). Legitimate for global top-k LIMITs and 1-row
  folds; a scale-killer when a full table funnels through it.
- ``oversized-broadcast`` — a broadcast-HINTED join side whose
  Catalyst size estimate exceeds the ``maybe_broadcast`` ceiling
  (error). A forced ``F.broadcast`` hint overrides Spark's own size
  check, so a dimension that grows past the ceiling OOMs the driver /
  executors instead of degrading to a shuffle join — the exact defect
  class the round-3/round-4 judge audits found by hand; this code makes
  it a machine check. Planner-chosen (unhinted) broadcasts are NOT
  flagged: those are runtime-size-gated and degrade safely.

A query that intentionally carries a warning registers it in the
caller's allowlist with a reason — the repo-wide test fails on any
UNDOCUMENTED occurrence, so new scale hazards can't land silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from grafink_spark.util import BROADCAST_MAX_BYTES

ERROR_CODES = frozenset({"cartesian", "row-udf", "oversized-broadcast"})
WARNING_CODES = frozenset({"bnlj", "single-part"})


def _iter_logical(jplan):
    """Yield every node of a (logical) plan tree — explicit stack, so a
    deeply nested optimized plan can't hit Python's recursion limit."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        yield node
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))


def oversized_broadcasts(
    df: DataFrame, max_bytes: int | None = None
) -> list[int]:
    """Catalyst size estimates (bytes) of every broadcast-HINTED join
    side in ``df``'s optimized logical plan that exceeds ``max_bytes``.

    Only FORCED hints are flagged: a planner-chosen broadcast is gated
    by ``autoBroadcastJoinThreshold`` against runtime statistics, so it
    degrades to a shuffle join by itself when the table outgrows the
    threshold — a hint overrides that check and OOMs instead. The
    estimate is the hinted subtree's optimized-plan statistics (the
    same numbers :func:`util.plan_size_bytes` gates on). Unknown-size
    sentinels are skipped — no estimate, no verdict."""
    if max_bytes is None:
        # honor the same session override maybe_broadcast gates on, so
        # "the maybe_broadcast ceiling" is literally one number
        try:
            max_bytes = int(
                df.sparkSession.conf.get("spark.grafink.broadcastMaxBytes")
            )
        except Exception:
            max_bytes = BROADCAST_MAX_BYTES
    too_big: list[int] = []
    try:
        jplan = df._jdf.queryExecution().optimizedPlan()
    except Exception:
        return too_big
    for node in _iter_logical(jplan):
        if node.nodeName() != "Join":
            continue
        try:
            hint = node.hint()
            sides = (
                (hint.leftHint(), node.left()),
                (hint.rightHint(), node.right()),
            )
        except Exception:
            continue
        for opt, side in sides:
            try:
                if not opt.isDefined():
                    continue
                strategy = opt.get().strategy()
                if not strategy.isDefined():
                    continue
                if "broadcast" not in str(strategy.get()).lower():
                    continue
                size = int(str(side.stats().sizeInBytes()))
            except Exception:
                continue
            if 0 <= size < (1 << 62) and size > max_bytes:
                too_big.append(size)
    return too_big


def lint_plan(df: DataFrame, broadcast_max_bytes: int | None = None) -> list[str]:
    """Return the sorted list of lint codes present in ``df``'s
    executed physical plan (empty list = clean)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    found = set()
    if "CartesianProduct" in plan:
        found.add("cartesian")
    if "BatchEvalPython" in plan:
        found.add("row-udf")
    if "BroadcastNestedLoopJoin" in plan:
        found.add("bnlj")
    if "Exchange SinglePartition" in plan:
        found.add("single-part")
    if oversized_broadcasts(df, broadcast_max_bytes):
        found.add("oversized-broadcast")
    return sorted(found)


def lint_registry(
    spark,
    sf_dir: str,
    allow: dict[str, set[str]] | None = None,
    only: set[str] | None = None,
) -> dict[str, list[str]]:
    """Lint every registered query's physical plan against ``allow``.

    Returns ``{query_name: [unexpected codes]}`` for queries whose plan
    carries a code NOT in its allowlist entry — empty dict means the
    whole registry is clean. Building a plan may execute driver-bounded
    prep jobs (localCheckpoint pins, offset collects), so this is a
    per-round gate, not a unit test.
    """
    from grafink_spark.benchqueries import QUERIES

    allow = allow or {}
    bad: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        codes = set(lint_plan(fn(spark, sf_dir)))
        unexpected = codes - allow.get(name, set())
        if unexpected:
            bad[name] = sorted(unexpected)
    return bad

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

A query that intentionally carries a warning registers it in the
caller's allowlist with a reason — the repo-wide test fails on any
UNDOCUMENTED occurrence, so new scale hazards can't land silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ERROR_CODES = frozenset({"cartesian", "row-udf"})
WARNING_CODES = frozenset({"bnlj", "single-part"})


def lint_plan(df: DataFrame) -> list[str]:
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

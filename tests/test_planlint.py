"""Plan-linter unit tests + the repo-wide registry lint gate.

The registry lint builds every registered query's physical plan and
fails on any scale-hazard code (cartesian, row-udf, bnlj, single-part)
that is not explicitly allowlisted WITH A REASON below — so a new
query carrying a quadratic join or a row-at-a-time Python UDF cannot
land silently. Gated behind ``SPARK_GRAFT_PLANLINT=1`` (builds 200+
plans, executes the driver-bounded prep jobs some of them pin):

    SPARK_GRAFT_PLANLINT=1 python -m pytest tests/test_planlint.py -q
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from grafink_spark.planlint import lint_plan, lint_registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_ORACLE", "/root/testdata/sf0.01")

# query -> (codes, reason). Every entry documents WHY the pattern is
# legitimate at scale; the lint fails on any code not listed here.
ALLOW: dict[str, tuple[set[str], str]] = {
    # -- single-part: global top-k LIMIT collapses to one partition on
    #    purpose; the input to the limit is already aggregate-sized.
    "top_docs": ({"single-part"}, "global ORDER BY + LIMIT over doc-level scores"),
    "shipping_priority": ({"single-part"}, "TPC-H Q3 top-10 (agg output -> limit)"),
    # -- bnlj: a genuinely 1-row (or constant-bound) broadcast side --
    "important_stock": ({"bnlj"}, "1-row total joined as threshold (Q11 scalar subquery)"),
    "quantile_filter": ({"bnlj"}, "1-row exact-quantile bound broadcast"),
    "dormant_customers": ({"bnlj"}, "1-row average-balance bound (Q22 scalar filter)"),
}


def test_lint_flags_cartesian(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    prev = spark.conf.get("spark.sql.crossJoin.enabled", "true")
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    try:
        codes = lint_plan(a.join(b))
    finally:
        spark.conf.set("spark.sql.crossJoin.enabled", prev)
    assert "cartesian" in codes or "bnlj" in codes


def test_lint_flags_row_udf(spark):
    from pyspark.sql.types import LongType

    plus_one = F.udf(lambda x: x + 1, LongType())
    df = spark.range(10).select(plus_one("id").alias("y"))
    assert "row-udf" in lint_plan(df)


def test_lint_clean_plan(spark):
    df = (
        spark.range(100)
        .withColumn("k", F.col("id") % 5)
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
    )
    assert lint_plan(df) == []


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_PLANLINT") != "1",
    reason="repo-wide plan lint (builds 200+ plans); set SPARK_GRAFT_PLANLINT=1",
)
def test_registry_plans_carry_no_undocumented_scale_hazards(spark):
    allow = {k: v[0] for k, v in ALLOW.items()}
    bad = lint_registry(spark, SF_DIR, allow=allow)
    assert bad == {}, f"undocumented scale-hazard codes: {bad}"

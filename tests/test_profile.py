"""column_profile golden tests."""

import pytest

from grafink_spark.profile import column_profile


def test_column_profile_metrics(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "x"), (2, None, "y"), (3, 4.0, "y"), (None, 6.0, None)],
        "a long, b double, s string",
    )
    out = {r["column"]: r for r in column_profile(df).collect()}
    a = out["a"]
    assert (a["n_rows"], a["n_null"], a["n_distinct"]) == (4, 1, 3)
    assert (a["min_num"], a["max_num"], a["mean"]) == (1.0, 3.0, 2.0)
    assert a["min_str"] is None
    b = out["b"]
    assert (b["n_null"], b["min_num"], b["max_num"], b["mean"]) == (
        1, 2.0, 6.0, 4.0,
    )
    s = out["s"]
    assert (s["n_null"], s["n_distinct"], s["min_str"], s["max_str"]) == (
        1, 2, "x", "y",
    )
    assert s["mean"] is None


def test_column_profile_single_job(spark):
    # the profile must be ONE aggregation pass: exactly one row in the
    # pre-pivot plan, no per-column scans (explode of a 1-row agg)
    df = spark.createDataFrame([(1, "a")], "a long, s string")
    plan = column_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1


def test_column_profile_rejects_unsupported(spark):
    df = spark.createDataFrame([([1, 2],)], "arr array<long>")
    with pytest.raises(ValueError, match="unsupported type"):
        column_profile(df)


def test_column_profile_approx_distinct(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "a long")
    row = column_profile(df, exact_distinct=False).collect()[0]
    # HLL++ at default precision is exact for tiny cardinalities
    assert row["n_distinct"] == 7

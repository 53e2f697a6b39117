"""Bucketed-table co-located join: correctness + exchange-free plan."""

import pytest
from pyspark.sql import functions as F

from grafink_spark.bucketing import co_located_join, write_bucketed
from tests.test_plans import physical_plan


@pytest.fixture()
def bucket_db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE bucketdb LOCATION '{tmp_path}/wh'")
    yield "bucketdb"
    spark.sql("DROP DATABASE bucketdb CASCADE")


def test_co_located_join_no_exchange(spark, bucket_db):
    orders = spark.createDataFrame(
        [(i, f"cust{i % 5}") for i in range(100)],
        "o_orderkey long, customer string",
    )
    items = spark.createDataFrame(
        [(i % 80, float(i)) for i in range(300)],
        "o_orderkey long, amount double",
    )
    write_bucketed(orders, f"{bucket_db}.orders_b", "o_orderkey", 8)
    write_bucketed(items, f"{bucket_db}.items_b", "o_orderkey", 8)

    # disable broadcast so the test pins the big-table path (at real
    # scale neither side fits the broadcast threshold)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(
            spark, f"{bucket_db}.orders_b", f"{bucket_db}.items_b",
            "o_orderkey",
        )
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    # correctness vs the plain (shuffled) join: every item key (0..79)
    # has a matching order (0..99), so all 300 item rows join
    expected = orders.join(items, "o_orderkey").count()
    assert joined.count() == expected == 300


def test_bucketed_groupby_no_exchange(spark, bucket_db):
    items = spark.createDataFrame(
        [(i % 40, float(i)) for i in range(200)],
        "k long, v double",
    )
    write_bucketed(items, f"{bucket_db}.items_g", "k", 8)
    agg = (
        spark.table(f"{bucket_db}.items_g")
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    plan = physical_plan(agg)
    assert "Exchange" not in plan, plan
    got = {r.k: r.s for r in agg.collect()}
    exp = {r.k: r.s for r in items.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert got == exp

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


def test_zorder_value_golden(spark):
    from pyspark.sql import functions as F

    from grafink_spark.bucketing import zorder_value

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "x int, y int"
    )
    out = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_value(["x", "y"], bits=4)).collect()
    }
    # interleave: x bits at even positions, y bits at odd
    # (3,5): x=0011, y=0101 → z bits (y3 x3 y2 x2 y1 x1 y0 x0) = 0 0 1 1 0 1 1 1 = 0b00110111=55... compute directly:
    def z(x, y):
        v = 0
        for b in range(4):
            v |= ((x >> b) & 1) << (2 * b)
            v |= ((y >> b) & 1) << (2 * b + 1)
        return v

    assert out == {(x, y): z(x, y) for (x, y) in out}


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    import random

    from pyspark.sql import functions as F

    from grafink_spark.bucketing import zorder_write

    rng = random.Random(5)
    rows = [(rng.randrange(1024), rng.randrange(1024)) for _ in range(40000)]
    df = spark.createDataFrame(rows, "x int, y int")

    zp = str(tmp_path / "zorder")
    lp = str(tmp_path / "linear")
    zorder_write(df, zp, ["x", "y"], bits=10, num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lp)
    )

    def avg_span(path, col):
        import glob

        spans = []
        for f in glob.glob(path + "/part-*.parquet"):
            r = (
                spark.read.parquet(f)
                .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
                .first()
            )
            spans.append(r.hi - r.lo)
        return sum(spans) / len(spans)

    # z-order: BOTH dimensions clustered (per-file span well under the
    # 0..1023 global range); linear sort clusters only x
    assert avg_span(zp, "x") < 700
    assert avg_span(zp, "y") < 700
    assert avg_span(lp, "x") < 150
    assert avg_span(lp, "y") > 900

    # layout changes nothing about the data
    assert spark.read.parquet(zp).count() == 40000


def _xy2d(order, x, y):
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_value_matches_reference_exhaustively(spark):
    from grafink_spark.bucketing import hilbert_value_df

    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x int, y int"
    )
    got = {
        (r.x, r.y): r.hval
        for r in hilbert_value_df(grid, "x", "y", bits=4).collect()
    }
    assert got == {(x, y): _xy2d(16, x, y) for x in range(16) for y in range(16)}


def test_hilbert_curve_is_continuous(spark):
    """The property Z-order lacks: consecutive curve positions are
    Manhattan-adjacent cells — no jumps across the plane."""
    from grafink_spark.bucketing import hilbert_value_df

    grid = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x int, y int"
    )
    inv = {
        r.hval: (r.x, r.y)
        for r in hilbert_value_df(grid, "x", "y", bits=3).collect()
    }
    assert sorted(inv) == list(range(64))
    for d in range(63):
        (x0, y0), (x1, y1) = inv[d], inv[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_hilbert_write_clusters_both_dims(spark, tmp_path):
    import random

    from pyspark.sql import functions as F

    from grafink_spark.bucketing import hilbert_write

    rng = random.Random(5)
    rows = [(rng.randrange(256), rng.randrange(256)) for _ in range(20000)]
    df = spark.createDataFrame(rows, "x int, y int")

    hp = str(tmp_path / "hilbert")
    lp = str(tmp_path / "linear")
    hilbert_write(df, hp, "x", "y", bits=8, num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lp)
    )

    def spread(path, col):
        import pyspark.sql.functions as F

        per_file = (
            spark.read.parquet(path)
            .withColumn("_f", F.input_file_name())
            .groupBy("_f")
            .agg((F.max(col) - F.min(col)).alias("w"))
        )
        return per_file.agg(F.avg("w")).first()[0]

    # the linear layout clusters x tightly but leaves y unclustered;
    # hilbert must beat it on y by a wide margin while keeping x
    # far below the unsorted full range
    assert spread(hp, "y") < 0.5 * spread(lp, "y")
    assert spread(hp, "x") < 0.35 * 256

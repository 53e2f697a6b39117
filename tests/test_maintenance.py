"""Compaction: file counts shrink, data identical, atomic swap."""

from grafink_spark.maintenance import compact_parquet_dir


def test_compact_merges_small_files(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(10_000).selectExpr("id", "id % 7 AS k")
    df.repartition(20).write.parquet(path)

    stats = compact_parquet_dir(spark, path, target_file_mb=128)
    assert stats.files_before == 20
    assert stats.files_after == 1
    assert stats.bytes_total > 0

    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.selectExpr("sum(id) s").first().s == sum(range(10_000))


def test_compact_preserves_hive_partitions(spark, tmp_path):
    path = str(tmp_path / "p")
    df = spark.range(1_000).selectExpr("id", "id % 3 AS day")
    df.repartition(12).write.partitionBy("day").parquet(path)

    stats = compact_parquet_dir(
        spark, path, target_file_mb=128, partition_cols=["day"]
    )
    assert stats.files_after < stats.files_before

    back = spark.read.parquet(path)
    assert back.count() == 1_000
    assert set(back.columns) == {"id", "day"}
    # partition pruning still works on the compacted layout
    assert back.where("day = 1").count() == len(
        [i for i in range(1_000) if i % 3 == 1]
    )


def test_file_clustering_stats_ranks_layouts(spark, tmp_path):
    """The clustering metric must separate a sorted layout (near-zero
    overlap) from a random one (near-total overlap)."""
    import random

    from pyspark.sql import functions as F

    from grafink_spark.maintenance import file_clustering_stats

    rnd = random.Random(3)
    df = spark.createDataFrame(
        [(rnd.randrange(100000),) for _ in range(20000)], "v long"
    )
    sorted_p = str(tmp_path / "sorted")
    random_p = str(tmp_path / "random")
    df.repartitionByRange(8, "v").sortWithinPartitions("v").write.parquet(sorted_p)
    df.repartition(8).write.parquet(random_p)

    s = file_clustering_stats(spark, sorted_p, "v").first()
    r = file_clustering_stats(spark, random_p, "v").first()
    assert s.n_files == 8 and r.n_files == 8
    # range partitioning → disjoint ranges; random → everyone overlaps
    assert s.avg_overlap <= 1.0
    assert r.avg_overlap >= 6.0
    # the sweep must not fall back to a pairwise cartesian product
    plan = file_clustering_stats(spark, random_p, "v")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_file_clustering_stats_matches_bruteforce(spark, tmp_path):
    """Endpoint-sweep overlap counts == brute-force pairwise counts,
    including tied endpoints (touching ranges DO overlap) and an
    all-NULL file (overlaps nothing, still counted in n_files)."""
    from pyspark.sql import functions as F

    from grafink_spark.maintenance import file_clustering_stats

    # 6 files with hand-picked ranges: disjoint, nested, touching at an
    # endpoint, duplicated range, and one all-NULL file.
    ranges = {
        "a": [1, 5],
        "b": [5, 9],      # touches a at 5 → overlaps a
        "c": [2, 3],      # nested in a
        "d": [20, 30],    # disjoint
        "e": [2, 3],      # duplicate of c
    }
    path = str(tmp_path / "bf")
    for name, (lo, hi) in ranges.items():
        spark.createDataFrame([(lo,), (hi,)], "v long").coalesce(1).write.mode(
            "append"
        ).parquet(path)
    spark.createDataFrame(
        [(None,), (None,)], "v long"
    ).coalesce(1).write.mode("append").parquet(path)

    # brute force over the same per-file min/max Spark sees
    per_file = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"), "v")
        .groupBy("f")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    )
    counts = []
    for x in per_file:
        n = sum(
            1
            for y in per_file
            if y.f != x.f
            and x.lo is not None
            and y.lo is not None
            and x.lo <= y.hi
            and y.lo <= x.hi
        )
        counts.append(n)
    expect_avg = round(sum(counts) / len(counts), 3)

    got = file_clustering_stats(spark, path, "v").first()
    assert got.n_files == len(per_file) == 6
    assert got.avg_overlap == expect_avg
    assert got.max_overlap == max(counts)


def test_sorted_compaction_improves_clustering(spark, tmp_path):
    """sort_by compaction turns a random layout into a range-clustered
    one — data identical, avg_overlap drops to ~0."""
    import random

    from grafink_spark.maintenance import (
        compact_parquet_dir,
        file_clustering_stats,
    )

    rnd = random.Random(7)
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(rnd.randrange(100000), i) for i in range(20000)], "v long, payload long"
    )
    df.repartition(8).write.parquet(path)
    before = file_clustering_stats(spark, path, "v").first()
    assert before.avg_overlap >= 6.0  # random: everyone overlaps

    # force multiple output files so clustering is observable
    stats = compact_parquet_dir(spark, path, target_file_mb=1, sort_by=["v"])
    assert stats.files_before == 8

    after = file_clustering_stats(spark, path, "v").first()
    assert after.n_files >= 1
    if after.n_files > 1:
        assert after.avg_overlap <= 1.0  # disjoint ranges

    back = spark.read.parquet(path)
    assert back.count() == 20000
    assert back.selectExpr("sum(payload) s").first().s == sum(range(20000))

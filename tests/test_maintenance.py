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

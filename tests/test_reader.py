"""Reader + partition manager tests (ReaderSpec.scala:21-37,
PartitionManagerSpec.scala:25-50)."""

from datetime import date

import pytest
from pyspark.sql import functions as F

from grafink_spark.config import NewColumn, ReaderConfig, RenameColumn
from grafink_spark.errors import NoDataException
from grafink_spark.sources.partitions import PartitionManager
from grafink_spark.sources.reader import Reader


@pytest.fixture()
def alert_base(spark, tmp_path):
    """Partitioned parquet with a nested candidate struct, like the
    reference fixture (year=2019/month=02/day=01, 5 rows)."""
    base = str(tmp_path / "alerts")
    rows = [
        (f"ZTF19acmbx{i}", (2458500.5 + i, 1, 1000 + i), "Unknown", 0.1 * i, 2019, 2, 1)
        for i in range(5)
    ] + [
        ("ZTF19other", (2458501.5, 2, 2000), "WD*", 0.9, 2019, 2, 2)
    ]
    df = spark.createDataFrame(
        rows,
        "objectId string, candidate struct<jd double, programid int, candid long>, "
        "cdsxmatch string, rfscore double, year int, month int, day int",
    )
    df.write.partitionBy("year", "month", "day").parquet(base)
    return base


def test_padded_and_unpadded_paths():
    pm = PartitionManager(date(2019, 2, 1), 2, padded=True)
    assert pm.partition_paths("/b") == [
        "/b/year=2019/month=02/day=01",
        "/b/year=2019/month=02/day=02",
    ]
    pm2 = PartitionManager(date(2019, 2, 1), 1, padded=False)
    assert pm2.partition_paths("/b") == ["/b/year=2019/month=2/day=1"]


def test_nonexistent_paths_filtered(alert_base):
    pm = PartitionManager(date(2019, 2, 1), 7, padded=True)
    valid = pm.valid_partition_paths(alert_base)
    assert len(valid) == 2  # day=01 and day=02 exist


def test_no_data_raises(alert_base):
    pm = PartitionManager(date(2020, 1, 1), 2, padded=True)
    with pytest.raises(NoDataException):
        pm.valid_partition_paths(alert_base)


def test_read_keeps_partition_columns(spark, alert_base):
    reader = Reader(spark, ReaderConfig(basePath=alert_base))
    df = reader.read(PartitionManager(date(2019, 2, 1), 1))
    assert df.count() == 5  # ReaderSpec golden: partition read count = 5
    assert {"year", "month", "day"} <= set(df.columns)
    assert df.select("day").distinct().collect()[0][0] == 1


def test_process_prune_flatten_derive(spark, alert_base):
    cfg = ReaderConfig(
        basePath=alert_base,
        keepCols=["objectId", "rfscore"],
        keepColsRenamed=[RenameColumn(f="candidate.jd", t="jd")],
        newCols=[NewColumn(name="rowkey", expr="objectId || '_' || jd")],
    )
    reader = Reader(spark, cfg)
    df = reader.read_and_process(PartitionManager(date(2019, 2, 1), 1))
    assert set(df.columns) == {"objectId", "rfscore", "year", "month", "day", "jd", "rowkey"}
    row = df.where(F.col("objectId") == "ZTF19acmbx0").first()
    assert row.jd == 2458500.5
    assert row.rowkey == "ZTF19acmbx0_2458500.5"


def test_partition_filter_predicate(spark, alert_base):
    pm = PartitionManager(date(2019, 2, 2), 1)
    df = spark.read.parquet(alert_base).where(pm.partition_filter())
    assert df.count() == 1


def test_csv_and_json_formats(spark, tmp_path):
    """S1: the reader's format enum covers parquet/csv/json
    (common/models/Format.scala:23-25)."""
    import os

    for fmt in ("csv", "json"):
        base = str(tmp_path / f"alerts_{fmt}")
        day_dir = os.path.join(base, "year=2019", "month=2", "day=1")
        os.makedirs(day_dir)
        if fmt == "csv":
            with open(os.path.join(day_dir, "part-0.csv"), "w") as f:
                f.write("objectId,rfscore\nZTFa,0.95\nZTFb,0.5\n")
        else:
            with open(os.path.join(day_dir, "part-0.json"), "w") as f:
                f.write('{"objectId": "ZTFa", "rfscore": 0.95}\n'
                        '{"objectId": "ZTFb", "rfscore": 0.5}\n')
        reader = Reader(spark, ReaderConfig(basePath=base, format=fmt))
        pm = PartitionManager(date(2019, 2, 1), 1, padded=False)
        df = reader.read(pm)
        assert df.count() == 2
        # partition columns survive via basePath
        assert {"year", "month", "day"} <= set(df.columns)
        assert df.where(F.col("objectId") == "ZTFa").first().rfscore == 0.95


def test_orc_format(spark, tmp_path):
    """S1 extension: the reader's format pass-through covers ORC too —
    any Spark-native columnar source slots in without reader changes."""
    import os

    base = str(tmp_path / "alerts_orc")
    day_dir = os.path.join(base, "year=2019", "month=2", "day=1")
    os.makedirs(day_dir)
    spark.createDataFrame(
        [("ZTFa", 0.95), ("ZTFb", 0.5)], "objectId string, rfscore double"
    ).coalesce(1).write.mode("overwrite").orc(day_dir)
    reader = Reader(spark, ReaderConfig(basePath=base, format="orc"))
    pm = PartitionManager(date(2019, 2, 1), 1, padded=False)
    df = reader.read(pm)
    assert df.count() == 2
    assert {"year", "month", "day"} <= set(df.columns)
    assert df.where(F.col("objectId") == "ZTFa").first().rfscore == 0.95


def test_merge_schema_reads_evolved_partitions(spark, tmp_path):
    """Day 1 written before `drb` existed; with mergeSchema the union
    schema applies and old rows read the new column as null."""
    from datetime import date

    from grafink_spark.config import ReaderConfig
    from grafink_spark.sources.partitions import PartitionManager
    from grafink_spark.sources.reader import Reader

    base = str(tmp_path / "alerts")
    spark.createDataFrame(
        [("a", 0.9)], "objectId string, rfscore double"
    ).write.parquet(f"{base}/year=2019/month=2/day=1")
    spark.createDataFrame(
        [("b", 0.8, 0.7)], "objectId string, rfscore double, drb double"
    ).write.parquet(f"{base}/year=2019/month=2/day=2")

    pm = PartitionManager(date(2019, 2, 1), 2, padded=False)
    r = Reader(spark, ReaderConfig(basePath=base, mergeSchema=True))
    df = r.read(pm)
    assert "drb" in df.columns
    rows = {r_.objectId: r_.drb for r_ in df.collect()}
    assert rows == {"a": None, "b": 0.7}

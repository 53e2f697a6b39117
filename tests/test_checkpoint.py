"""Engine-wide reliable-checkpoint option (util.pin).

~70 operator sites pin layouts / shared subtrees.  By default they use
``localCheckpoint`` — fast, but blocks live on executor local storage
with no lineage, so on a real cluster one lost executor kills a
multi-hour job mid-run.  With the session conf
``spark.grafink.checkpointDir`` set, every pin becomes a RELIABLE
``df.checkpoint()`` into that (HDFS/S3) directory and survives
executor loss.  These tests prove (a) the conf actually routes pins to
reliable checkpoint files on disk, (b) the layout-pinned operators
(zip_with_index, grouped_rank, distributed_cumsum) produce IDENTICAL
results either way, and (c) conf-off still means localCheckpoint (no
files written).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from grafink_spark.util import CHECKPOINT_DIR_CONF, pin


def _rdd_checkpoint_files(root: str) -> list[str]:
    found = []
    for dirpath, dirnames, filenames in os.walk(root):
        for d in dirnames:
            if d.startswith("rdd-"):
                found.append(os.path.join(dirpath, d))
    return found


@pytest.fixture()
def ckdir(spark, tmp_path):
    d = str(tmp_path / "ck")
    spark.conf.set(CHECKPOINT_DIR_CONF, d)
    yield d
    spark.conf.unset(CHECKPOINT_DIR_CONF)


def test_pin_writes_reliable_checkpoint_when_conf_set(spark, ckdir):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    pinned = pin(df)
    assert pinned.count() == 100
    files = _rdd_checkpoint_files(ckdir)
    assert files, "conf set but no reliable checkpoint files written"
    # the pinned frame is checkpointed: its logical plan is a scan over
    # the materialized RDD, not the original range
    assert "Range" not in pinned._jdf.queryExecution().optimizedPlan().toString()


def test_pin_defaults_to_local_checkpoint(spark, tmp_path):
    d = str(tmp_path / "nock")
    df = spark.range(50)
    pinned = pin(df)
    assert pinned.count() == 50
    assert _rdd_checkpoint_files(d) == []


def test_pin_lazy_reliable_materializes_on_first_use(spark, ckdir):
    df = spark.range(64).withColumn("k", F.col("id") % 4)
    pinned = pin(df, eager=False)
    assert pinned.groupBy("k").count().count() == 4
    assert _rdd_checkpoint_files(ckdir), "lazy reliable pin wrote no files"


def test_layout_pinned_operators_identical_under_reliable_checkpoint(spark, ckdir):
    """zip_with_index / grouped_rank / distributed_cumsum pin a range
    partitioning between two passes; a reliable checkpoint must
    preserve partition count and row order exactly like localCheckpoint
    (ReliableCheckpointRDD mirrors the parent's partitions), so ids,
    ranks, and running totals are bit-identical conf-on vs conf-off."""
    from grafink_spark.id_manager import zip_with_index
    from grafink_spark.ops import distributed_cumsum, grouped_rank, skew_report

    base = (
        spark.range(500)
        .withColumn("g", F.col("id") % 3)
        .withColumn("v", (F.col("id") * 7 % 101).cast("decimal(20,4)"))
    )

    def run():
        ids = zip_with_index(
            base.withColumnRenamed("id", "rid"), order_by=["rid"], id_col="idx"
        ).select("rid", "idx")
        ranks = grouped_rank(base, ["g"], ["id"], rank_col="r").select("id", "r", "n")
        cums = distributed_cumsum(base, ["id"], ["v"]).select("id", "cum_v")
        skew = skew_report(base, ["g"], top=3)
        return (
            sorted(map(tuple, ids.collect())),
            sorted(map(tuple, ranks.collect())),
            sorted(map(tuple, cums.collect())),
            sorted(map(tuple, skew.collect())),
        )

    with_conf = run()
    assert _rdd_checkpoint_files(ckdir), "operators did not route through reliable pins"
    spark.conf.unset(CHECKPOINT_DIR_CONF)
    without_conf = run()
    assert with_conf == without_conf

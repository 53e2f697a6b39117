"""CLI contract: golden end-to-end edges, delete mode, exit-code
taxonomy (errors.py mirrors GrafinkException.scala:40-54)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from grafink_spark.cli import main


@pytest.fixture()
def workdir(spark, tmp_path):
    base = str(tmp_path / "alerts")
    df = spark.createDataFrame(
        [
            ("obj1", 0.95, 0, None, None, 2019, 2, 1),
            ("obj1", 0.99, 0, None, None, 2019, 2, 1),
            ("obj2", 0.10, 2, "ML", "ML", 2019, 2, 1),
        ],
        "objectId string, rfscore double, roid int, mulens_class_1 string, "
        "mulens_class_2 string, year int, month int, day int",
    )
    df.write.partitionBy("year", "month", "day").parquet(base)
    cfg = {
        "reader": {"basePath": base},
        "idManager": {"dataPath": str(tmp_path / "ids"), "reservedIdSpace": 10},
        "edgeLoader": {
            "rulesToApply": ["similarityClassifier", "sameValueClassifier"],
            "similarityClassifer": {"similarityExp": "rfscore OR objectId"},
            "sameValueClassifier": {"colsToConnect": ["objectId"]},
            "taskSize": 2500,
            "parallelism": 4,
        },
        "graph": {"storagePath": str(tmp_path / "graph"), "vertexLabel": "alert"},
    }
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return tmp_path, cfg_path


def test_cli_end_to_end_golden_edges(spark, workdir):
    tmp_path, cfg_path = workdir
    assert main(["--config", cfg_path, "--startdate", "2019-02-01"]) == 0
    vertices = spark.read.parquet(str(tmp_path / "graph" / "vertices"))
    vrows = vertices.select("id", "objectId", "rfscore").collect()
    # consecutive ids starting after reservedIdSpace=10
    assert sorted(r.id for r in vrows) == [11, 12, 13]
    obj1 = sorted(r.id for r in vrows if r.objectId == "obj1")
    lo, hi = obj1  # the two obj1 alerts pair up (rfscore OR objectId)

    edges = spark.read.parquet(str(tmp_path / "graph" / "edges"))
    got = {
        (r.label, r.src, r.dst, r.propVal)
        for r in edges.select("label", "src", "dst", "propVal").collect()
    }
    assert got == {
        ("similarity", hi, lo, "2"),
        ("similarity", lo, hi, "2"),
        ("exactmatch", lo, hi, "objectId"),
        ("exactmatch", hi, lo, "objectId"),
    }

    # delete mode removes the window's vertices and their edges
    assert main(["--config", cfg_path, "--startdate", "2019-02-01", "--delete"]) == 0
    assert spark.read.parquet(str(tmp_path / "graph" / "vertices")).count() == 0


def test_cli_exit_codes(workdir):
    tmp_path, cfg_path = workdir
    # duration out of 1..7 → BadArguments (2)
    assert main(["--config", cfg_path, "--startdate", "2019-02-01", "--duration", "9"]) == 2
    # no valid partitions → NoData (9)
    assert main(["--config", cfg_path, "--startdate", "1999-01-01"]) == 9
    # bad similarity expression → BadSimilarityExpression (4)
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["edgeLoader"]["similarityClassifer"]["similarityExp"] = "rfscore XOR"
    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as f:
        json.dump(cfg, f)
    assert main(["--config", bad, "--startdate", "2019-02-01"]) == 4


def test_cli_spark_conf_block_enables_reliable_checkpoints(spark, workdir):
    """A config-file `spark` block must reach the live session — the
    reliable-checkpoint opt-in (spark.grafink.checkpointDir) routes the
    job's id-assignment pins to real checkpoint files, and the job
    still produces its golden edges."""
    import glob

    tmp_path, cfg_path = workdir
    ckdir = str(tmp_path / "ck")
    cfg = json.load(open(cfg_path))
    cfg["spark"] = {"spark.grafink.checkpointDir": ckdir}
    cfg["idManager"]["dataPath"] = str(tmp_path / "ids2")
    cfg["graph"]["storagePath"] = str(tmp_path / "graph2")
    cfg_path2 = str(tmp_path / "config2.json")
    json.dump(cfg, open(cfg_path2, "w"))
    try:
        assert main(["--config", cfg_path2, "--startdate", "2019-02-01"]) == 0
        # the conf reached the LIVE session (this tiny job's file-scan
        # inputs need no layout pins, so prove the plumbing by pinning)
        assert spark.conf.get("spark.grafink.checkpointDir") == ckdir
        from grafink_spark.util import pin

        assert pin(spark.range(10)).count() == 10
        rdds = [
            d
            for d, dirnames, _ in os.walk(ckdir)
            for d in [os.path.join(d, x) for x in dirnames]
            if os.path.basename(d).startswith("rdd-")
        ]
        assert rdds, "spark block set but pin() wrote no reliable checkpoints"
        edges = spark.read.parquet(
            os.path.join(str(tmp_path / "graph2"), "edges")
        )
        assert edges.where(F.col("label") == "similarity").count() == 2
    finally:
        spark.conf.unset("spark.grafink.checkpointDir")

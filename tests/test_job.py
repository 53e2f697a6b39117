"""End-to-end job: partitioned parquet alerts → ids → vertices + edges
(the reference's VertexProcessorSpec/EdgeProcessorSpec end-to-end shape)."""

import json
from datetime import date

from grafink_spark.cli import main as cli_main
from grafink_spark.config import GrafinkConfig
from grafink_spark.graph.query import GraphQuery
from grafink_spark.job import Job
from tests.conftest import ALERT_SCHEMA, alert


def _write_day(spark, base, rows):
    df = spark.createDataFrame(rows, ALERT_SCHEMA).drop("id")
    df.write.mode("append").partitionBy("year", "month", "day").parquet(base)


def _config(tmp_path):
    return GrafinkConfig.from_dict(
        {
            "reader": {"basePath": str(tmp_path / "alerts")},
            "idManager": {"dataPath": str(tmp_path / "ids"), "reservedIdSpace": 7},
            "edgeLoader": {
                "rulesToApply": ["similarityClassifier", "sameValueClassifier"],
                "similarityClassifer": {"similarityExp": "rfscore OR objectId"},
                "sameValueClassifier": {"colsToConnect": ["objectId"]},
                "taskSize": 2500,
                "parallelism": 4,
            },
            "graph": {"storagePath": str(tmp_path / "graph"), "vertexLabel": "alert"},
        }
    )


def test_job_process_end_to_end(spark, tmp_path):
    base = str(tmp_path / "alerts")
    _write_day(
        spark,
        base,
        [
            alert(0, "obj1", 0.95, 0.2, 0, 0.5, "WD*", None, None),
            alert(0, "obj1", 0.99, 0.2, 0, 0.5, "AGN", None, None),
            alert(0, "obj2", 0.10, 0.2, 0, 0.5, "AGN", None, None),
        ],
    )
    job = Job(spark, _config(tmp_path))
    result = job.process(date(2019, 2, 1), 1)
    assert result.vertices_loaded == 3
    # ids 8,9,10; obj1 pair matches rfscore+objectId; similarity edges ×2 dirs
    q = GraphQuery(job.store)
    assert q.vertex_count() == 3
    sim = job.store.edges().where("label = 'similarity'")
    assert sim.count() == result.edge_counts["similarity"]
    assert result.edge_counts["exactmatch"] >= 2
    info = job.catalog.info()
    assert "alert" in info["vertexLabels"]
    assert {e["name"] for e in info["edgeLabels"]} == {"similarity", "exactmatch"}


def test_job_incremental_and_delete(spark, tmp_path):
    base = str(tmp_path / "alerts")
    _write_day(spark, base, [alert(0, "obj1", 0.5, 0.2, 0, 0.5, "WD*", None, None)])
    cfg = _config(tmp_path)
    job = Job(spark, cfg)
    job.process(date(2019, 2, 1), 1)
    v1 = GraphQuery(job.store).vertex_count()

    rows2 = [alert(0, "obj1", 0.6, 0.2, 0, 0.5, "WD*", None, None)]
    df2 = spark.createDataFrame(rows2, ALERT_SCHEMA).drop("id")
    df2 = df2.withColumn("day", df2.day + 1)
    df2.write.mode("append").partitionBy("year", "month", "day").parquet(base)
    job.process(date(2019, 2, 2), 1)
    assert GraphQuery(job.store).vertex_count() == v1 + 1
    # same objectId across batches → new-old exactmatch edge exists
    em = job.store.edges().where("label = 'exactmatch'")
    assert em.count() >= 2

    deleted = job.delete(date(2019, 2, 2), 1)
    assert deleted == 1
    assert GraphQuery(job.store).vertex_count() == v1


def test_cli_exit_codes(tmp_path):
    # bad duration → exit code 2 (BadArgumentsException)
    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps({"reader": {"basePath": "/nonexistent"}}))
    rc = cli_main(["--config", str(cfg), "--duration", "9"])
    assert rc == 2

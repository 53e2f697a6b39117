"""Config model + error taxonomy (no Spark session needed)."""

import json

import pytest

from grafink_spark.config import GrafinkConfig
from grafink_spark.errors import (
    BadArgumentsException,
    BadSimilarityExpression,
    GrafinkException,
    MissingFixedVertex,
    NoDataException,
    exit_code_for,
)


def test_defaults_and_round_trip(tmp_path):
    cfg = GrafinkConfig.from_dict(
        {
            "reader": {"basePath": "/data/alerts", "keepCols": ["objectId"]},
            "idManager": {"dataPath": "/data/ids", "reservedIdSpace": 50},
            "edgeLoader": {
                "rulesToApply": ["similarityClassifier"],
                "similarityClassifer": {"similarityExp": "rfscore OR objectId"},
            },
            "graph": {"storagePath": "/data/graph"},
        }
    )
    assert cfg.reader.basePath == "/data/alerts"
    assert cfg.reader.format == "parquet"  # default (Format.scala:23-25)
    assert cfg.idManager.reservedIdSpace == 50
    assert cfg.edgeLoader.parallelism == 100  # reference defaults
    assert cfg.edgeLoader.taskSize == 25000
    assert cfg.edgeLoader.similarityClassifer.similarityExp == "rfscore OR objectId"
    assert cfg.graph.vertexLabel == "alert"

    p = tmp_path / "c.json"
    p.write_text(
        json.dumps({"reader": {"basePath": "/x"}, "graph": {"storagePath": "/g"}})
    )
    loaded = GrafinkConfig.load(str(p))
    assert loaded.reader.basePath == "/x"


def test_exit_code_taxonomy():
    # mirrors GrafinkException.scala:40-54
    assert exit_code_for(BadArgumentsException("x")) == 2
    assert exit_code_for(BadSimilarityExpression("x")) == 4
    assert exit_code_for(MissingFixedVertex("x")) == 5
    assert exit_code_for(NoDataException("x")) == 9
    assert exit_code_for(GrafinkException("x")) == 1
    assert exit_code_for(RuntimeError("x")) == 1


def test_unknown_rule_rejected():
    with pytest.raises(Exception):
        from grafink_spark.rules.exp_parser import parse_similarity_exp

        parse_similarity_exp("rfscore OR")  # dangling operator

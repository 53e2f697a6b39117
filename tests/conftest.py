"""Shared pytest fixtures: one local SparkSession + alert-row builders
mirroring the reference's genAlert (SimilarityClassifierSpec.scala:20-52)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from grafink_spark.session import get_spark

ALERT_SCHEMA = (
    "id long, objectId string, candid long, cdsxmatch string, rfscore double, "
    "snn_snia_vs_nonia double, snn_sn_vs_all double, drb float, ndethist int, "
    "classtar float, roid int, mulens_class_1 string, mulens_class_2 string, "
    "year int, month int, day int"
)


def alert(
    id: int,
    objectId: str,
    rfscore: float,
    snn_snia_vs_nonia: float,
    roid: int,
    classtar: float,
    cdsxmatch: str,
    mulens_class_1: str | None,
    mulens_class_2: str | None,
    snn_sn_vs_all: float = 0.80,
    drb: float = 0.79,
    ndethist: int = 392,
) -> dict:
    return {
        "id": id,
        "objectId": objectId,
        "candid": 1034528862715010005 + id,
        "cdsxmatch": cdsxmatch,
        "rfscore": rfscore,
        "snn_snia_vs_nonia": snn_snia_vs_nonia,
        "snn_sn_vs_all": snn_sn_vs_all,
        "drb": drb,
        "ndethist": ndethist,
        "classtar": classtar,
        "roid": roid,
        "mulens_class_1": mulens_class_1,
        "mulens_class_2": mulens_class_2,
        "year": 2019,
        "month": 2,
        "day": 1,
    }


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    return get_spark("grafink-tests", master="local[4]", shuffle_partitions=8)


@pytest.fixture()
def alerts_df(spark):
    def make(rows: list[dict]):
        return spark.createDataFrame(rows, ALERT_SCHEMA)

    return make


def edge_set(df) -> set[tuple]:
    return {tuple(r) for r in df.select("src", "dst", "propVal").collect()}

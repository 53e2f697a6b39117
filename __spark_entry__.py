"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the similarity classifier —
grafink's core operator — over alert-shaped events at sf0.001).
``queries()``/``oracle_sql()`` expose the full operator inventory from
SURVEY.md §2 plus the LLM-pipeline operators; implementations live in
``grafink_spark.benchqueries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from grafink_spark.benchqueries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["similarity_edges"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM ops)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; entries absent here (media
    kernel, approximate ANN) get the driver's rows-only check."""
    return dict(ORACLES)

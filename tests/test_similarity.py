"""Golden tests from SimilarityClassifierSpec.scala:56-215, run through
both the reference-shaped theta join and the decomposed scale path."""

import pytest

from grafink_spark.rules.similarity import SimilarityClassifier
from tests.conftest import alert, edge_set

MODES = ["reference", "decomposed"]


@pytest.mark.parametrize("mode", MODES)
def test_new_old_edge(spark, alerts_df, mode):
    rule = SimilarityClassifier("rfscore OR objectId", mode=mode)
    loaded = alerts_df(
        [alert(1, "ZTF19acmbyav", 0.388, 0.36001157760620117, 1, 0.0, "WD*", None, None)]
    )
    current = alerts_df(
        [alert(2, "ZTF19acmbyav", 0.988, 0.67001157760620889, 0, 0.0, "Unknown", None, None)]
    )
    assert edge_set(rule.classify(loaded, current)) == {(2, 1, 1)}


@pytest.mark.parametrize("mode", MODES)
def test_new_new_edge(spark, alerts_df, mode):
    rule = SimilarityClassifier("rfscore OR objectId", mode=mode)
    current = alerts_df(
        [
            alert(1, "ZTF19acmbyav", 0.388, 0.36001157760620117, 1, 0.0, "WD*", None, None),
            alert(2, "ZTF19acmbyav", 0.988, 0.67001157760620889, 0, 0.0, "Unknown", None, None),
        ]
    )
    loaded = alerts_df(
        [alert(3, "ZTF20acmkyap", 0.188, 0.67001157760620889, 0, 0.2, "Unknown", None, None)]
    )
    assert edge_set(rule.classify(loaded, current)) == {(2, 1, 1)}


@pytest.mark.parametrize("mode", MODES)
def test_similarity_value_counts_matching_conditions(spark, alerts_df, mode):
    rule = SimilarityClassifier(
        "(rfscore AND snn_snia_vs_nonia) OR mulens OR classtar OR cdsxmatch "
        "OR objectId OR roid",
        mode=mode,
    )
    loaded = alerts_df(
        [alert(1, "toto", 0.99, 0.8, 3, 0.0, "C*", "CONSTANT", "CONSTANT")]
    )
    current = alerts_df(
        [alert(2, "toto", 0.95, 0.95, 2, 0.0, "C*", "ML", "CONSTANT")]
    )
    # matching conditions: rfscore, classtar, cdsxmatch, objectId, roid = 5
    assert edge_set(rule.classify(loaded, current)) == {(2, 1, 5)}


@pytest.mark.parametrize("mode", MODES)
def test_no_self_pairs_or_duplicates(spark, alerts_df, mode):
    rule = SimilarityClassifier("objectId", mode=mode)
    current = alerts_df(
        [
            alert(5, "X", 0.1, 0.1, 0, 0.5, "Unknown", None, None),
            alert(6, "X", 0.1, 0.1, 0, 0.5, "Unknown", None, None),
            alert(7, "Y", 0.1, 0.1, 0, 0.5, "Unknown", None, None),
        ]
    )
    loaded = alerts_df([])
    assert edge_set(rule.classify(loaded, current)) == {(6, 5, 1)}


@pytest.mark.parametrize("mode", MODES)
def test_null_safe_default_equality(spark, alerts_df, mode):
    # default token condition is null-safe <=> : two null mulens_class_1
    # values match (SimilarityExpParser.scala:58)
    rule = SimilarityClassifier("mulens_class_one", mode=mode)
    current = alerts_df(
        [
            alert(5, "A", 0.1, 0.1, 0, 0.5, "Unknown", None, None),
            alert(6, "B", 0.1, 0.1, 0, 0.5, "Unknown", None, None),
        ]
    ).withColumnRenamed("mulens_class_1", "mulens_class_one")
    loaded = alerts_df([]).withColumnRenamed("mulens_class_1", "mulens_class_one")
    assert edge_set(rule.classify(loaded, current)) == {(6, 5, 1)}


def test_modes_agree_on_larger_random_batch(spark, alerts_df):
    import random

    rnd = random.Random(7)
    rows = [
        alert(
            i,
            f"obj{rnd.randint(0, 20)}",
            rnd.random(),
            rnd.random(),
            rnd.randint(0, 3),
            rnd.random(),
            rnd.choice(["Unknown", "WD*", "AGN", "C*"]),
            rnd.choice([None, "ML", "CONSTANT"]),
            rnd.choice([None, "ML", "CONSTANT"]),
        )
        for i in range(1, 61)
    ]
    current = alerts_df(rows[:30])
    loaded = alerts_df(rows[30:])
    exp = "(rfscore AND snn_snia_vs_nonia) OR mulens OR classtar OR cdsxmatch OR objectId OR roid"
    ref = edge_set(SimilarityClassifier(exp, mode="reference").classify(loaded, current))
    dec = edge_set(SimilarityClassifier(exp, mode="decomposed").classify(loaded, current))
    assert ref == dec
    assert len(ref) > 0


def test_salted_hot_key_equivalence(spark):
    """Output-skew salting in the decomposed equality branches: forcing
    the hot path (tiny threshold, odd bucket count) must reproduce the
    reference-mode edge set exactly, nulls included."""
    from pyspark.sql import functions as F

    rows = spark.range(600).select(
        F.col("id"),
        F.when(F.col("id") % 13 == 0, None)
        .otherwise(F.concat(F.lit("obj"), F.col("id") % 12))
        .alias("objectId"),
        ((F.abs(F.hash(F.col("id") + 7)) % 1000) / 1000.0).alias("rfscore"),
        F.lit("AGN").alias("cdsxmatch"),
    )
    cur = rows.where("id % 3 != 0")
    old = rows.where("id % 3 = 0")
    salted = SimilarityClassifier(
        "objectId OR rfscore", mode="decomposed", hot_threshold=4, salt_buckets=5
    ).classify(old, cur)
    ref = SimilarityClassifier("objectId OR rfscore", mode="reference").classify(
        old, cur
    )
    assert edge_set(salted) == edge_set(ref)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

"""Golden tests from SameValueClassifierSpec.scala:17-213."""

from grafink_spark.rules.samevalue import SameValueClassifier
from tests.conftest import alert, edge_set


def _current(alerts_df):
    return alerts_df(
        [
            alert(1, "obj1", 0.92, 0.95, 1, 0.0, "WD*", None, None),
            alert(2, "obj2", 0.35, 0.8999, 1, 0.0, "WD*", "ML", "ML"),
            alert(3, "obj1", 0.35, 0.8999, 2, 0.0, "WD*", "ML", "ML"),
        ]
    )


def test_same_value_single_column(spark, alerts_df):
    current = _current(alerts_df)
    loaded = alerts_df(
        [
            alert(4, "obj3", 0.92, 0.95, 1, 0.0, "WD*", None, None),
            alert(13, "obj1", 0.92, 0.95, 1, 0.0, "WD*", None, None),
            alert(4, "obj5", 0.92, 0.95, 1, 0.0, "WD*", None, None),
        ]
    )
    rule = SameValueClassifier(["objectId"])
    assert edge_set(rule.classify(loaded, current)) == {
        (1, 3, "objectId"),
        (1, 13, "objectId"),
        (3, 13, "objectId"),
    }


def test_same_value_two_columns(spark, alerts_df):
    current = alerts_df(
        [
            alert(1, "obj1", 0.92, 0.95, 1, 0.0, "WD*", None, None),
            alert(2, "obj2", 0.35, 0.8999, 1, 0.0, "WD*", "ML", "ML"),
            alert(3, "obj1", 0.35, 0.8999, 2, 0.0, "AGN", "ML", "ML"),
        ]
    )
    loaded = alerts_df(
        [
            alert(4, "obj3", 0.92, 0.95, 1, 0.0, "WD*", None, None),
            alert(13, "obj1", 0.92, 0.95, 1, 0.0, "Cepheid", None, None),
            alert(4, "obj5", 0.92, 0.95, 1, 0.0, "C*", None, None),
        ]
    )
    rule = SameValueClassifier(["objectId", "cdsxmatch"])
    assert edge_set(rule.classify(loaded, current)) == {
        (1, 3, "objectId"),
        (1, 13, "objectId"),
        (3, 13, "objectId"),
        (1, 2, "cdsxmatch"),
        (1, 4, "cdsxmatch"),
        (2, 4, "cdsxmatch"),
    }


def test_empty_loaded_gives_clique_only(spark, alerts_df):
    rule = SameValueClassifier(["objectId"])
    edges = rule.classify(alerts_df([]), _current(alerts_df))
    assert edge_set(edges) == {(1, 3, "objectId")}

"""Golden tests from TwoModeClassifierSpec.scala:18-214."""

import pytest

from grafink_spark.errors import MissingFixedVertex
from grafink_spark.rules.twomode import TwoModeClassifier
from grafink_spark.sources.fixed_vertices import FixedVertex, FixedVertexProperty
from tests.conftest import alert, edge_set


def _fv(id, *props):
    return FixedVertex(
        id, "similarity", [FixedVertexProperty(n, t, v) for (n, t, v) in props]
    )


def test_direct_recipes(spark, alerts_df):
    recipes = [
        _fv(1, ("recipe", "string", "supernova")),
        _fv(2, ("recipe", "string", "microlensing")),
        _fv(3, ("recipe", "string", "asteroids")),
    ]
    rule = TwoModeClassifier(["supernova", "microlensing", "asteroids"], recipes)
    current = alerts_df(
        [
            alert(10, "ZTF19acmbyav", 0.92, 0.95, 1, 0.6, "Unknown", None, None,
                  snn_sn_vs_all=0.87, drb=0.78, ndethist=170),
            alert(12, "ZTF19acmbyap", 0.35, 0.8999, 1, 0.0, "WD*", "ML", "ML"),
            alert(13, "ZTF19acmbyap", 0.35, 0.8999, 2, 0.0, "WD*", "ML", "ML"),
        ]
    )
    loaded = alerts_df([])
    assert edge_set(rule.classify(loaded, current)) == {
        (10, 1, 0.0),
        (12, 2, 0.0),
        (13, 2, 0.0),
        (13, 3, 0.0),
    }


def test_catalog_exact_match(spark, alerts_df):
    recipes = [
        _fv(1, ("recipe", "string", "catalog"), ("equals", "string", "EB*")),
        _fv(4, ("recipe", "string", "catalog"), ("equals", "string", "AGN")),
    ]
    rule = TwoModeClassifier(["catalog"], recipes)
    ids = [57424640, 68062208, 80266496, 80283904, 88313856]
    current = alerts_df(
        [alert(i, "ZTF18aaacpwn", 0.374, 0.85, 0, 1.0, "EB*", None, "VARIABLE") for i in ids]
    )
    loaded = alerts_df([])
    assert edge_set(rule.classify(loaded, current)) == {
        (i, 1, 0.0) for i in ids
    }


def test_missing_fixed_vertex_raises(spark, alerts_df):
    recipes = [_fv(1, ("recipe", "string", "supernova"))]
    rule = TwoModeClassifier(["supernova", "microlensing"], recipes)
    current = alerts_df(
        [alert(10, "ZTF19acmbyav", 0.92, 0.95, 1, 0.0, "WD*", None, None)]
    )
    with pytest.raises(MissingFixedVertex):
        rule.classify(alerts_df([]), current)

"""CDC merge (upsert/delete) and SCD2 range tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from grafink_spark import cdc


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, val double",
    )


def test_merge_applies_insert_update_delete(spark):
    changes = spark.createDataFrame(
        [
            (2, "b2", 25.0, "U", 1),
            (3, None, None, "D", 1),
            (4, "d", 40.0, "I", 1),
        ],
        "k long, name string, val double, _op string, _seq int",
    )
    out = {
        r["k"]: (r["name"], r["val"])
        for r in cdc.merge_changes(_base(spark), changes, "k").collect()
    }
    assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 4: ("d", 40.0)}


def test_merge_latest_seq_wins_per_key(spark):
    # key 2: updated at seq 1, deleted at seq 2 → gone
    # key 3: deleted at seq 1, re-inserted at seq 2 → new payload
    changes = spark.createDataFrame(
        [
            (2, "b2", 25.0, "U", 1),
            (2, None, None, "D", 2),
            (3, None, None, "D", 1),
            (3, "c2", 33.0, "I", 2),
        ],
        "k long, name string, val double, _op string, _seq int",
    )
    out = {
        r["k"]: (r["name"], r["val"])
        for r in cdc.merge_changes(_base(spark), changes, "k").collect()
    }
    assert out == {1: ("a", 10.0), 3: ("c2", 33.0)}


def test_merge_empty_changeset_is_identity(spark):
    changes = spark.createDataFrame(
        [], "k long, name string, val double, _op string, _seq int"
    )
    out = cdc.merge_changes(_base(spark), changes, "k")
    assert sorted(r["k"] for r in out.collect()) == [1, 2, 3]


def test_touched_partitions(spark):
    changes = spark.createDataFrame(
        [(25, "x", 0.0, "U", 1), (47, "y", 0.0, "D", 1)],
        "k long, name string, val double, _op string, _seq int",
    )
    parts = cdc.touched_partitions(changes, F.col("k") % 10, "k")
    assert sorted(parts) == [5, 7]


def test_scd2_ranges_golden(spark):
    hist = spark.createDataFrame(
        [
            (1, "2024-01-01", 100),
            (1, "2024-02-01", 101),
            (1, "2024-02-01", 102),  # same-day tie → order by tiebreak
            (2, "2024-03-01", 200),
        ],
        "k long, d string, ver int",
    )
    rows = {
        r["ver"]: (r["valid_from"], r["valid_to"], r["is_current"])
        for r in cdc.scd2_ranges(
            hist, key="k", change_ts="d", order_tiebreak="ver"
        ).collect()
    }
    assert rows[100] == ("2024-01-01", "2024-02-01", False)
    assert rows[101] == ("2024-02-01", "2024-02-01", False)
    assert rows[102] == ("2024-02-01", None, True)
    assert rows[200] == ("2024-03-01", None, True)

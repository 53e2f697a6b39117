"""asof_join / range_join golden tests."""

from datetime import datetime

from grafink_spark.ops import asof_join, range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T10:00:00"), 5.0),
            (2, 100, _ts("2024-01-01T12:00:00"), 6.0),
            (3, 200, _ts("2024-01-01T09:00:00"), 7.0),  # no prior right
            (4, 300, _ts("2024-01-01T10:00:00"), 8.0),  # equal-ts match
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (11, 100, _ts("2024-01-01T09:30:00"), 1.0),
            (12, 100, _ts("2024-01-01T11:00:00"), 2.0),
            (13, 200, _ts("2024-01-01T09:30:00"), 3.0),  # after left 3
            (14, 300, _ts("2024-01-01T10:00:00"), 4.0),  # ts == left 4
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = asof_join(
        left, right, on="user_id", ts="ts",
        right_cols=["event_id", "value"], suffix="_r",
    )
    got = {r.event_id: (r.event_id_r, r.value_r) for r in out.collect()}
    assert got == {
        1: (11, 1.0),   # latest right before 10:00 is 09:30
        2: (12, 2.0),   # 11:00 beats 09:30
        3: (None, None),  # nothing at-or-before 09:00
        4: (14, 4.0),   # equal timestamps match (<= semantics)
    }
    # left columns survive unchanged
    assert {r.event_id: r.value for r in out.collect()}[1] == 5.0


def test_range_join_bucket_boundaries(spark):
    # delta and boundary diffs chosen exactly representable in binary
    # floats (0.5, 1.0, 1.5 …) so inclusivity is actually exercised
    a = spark.createDataFrame(
        [(1, 1.0), (2, 3.0), (3, 9.0)], "id_a long, v double"
    )
    b = spark.createDataFrame(
        [(10, 1.5), (11, 0.75), (12, 2.25), (13, 3.0)], "id_b long, v double"
    )
    out = range_join(a, b, "v", 0.5)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    # 1↔10: diff exactly 0.5 (inclusive), neighbor bucket; 1↔11: diff
    # 0.25, lower bucket; 2↔13: diff 0 same bucket; 2↔12 diff 0.75 out;
    # 3 matches nothing
    assert got == {(1, 10), (1, 11), (2, 13)}

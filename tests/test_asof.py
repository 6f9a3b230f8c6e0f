"""As-of join unit tests: inclusive-at-tie semantics, left mode, no
prior-row cases."""

from __future__ import annotations

import datetime as dt


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    from ftm_datalake_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "l1"),
            (1, _ts("2024-01-01T12:00:00"), "l2"),
            (2, _ts("2024-01-01T09:00:00"), "l3"),  # no prior right row
        ],
        "key long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 10.0),
            (1, _ts("2024-01-01T12:00:00"), 20.0),  # exact tie with l2 → inclusive
            (2, _ts("2024-01-01T11:00:00"), 30.0),  # after l3
        ],
        "key long, ts timestamp, value double",
    )
    inner = {
        r["tag"]: r["key_asof_value"]
        for r in asof_join(left, right, "key", "ts", "ts").collect()
    }
    assert inner == {"l1": 10.0, "l2": 20.0}  # l3 dropped (no prior)

    left_mode = {
        r["tag"]: r["key_asof_value"]
        for r in asof_join(left, right, "key", "ts", "ts", how="left").collect()
    }
    assert left_mode == {"l1": 10.0, "l2": 20.0, "l3": None}


def test_asof_join_right_tie_deterministic(spark):
    """Multiple right rows on the SAME (key, ts): the greatest carried
    tuple wins, identically across runs/partitionings — never
    partition-order-dependent."""
    from ftm_datalake_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "l1")], "key long, ts timestamp, tag string"
    )
    rows = [
        (1, _ts("2024-01-01T10:00:00"), 5.0),
        (1, _ts("2024-01-01T10:00:00"), 99.0),  # tied ts: greatest tuple wins
        (1, _ts("2024-01-01T10:00:00"), 42.0),
    ]
    for attempt in range(3):
        # vary input partitioning/order to smoke out order-dependence
        right = spark.createDataFrame(
            rows[attempt:] + rows[:attempt], "key long, ts timestamp, value double"
        ).repartition(4)
        got = asof_join(left, right, "key", "ts", "ts").collect()
        assert [r["key_asof_value"] for r in got] == [99.0]


def test_asof_forward_inclusive_ties_and_left(spark):
    """Forward as-of: earliest right with ts >= left ts (inclusive);
    smallest carried tuple wins at ties; how='left' keeps unmatched."""
    from ftm_datalake_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T12:00:00"), "a"),  # matches same-ts right
            (1, _ts("2024-01-01T13:30:00"), "b"),  # matches the 14:00 row
            (1, _ts("2024-01-01T15:00:00"), "c"),  # nothing after
            (2, _ts("2024-01-01T00:00:00"), "d"),  # other key, no rights
        ],
        "key long, ts timestamp, tag string",
    )
    rows = [
        (1, _ts("2024-01-01T12:00:00"), 7.0),
        (1, _ts("2024-01-01T12:00:00"), 3.0),  # tied ts: SMALLEST tuple wins
        (1, _ts("2024-01-01T14:00:00"), 9.0),
    ]
    for attempt in range(3):
        right = spark.createDataFrame(
            rows[attempt:] + rows[:attempt], "key long, ts timestamp, value double"
        ).repartition(4)
        inner = {
            r["tag"]: r["key_next_value"]
            for r in asof_join_forward(left, right, "key", "ts", "ts").collect()
        }
        assert inner == {"a": 3.0, "b": 9.0}
        outer = {
            r["tag"]: r["key_next_value"]
            for r in asof_join_forward(
                left, right, "key", "ts", "ts", how="left"
            ).collect()
        }
        assert outer == {"a": 3.0, "b": 9.0, "c": None, "d": None}


def test_asof_tolerance_window(spark):
    """tolerance_us voids stale matches (merge_asof parity): within the
    window the match holds; outside it behaves as no-match for both
    how='inner' (dropped) and how='left' (nulls)."""
    from ftm_datalake_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T12:00:00"), "fresh"),   # 30 min after right
            (1, _ts("2024-01-01T18:00:00"), "stale"),   # 6.5 h after right
        ],
        "key long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T11:30:00"), 5.0)],
        "key long, ts timestamp, value double",
    )
    one_hour = 3_600_000_000
    inner = {
        r["tag"]: r["key_asof_value"]
        for r in asof_join(
            left, right, "key", "ts", "ts", tolerance_us=one_hour
        ).collect()
    }
    assert inner == {"fresh": 5.0}
    outer = {
        r["tag"]: r["key_asof_value"]
        for r in asof_join(
            left, right, "key", "ts", "ts", how="left", tolerance_us=one_hour
        ).collect()
    }
    assert outer == {"fresh": 5.0, "stale": None}
    # no tolerance: both match
    both = {
        r["tag"]: r["key_asof_value"]
        for r in asof_join(left, right, "key", "ts", "ts").collect()
    }
    assert both == {"fresh": 5.0, "stale": 5.0}


def test_asof_nearest_direction_and_tolerance(spark):
    """Nearest as-of picks the closer of before/after; ties prefer the
    backward match (pandas direction='nearest'); tolerance bounds |dt|."""
    from ftm_datalake_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T12:00:00"), "closer_before"),  # 10m after r1, 50m before r2
            (1, _ts("2024-01-01T12:40:00"), "closer_after"),   # 50m after r1, 10m before r2
            (1, _ts("2024-01-01T12:20:00"), "tie"),            # 30m both ways
            (2, _ts("2024-01-01T12:00:00"), "lonely"),
        ],
        "key long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T11:50:00"), 1.0),
            (1, _ts("2024-01-01T12:50:00"), 2.0),
        ],
        "key long, ts timestamp, value double",
    )
    got = {
        r["tag"]: r["key_nearest_value"]
        for r in asof_join_nearest(left, right, "key", "ts", "ts").collect()
    }
    assert got == {"closer_before": 1.0, "closer_after": 2.0, "tie": 1.0}
    # tolerance 15 min: the tie row (30 min either way) loses its match
    tol = 15 * 60 * 1_000_000
    outer = {
        r["tag"]: r["key_nearest_value"]
        for r in asof_join_nearest(
            left, right, "key", "ts", "ts", how="left", tolerance_us=tol
        ).collect()
    }
    assert outer == {
        "closer_before": 1.0,
        "closer_after": 2.0,
        "tie": None,
        "lonely": None,
    }

"""Unit tests for the bucketized interval-overlap join."""

from __future__ import annotations

from datetime import datetime

from ftm_datalake_spark.operators.rangejoin import interval_overlap_join


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def _frames(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        left_rows, "k long, l_id long, l_start timestamp, l_end timestamp"
    )
    right = spark.createDataFrame(
        right_rows, "k long, r_id long, r_start timestamp, r_end timestamp"
    )
    return left, right


def test_overlap_is_half_open_and_key_scoped(spark):
    left, right = _frames(
        spark,
        [
            (1, 1, _ts(1), _ts(2)),  # touches r1's start exactly → no match
            (1, 2, _ts(3), _ts(5)),  # overlaps r1
            (2, 3, _ts(3), _ts(5)),  # same times, different key → no match
        ],
        [(1, 1, _ts(2), _ts(4))],
    )
    out = interval_overlap_join(
        left, right, "k", "l_start", "l_end", "r_start", "r_end"
    ).collect()
    assert [(r["l_id"], r["r_id"]) for r in out] == [(2, 1)]


def test_multi_bucket_pairs_are_deduplicated(spark):
    # both intervals span many hour buckets → candidates meet repeatedly,
    # output must still be one row per pair
    left, right = _frames(
        spark,
        [(1, 1, _ts(0), _ts(23))],
        [(1, 1, _ts(1), _ts(22))],
    )
    out = interval_overlap_join(
        left, right, "k", "l_start", "l_end", "r_start", "r_end"
    ).collect()
    assert len(out) == 1


def test_zero_length_interval_matches_containing_window(spark):
    left, right = _frames(
        spark,
        [(1, 1, _ts(5), _ts(5))],
        [(1, 1, _ts(4), _ts(6))],
    )
    out = interval_overlap_join(
        left, right, "k", "l_start", "l_end", "r_start", "r_end"
    ).collect()
    assert len(out) == 1

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


# ------------------------------------------------------------ property
def test_overlap_join_equals_naive_predicate_on_random_intervals(spark):
    """Property: the bucketized plan produces exactly the rows the naive
    O(n^2) overlap predicate produces, for arbitrary interval layouts
    (including spans far longer than the bucket width)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    iv = st.tuples(
        st.integers(0, 3),  # key
        st.integers(0, 200_000),  # start offset seconds
        st.integers(0, 100_000),  # duration seconds
    )

    @settings(max_examples=15, deadline=None)
    @given(st.lists(iv, min_size=1, max_size=8), st.lists(iv, min_size=1, max_size=8))
    def run(lrows, rrows):
        from datetime import datetime, timedelta

        base = datetime(2024, 1, 1)
        mk = lambda rows, a, b: [  # noqa: E731
            (k, i, base + timedelta(seconds=s), base + timedelta(seconds=s + d))
            for i, (k, s, d) in enumerate(rows)
        ]
        left = spark.createDataFrame(
            mk(lrows, "l_start", "l_end"),
            "k long, l_id long, l_start timestamp, l_end timestamp",
        )
        right = spark.createDataFrame(
            mk(rrows, "r_start", "r_end"),
            "k long, r_id long, r_start timestamp, r_end timestamp",
        )
        got = {
            (r["k"], r["l_id"], r["r_id"])
            for r in interval_overlap_join(
                left, right, "k", "l_start", "l_end", "r_start", "r_end"
            ).collect()
        }
        expected = set()
        for li, (lk, ls, ld) in enumerate(lrows):
            for ri, (rk, rs, rd) in enumerate(rrows):
                if lk == rk and ls < rs + rd and rs < ls + ld:
                    expected.add((lk, li, ri))
        assert got == expected

    run()

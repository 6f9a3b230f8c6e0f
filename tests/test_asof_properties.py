"""Property-based tests for the as-of join family: for ANY set of left
and right timestamped rows, each variant must match the brute-force
python reference (latest-before / earliest-after / nearest with
backward-wins ties), independent of row order and partitioning."""

from __future__ import annotations

import pytest

import datetime as dt

from hypothesis import given, settings, strategies as st

from pyspark.sql import SparkSession

BASE = dt.datetime(2024, 1, 1)
TS = [BASE + dt.timedelta(minutes=10 * i) for i in range(8)]
KEYS = [1, 2]

left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.sampled_from(TS)),
    min_size=1,
    max_size=6,
    unique=True,
)
right_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.sampled_from(TS), st.integers(0, 5)),
    min_size=0,
    max_size=6,
    unique=True,
)


def test_0_session_bootstrap(spark):
    assert spark.range(1).count() == 1


def _brute(lrows, rrows, mode):
    out = {}
    for k, lts in lrows:
        cands = []
        for rk, rts, v in rrows:
            if rk != k:
                continue
            if mode == "backward" and rts <= lts:
                cands.append((-(rts.timestamp()), -v, v, rts))  # latest ts, max tuple
            elif mode == "forward" and rts >= lts:
                cands.append((rts.timestamp(), v, v, rts))  # earliest ts, min tuple
        if cands:
            _, _, v, rts = min(cands)
            out[(k, lts)] = (float(v), rts)
    return out


@settings(max_examples=25, deadline=None)
@given(left_rows, right_rows)
@pytest.mark.slow
def test_backward_and_forward_match_brute_force(lrows, rrows):
    from ftm_datalake_spark.operators.asof import asof_join, asof_join_forward

    spark = SparkSession.getActiveSession()
    left = spark.createDataFrame(lrows, "key long, ts timestamp").repartition(3)
    right = spark.createDataFrame(
        [(k, t, float(v)) for k, t, v in rrows],
        "key long, ts timestamp, value double",
    ).repartition(2)

    back = {
        (r["key"], r["ts"]): (r["key_asof_value"], r["key_asof_ts"])
        for r in asof_join(left, right, "key", "ts", "ts").collect()
    }
    assert back == _brute(lrows, rrows, "backward")

    fwd = {
        (r["key"], r["ts"]): (r["key_next_value"], r["key_next_ts"])
        for r in asof_join_forward(left, right, "key", "ts", "ts").collect()
    }
    assert fwd == _brute(lrows, rrows, "forward")


@settings(max_examples=15, deadline=None)
@given(left_rows, right_rows)
@pytest.mark.slow
def test_nearest_matches_brute_force(lrows, rrows):
    from ftm_datalake_spark.operators.asof import asof_join_nearest

    spark = SparkSession.getActiveSession()
    left = spark.createDataFrame(lrows, "key long, ts timestamp").repartition(3)
    right = spark.createDataFrame(
        [(k, t, float(v)) for k, t, v in rrows],
        "key long, ts timestamp, value double",
    ).repartition(2)

    back = _brute(lrows, rrows, "backward")
    fwd = _brute(lrows, rrows, "forward")
    want = {}
    for key in set(back) | set(fwd):
        k, lts = key
        b, f = back.get(key), fwd.get(key)
        if b is not None and f is not None:
            bd = (lts - b[1]).total_seconds()
            fd = (f[1] - lts).total_seconds()
            want[key] = b if bd <= fd else f  # backward wins ties
        else:
            want[key] = b or f
    got = {
        (r["key"], r["ts"]): (r["key_nearest_value"], r["key_nearest_ts"])
        for r in asof_join_nearest(left, right, "key", "ts", "ts").collect()
    }
    assert got == want

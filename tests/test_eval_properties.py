"""Property tests for the eval-metric operators: for ANY (y, score)
multiset, each metric must equal the brute-force integer-exact Python
reference — independent of row order, partitioning, and ties. Division
is Spark's ``div`` (truncation toward zero), mirrored by ``_tdiv``."""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st

SCORES = [-250, 0, 1, 99, 100, 9999, 10000, 30000, 99999, 100000, 150000]

rows_st = st.lists(
    st.tuples(st.integers(0, 1), st.sampled_from(SCORES)),
    min_size=1,
    max_size=25,
)
# AUC needs both classes present (defined denominator)
rows_both_st = rows_st.filter(
    lambda rs: any(y == 1 for y, _ in rs) and any(y == 0 for y, _ in rs)
)


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — Spark ``div``."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(y), int(s)) for y, s in rows], "y long, score long"
    )


def test_0_session_bootstrap(spark):
    assert spark.range(1).count() == 1


@settings(max_examples=12, deadline=None)
@given(rows=rows_both_st)
def test_auc_matches_pairwise_bruteforce(spark, rows):
    from ftm_datalake_spark.operators.evalmetrics import auc_exact

    pos = [s for y, s in rows if y == 1]
    neg = [s for y, s in rows if y == 0]
    # Mann-Whitney identity: AUC = (wins + ties/2) / (n_pos * n_neg)
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    want_auc = _tdiv((2 * wins + ties) * 1000000, 2 * len(pos) * len(neg))

    got = auc_exact(_df(spark, rows)).first()
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert got["auc_x1e6"] == want_auc


@settings(max_examples=12, deadline=None)
@given(rows=rows_st, thr=st.sampled_from([0, 100, 30000, 100000]))
def test_kappa_matches_bruteforce(spark, rows, thr):
    from ftm_datalake_spark.operators.evalmetrics import cohens_kappa_exact

    n = len(rows)
    n11 = sum(1 for y, s in rows if s >= thr and y == 1)
    n10 = sum(1 for y, s in rows if s >= thr and y == 0)
    n01 = sum(1 for y, s in rows if s < thr and y == 1)
    n00 = sum(1 for y, s in rows if s < thr and y == 0)
    chance = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    kd = n * n - chance
    want = 0 if kd == 0 else _tdiv((n * (n11 + n00) - chance) * 1000000, kd)

    got = cohens_kappa_exact(_df(spark, rows), threshold=thr).first()
    assert (got["n11"], got["n10"], got["n01"], got["n00"]) == (
        n11, n10, n01, n00,
    )
    assert got["kappa_x1e6"] == want


@settings(max_examples=12, deadline=None)
@given(rows=rows_st)
def test_calibration_bins_match_bruteforce(spark, rows):
    from ftm_datalake_spark.operators.evalmetrics import (
        calibration_bins_exact,
    )

    bins: dict[int, list[tuple[int, int]]] = {}
    for y, s in rows:
        p = min(_tdiv(s, 100), 1000)
        b = min(_tdiv(p, 100), 9)
        bins.setdefault(b, []).append((y, p))
    want = {}
    for b, members in bins.items():
        n = len(members)
        sp = sum(p for _, p in members)
        sy = sum(y for y, _ in members)
        brier = sum((p - 1000 * y) ** 2 for y, p in members)
        want[b] = (n, _tdiv(sp * 1000, n), _tdiv(sy * 1000000, n), brier)

    got = {
        r["bin"]: (
            r["n"], r["mean_pred_x1e6"], r["obs_rate_x1e6"], r["brier_contrib"]
        )
        for r in calibration_bins_exact(_df(spark, rows)).collect()
    }
    assert got == want


@settings(max_examples=12, deadline=None)
@given(rows=rows_st)
@pytest.mark.slow
def test_pr_sweep_matches_bruteforce(spark, rows):
    from ftm_datalake_spark.operators.evalmetrics import (
        pr_threshold_sweep_exact,
    )

    thresholds = [0, 100, 10000, 100000]
    want = {}
    for t in thresholds:
        tp = sum(1 for y, s in rows if s >= t and y == 1)
        fp = sum(1 for y, s in rows if s >= t and y == 0)
        fn = sum(1 for y, s in rows if s < t and y == 1)
        prec = 0 if tp + fp == 0 else _tdiv(tp * 1000000, tp + fp)
        rec = 0 if tp + fn == 0 else _tdiv(tp * 1000000, tp + fn)
        f1 = (
            0
            if 2 * tp + fp + fn == 0
            else _tdiv(2 * tp * 1000000, 2 * tp + fp + fn)
        )
        want[t] = (tp, fp, fn, prec, rec, f1)

    got = {
        r["thr"]: (
            r["tp"], r["fp"], r["fn"],
            r["precision_x1e6"], r["recall_x1e6"], r["f1_x1e6"],
        )
        for r in pr_threshold_sweep_exact(
            _df(spark, rows), thresholds
        ).collect()
    }
    assert got == want


@settings(max_examples=12, deadline=None)
@given(rows=rows_st)
@pytest.mark.slow
def test_lift_deciles_match_bruteforce(spark, rows):
    from ftm_datalake_spark.operators.evalmetrics import lift_deciles_exact

    n_total = len(rows)
    pos_total = sum(y for y, _ in rows)
    per_score: dict[int, list[int]] = {}
    for y, s in rows:
        per_score.setdefault(s, []).append(y)
    deciles: dict[int, list[int]] = {}
    cum_end = 0
    for s in sorted(per_score, reverse=True):
        ys = per_score[s]
        cum_end += len(ys)
        d = min((cum_end - 1) * 10 // n_total, 9)  # nonneg: // == div
        deciles.setdefault(d, []).extend(ys)
    want = {}
    cum_n = cum_pos = 0
    for d in sorted(deciles):
        ys = deciles[d]
        cum_n += len(ys)
        cum_pos += sum(ys)
        capture = 0 if pos_total == 0 else _tdiv(cum_pos * 1000000, pos_total)
        lift = (
            0
            if cum_n == 0 or pos_total == 0
            else _tdiv(cum_pos * n_total * 1000000, cum_n * pos_total)
        )
        want[d] = (len(ys), sum(ys), cum_n, cum_pos, capture, lift)

    got = {
        r["decile"]: (
            r["n"], r["pos"], r["cum_n"], r["cum_pos"],
            r["cum_capture_x1e6"], r["lift_x1e6"],
        )
        for r in lift_deciles_exact(_df(spark, rows)).collect()
    }
    assert got == want


def test_auc_single_class_is_null(spark):
    from ftm_datalake_spark.operators.evalmetrics import auc_exact

    row = auc_exact(_df(spark, [(1, 10), (1, 20)])).first()
    assert row["n_neg"] == 0 and row["auc_x1e6"] is None
    row = auc_exact(_df(spark, [(0, 10)])).first()
    assert row["n_pos"] == 0 and row["auc_x1e6"] is None


def test_cumsums_multi_matches_two_single_passes(spark):
    from ftm_datalake_spark.operators.rank import (
        with_global_cumsum,
        with_global_cumsums,
    )

    df = spark.createDataFrame(
        [(i, i % 3, (i * 7) % 5) for i in range(40)], "k long, a long, b long"
    )
    multi = {
        r["k"]: (r["ca"], r["cb"])
        for r in with_global_cumsums(
            df, ["k"], [("a", "ca"), ("b", "cb")]
        ).collect()
    }
    single_a = {
        r["k"]: r["ca"] for r in with_global_cumsum(df, ["k"], "a", "ca").collect()
    }
    single_b = {
        r["k"]: r["cb"] for r in with_global_cumsum(df, ["k"], "b", "cb").collect()
    }
    assert multi == {k: (single_a[k], single_b[k]) for k in single_a}

"""Round-11 fixes: driver-ADVICE r10 findings (null-ordering in rank
oracles, DSIR re-tokenization and forced target broadcast, Welch
degenerate cohorts) plus the VERDICT r10 hygiene items (plans/ stays
.collect()-free, BNLJ_OK allow-list gate)."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_utils import compare_query

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS_DIR = os.path.join(REPO, "ftm_datalake_spark", "plans")

# Files allowed to call .collect() inside plans/ — currently none: every
# global scalar a plan needs ships as crossJoin(broadcast(1-row)) so the
# query stays one job (driver loops over collected rows are the
# anti-pattern the whole engine is built to avoid).
PLANS_COLLECT_ALLOWED: set[str] = set()


def test_plans_package_is_collect_free():
    offenders = []
    for path in sorted(glob.glob(os.path.join(PLANS_DIR, "*.py"))):
        name = os.path.basename(path)
        if name in PLANS_COLLECT_ALLOWED:
            continue
        src = open(path, encoding="utf-8").read()
        if ".collect(" in src:
            offenders.append(name)
    assert not offenders, (
        f".collect() in plans/ {offenders} — ship the scalar via "
        "crossJoin(broadcast(1-row)) instead, or add the file to "
        "PLANS_COLLECT_ALLOWED with a justification"
    )


# ------------------------------------------------------------- regression
@pytest.mark.parametrize(
    "name",
    [
        "eval_welch_ttest",
        "er_sorted_neighborhood",
        "orders_revenue_pareto",
        "sample_dsir_weights",
    ],
)
def test_changed_queries_still_match_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


# ------------------------------------------------------- welch degenerate
def _welch_both_engines(spark, tmp_path, rows):
    """Run the welch plan AND its oracle over a crafted events table."""
    from ftm_datalake_spark.plans import REGISTRY

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    spec = REGISTRY["eval_welch_ttest"]
    got = spec.builder(spark, str(tmp_path)).collect()
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
        )
        want = con.execute(spec.oracle).fetchall()
    finally:
        con.close()
    return got, want

import datetime as _dt

_TS = _dt.datetime(2024, 1, 1)


def test_welch_single_sample_cohort_yields_no_row_in_both_engines(
    spark, tmp_path
):
    """ADVICE r10: n<=1 used to null/div-zero differently per engine —
    both must now agree on 'no testable result' (zero rows)."""
    rows = [
        (1, _TS, 1, "purchase", 10.0, "{}"),  # n1 = 1
        (2, _TS, 1, "click", 1.0, "{}"),
        (3, _TS, 2, "click", 2.0, "{}"),
        (4, _TS, 3, "click", 3.0, "{}"),
    ]
    got, want = _welch_both_engines(spark, tmp_path, rows)
    assert got == [] and want == []


def test_welch_zero_variance_cohorts_yield_no_row_in_both_engines(
    spark, tmp_path
):
    """v1+v2 = 0 (both cohorts constant) → t is 0/0; Spark nulls it,
    DuckDB's IEEE float division would inf it — the guard filters the
    row out of BOTH engines instead."""
    rows = [
        (1, _TS, 1, "purchase", 5.0, "{}"),
        (2, _TS, 2, "purchase", 5.0, "{}"),
        (3, _TS, 3, "click", 2.0, "{}"),
        (4, _TS, 4, "click", 2.0, "{}"),
    ]
    got, want = _welch_both_engines(spark, tmp_path, rows)
    assert got == [] and want == []


def test_welch_healthy_cohorts_still_produce_the_statistic(spark, tmp_path):
    rows = [
        (1, _TS, 1, "purchase", 10.0, "{}"),
        (2, _TS, 2, "purchase", 14.0, "{}"),
        (3, _TS, 3, "click", 1.0, "{}"),
        (4, _TS, 4, "click", 3.0, "{}"),
    ]
    got, want = _welch_both_engines(spark, tmp_path, rows)
    assert len(got) == 1 and len(want) == 1
    g, w = got[0], want[0]
    assert (g["n1"], g["n2"]) == (2, 2)
    assert g["t_stat"] == pytest.approx(w[4], abs=0.0)
    assert g["welch_df"] == pytest.approx(w[5], abs=0.0)


# ------------------------------------------- sorted-neighborhood + NULLs
def test_sorted_neighborhood_null_sort_keys_agree_with_oracle(
    spark, tmp_path
):
    """ADVICE r10: Spark ranks NULLs first on an ascending sort, DuckDB
    defaults to NULLS LAST — the oracle now pins NULLS FIRST, so a
    corpus with NULL lang/n_chars must produce identical neighbor
    pairs from both engines."""
    from ftm_datalake_spark.plans import REGISTRY

    rows = [
        (1, "alpha", "en", "web", 100),
        (2, "bravo", None, "web", 50),
        (3, "charlie", "de", "web", None),
        (4, "delta", None, "web", None),
        (5, "echo", "de", "web", 10),
        (6, "foxtrot", "en", "web", 7),
        (7, "golf", "fr", "web", 3),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    spec = REGISTRY["er_sorted_neighborhood"]
    got = sorted(
        (r["doc_a"], r["doc_b"], r["rank_dist"])
        for r in spec.builder(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
        )
        want = sorted(
            (a, b, d) for a, b, d in con.execute(spec.oracle).fetchall()
        )
    finally:
        con.close()
    assert got == want and len(got) > 0


# ------------------------------------------------------------------ DSIR
def test_dsir_tokenizer_runs_once_per_row(spark, sf_dir):
    """ADVICE r10: the split() regex must appear exactly once in the
    optimized plan — the materialized __toks projection keeps
    CollapseProject from re-inlining the tokenizer into each of
    ngram_array's k slice() references (and the redundant size()
    pre-filter that pushdown would duplicate it into is gone)."""
    from ftm_datalake_spark.operators.dsir import hashed_bigram_buckets

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    plan = (
        hashed_bigram_buckets(docs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("split(") == 1, plan


def test_dsir_target_semi_join_has_no_forced_broadcast(spark, sf_dir):
    """ADVICE r10: the CLI can point the target predicate at a
    majority-of-corpus slice, so the id semi-join must not carry a
    ResolvedHint that pins an unbounded broadcast with no shuffle
    fallback. (AQE still broadcasts small targets at runtime on its
    own — this checks the *forced* hint is gone, not that a broadcast
    never happens.)"""
    from ftm_datalake_spark.operators.dsir import dsir_importance_weights

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    w = dsir_importance_weights(docs, F.col("lang") == "en")
    analyzed = w._jdf.queryExecution().analyzed().toString()
    semi_hints = [
        ln
        for ln in analyzed.splitlines()
        if "UnresolvedHint broadcast" in ln or "ResolvedHint" in ln
    ]
    # the three legitimate bounded broadcasts remain: 1-row totals,
    # <=n_buckets LM frame — but none may sit on the raw target-id set
    assert len(semi_hints) <= 3, analyzed


# ------------------------------------------------------------- BNLJ gate
def test_lint_warns_on_unlisted_bnlj_and_blesses_listed(spark):
    """The BNLJ_OK wiring (VERDICT r10 wrong #1): the same plan gets a
    WARN under an unlisted name (the planted-red proof that a future
    unbounded BNLJ fails the sweep gate) and an INFO under an
    allow-listed one."""
    from ftm_datalake_spark.plans.lint import BNLJ_OK, lint_plan

    a = spark.range(50)
    b = spark.range(50).withColumnRenamed("id", "id2")
    planted = a.join(b, a.id < b.id2)  # non-equi → BroadcastNestedLoopJoin
    warn = lint_plan(planted, name="some_new_unlisted_query")
    assert warn["broadcast_nested_loop_joins"] >= 1
    assert any(
        p.startswith("WARN") and "nested-loop" in p for p in warn["problems"]
    )
    listed = lint_plan(planted, name=next(iter(BNLJ_OK)))
    assert any(
        p.startswith("INFO") and "allow-listed" in p
        for p in listed["problems"]
    )
    assert not any(
        p.startswith("WARN") and "nested-loop" in p
        for p in listed["problems"]
    )


def test_bnlj_allowlist_names_are_live_registry_queries():
    """An allow-list entry for a renamed/deleted query would silently
    shrink the gate's coverage."""
    from ftm_datalake_spark.plans import REGISTRY
    from ftm_datalake_spark.plans.lint import BNLJ_OK

    dead = sorted(BNLJ_OK - set(REGISTRY))
    assert not dead, f"BNLJ_OK entries not in the registry: {dead}"

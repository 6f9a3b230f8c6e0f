"""Round-5 lake-ops operators: key-skew report, table profile, and
profile drift (operators/quality.py additions)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _skewed(spark):
    # key 'hot' 60 rows, 'warm' 25, ten singletons
    rows = [("hot",)] * 60 + [("warm",)] * 25 + [(f"k{i}",) for i in range(10)]
    return spark.createDataFrame(rows, "k string")


def test_skew_report_matches_bruteforce(spark):
    from ftm_datalake_spark.operators.quality import key_skew_report

    out = key_skew_report(_skewed(spark), "k", top_n=3).collect()
    assert [(r.key, r.n) for r in out] == [("hot", 60), ("warm", 25), ("k0", 1)]
    assert out[0].total_rows == 95 and out[0].distinct_keys == 12
    # exact integer ppm: floor(60 * 1e6 / 95)
    assert out[0].share_ppm == 60 * 1_000_000 // 95


def test_skew_report_tie_break_on_key(spark):
    from ftm_datalake_spark.operators.quality import key_skew_report

    df = spark.createDataFrame([("b",), ("a",), ("c",)], "k string")
    out = key_skew_report(df, "k", top_n=2).collect()
    assert [r.key for r in out] == ["a", "b"]  # equal counts → key ASC


def test_table_profile_single_pass(spark):
    from ftm_datalake_spark.operators.quality import table_profile

    df = spark.createDataFrame(
        [("en", 10), ("de", None), (None, 30), ("en", 40)],
        "lang string, n int",
    )
    rows = {r.column: r for r in table_profile(df, ["lang", "n"]).collect()}
    assert rows["lang"].n_null == 1 and rows["lang"].n_distinct == 2
    assert rows["n"].n_null == 1 and rows["n"].n_distinct == 3
    assert rows["n"].min_s == "10" and rows["n"].max_s == "40"
    assert rows["lang"].n_rows == 4


def test_profile_drift_detects_changes_and_missing_columns(spark):
    from ftm_datalake_spark.operators.quality import profile_drift, table_profile

    old = table_profile(
        spark.createDataFrame([("en", 1), ("de", 2)], "lang string, n int"),
        ["lang", "n"],
    )
    new = table_profile(
        spark.createDataFrame(
            [("en", 1), ("de", 2), ("fr", 9)], "lang string, n int"
        ),
        ["lang"],  # column n dropped from the new profile
    )
    rows = {r.column: r for r in profile_drift(old, new).collect()}
    assert rows["lang"].d_rows == 1 and rows["lang"].d_distinct == 1
    assert rows["lang"].max_changed is True  # 'fr' > 'en'
    assert rows["lang"].min_changed is False
    # column only in the old profile surfaces with negative deltas
    assert rows["n"].d_rows == -2 and rows["n"].min_changed is True


def test_ppm_identity_bit_matches_duckdb_integer_division():
    """The (s - s % d)/d exact-division idiom used across the quality /
    PMI / seasonality / bloom queries must equal DuckDB's BIGINT //
    for adversarial numerators and denominators (hypothesis sweep)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(
        num=st.integers(min_value=0, max_value=9_000_000_000),
        den=st.integers(min_value=1, max_value=9_000_000),
    )
    def check(num, den):
        scaled = num * 1_000_000
        py = (scaled - scaled % den) // den
        duck = con.execute(
            f"SELECT CAST(({scaled} - {scaled} % {den}) / {den} AS BIGINT), "
            f"{scaled} // {den}"
        ).fetchone()
        assert py == duck[0] == duck[1]

    check()


def test_empty_table_edge_cases(spark):
    """Empty inputs yield zeros, not NULLs (SUM-over-zero-rows guard)."""
    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.quality import (
        dq_rule_summary,
        key_skew_report,
        table_profile,
    )

    empty = spark.createDataFrame([], "k string, v long")
    assert key_skew_report(empty, "k").collect() == []
    prof = {r.column: r for r in table_profile(empty, ["k", "v"]).collect()}
    assert prof["k"].n_rows == 0 and prof["k"].n_null == 0
    assert prof["v"].n_distinct == 0 and prof["v"].min_s is None
    rules = {r.rule: r for r in dq_rule_summary(
        empty, {"neg": F.col("v") < 0}).collect()}
    assert rules["neg"].n_rows == 0 and rules["neg"].n_violations == 0

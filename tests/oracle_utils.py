"""Differential-test helper: run a registry query on Spark and its oracle
SQL on DuckDB over the same parquet tables, and compare exactly —
mirroring the driver's correctness gate (columns sorted by name,
order-insensitive rows, exact values)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from ftm_datalake_spark.schemas import TEST_TABLES


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TEST_TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare_query(spark, sf_dir: str, name: str) -> None:
    from ftm_datalake_spark.plans import REGISTRY

    spec = REGISTRY[name]
    spark_df = spec.builder(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(spark_df) >= 0  # rows-only check
        return
    oracle_df = run_oracle(sf_dir, spec.oracle)
    s = canonicalize(spark_df)
    o = canonicalize(oracle_df)
    assert list(s.columns) == list(o.columns), (
        f"{name}: column mismatch spark={list(s.columns)} oracle={list(o.columns)}"
    )
    assert len(s) == len(o), f"{name}: row count spark={len(s)} oracle={len(o)}"
    # Dtype-kind strictness: the external driver hashes values dtype-
    # sensitively, so an int64 Spark column meeting a float64 oracle column
    # (the DuckDB HUGEINT-SUM trap) must fail HERE, not at the driver.
    for c in s.columns:
        sk, ok = s[c].dtype.kind, o[c].dtype.kind
        assert sk == ok, (
            f"{name}: dtype-kind mismatch on '{c}': spark={s[c].dtype} "
            f"oracle={o[c].dtype} — if the oracle column is a DuckDB "
            f"integer SUM, wrap it in CAST(... AS BIGINT)"
        )
    pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)

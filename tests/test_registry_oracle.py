"""Differential test of every registry query against its DuckDB oracle at
sf0.001 — the local mirror of the driver's CORRECTNESS gate.

r15 split (VERDICT r14 #3: the full 281-query sweep pushed the suite
past the driver's pytest window): the DEFAULT run covers the high-risk
surface — every bench query, every checkpoint-truncated builder, and a
deterministic every-3rd sample of the rest (~40% of the registry). The
remaining queries run under the `slow` marker (`pytest -m slow`), and
the full registry is additionally swept each round by
scripts/verify_local.py at sf0.01 AND sf0.1 (VERIFY_LOCAL_r*.json)."""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare_query


def _names():
    from ftm_datalake_spark.plans import REGISTRY

    return sorted(REGISTRY.keys())


def _default_names():
    from ftm_datalake_spark.plans import REGISTRY

    names = sorted(REGISTRY.keys())
    keep = {n for n, s in REGISTRY.items() if s.bench or s.checkpointed}
    keep.update(names[::3])
    return sorted(keep)


def _slow_names():
    picked = set(_default_names())
    return [n for n in _names() if n not in picked]


@pytest.mark.parametrize("name", _default_names())
def test_query_matches_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", _slow_names())
def test_query_matches_oracle_full(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def test_dtype_guard_catches_uncast_hugeint(spark, sf_dir):
    """The mirror must red-flag an oracle whose uncast integer SUM comes
    back from DuckDB as HUGEINT→float64 while Spark returns int64 — the
    exact class behind the four CORRECTNESS_r02 hash failures."""
    import pandas as pd
    from pyspark.sql import functions as F

    from tests.oracle_utils import canonicalize, run_oracle

    # Uncast SUM over a BIGINT parquet column -> DuckDB HUGEINT -> float64.
    o = run_oracle(sf_dir, "SELECT SUM(n_nationkey) AS s FROM nation")
    assert o["s"].dtype.kind == "f", "DuckDB HUGEINT premise changed"
    spark_df = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .agg(F.sum("n_nationkey").alias("s"))
        .toPandas()
    )
    s, o = canonicalize(spark_df), canonicalize(o)
    assert s["s"].dtype.kind == "i" and o["s"].dtype.kind == "f"
    # And the CAST fixes it:
    o2 = canonicalize(
        run_oracle(
            sf_dir, "SELECT CAST(SUM(n_nationkey) AS BIGINT) AS s FROM nation"
        )
    )
    assert o2["s"].dtype.kind == "i"
    pd.testing.assert_frame_equal(s, o2, check_exact=True)

"""Differential test of every registry query against its DuckDB oracle at
sf0.001 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare_query


def _names():
    from ftm_datalake_spark.plans import REGISTRY

    return sorted(REGISTRY.keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
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

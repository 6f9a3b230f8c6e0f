"""The small-range-corrected HLL estimator (hll_estimate_full_by) and
its cross-engine bit-contract.

The linear-counting branch uses a driver-baked literal table of
m * ln(m / V) doubles because JVM Math.log is 1 ulp off libm on some of
these inputs while CPython's math.log and DuckDB's ln bit-agree. These
tests pin that assumption: if either libm or DuckDB ever drifts from the
table, the oracle pairing for approx_distinct_users breaks — fail loudly
here, not in a driver round.
"""

from __future__ import annotations

import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.sketches import (
    hll_alpha,
    hll_estimate_full_by,
    hll_lc_table,
    hll_registers_by,
)


@pytest.mark.parametrize("m", [64, 256])
def test_lc_table_bit_matches_duckdb_ln(m):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT v, {m} * ln(CAST({m} AS DOUBLE) / v) "
        f"FROM generate_series(1, {m - 1}) g(v) ORDER BY v"
    ).fetchall()
    table = hll_lc_table(m)
    assert len(table) == m - 1
    for (v, duck), ours in zip(rows, table):
        assert struct.pack("d", duck) == struct.pack("d", ours), (m, v)


def test_alpha_constants():
    assert hll_alpha(64) == 0.709
    assert abs(hll_alpha(256) - 0.7213 / (1 + 1.079 / 256)) == 0.0
    # alpha(m>=128) formula converges toward 0.7213 from below
    assert 0.715 < hll_alpha(256) < 0.7213


def _estimates(spark, n_keys, m):
    keys = spark.range(n_keys).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("key")
    )
    regs = hll_registers_by(keys, "g", m=m)
    return hll_estimate_full_by(regs, "g", m=m).collect()[0]


def test_small_cardinality_takes_linear_counting(spark):
    # n = 150 << m = 256: some buckets empty, raw <= 2.5m → LC branch,
    # which lands within 10% of truth (raw HLL would be far worse here).
    row = _estimates(spark, 150, 256)
    assert row.buckets_used < 256
    assert abs(row.estimate - 150) / 150 < 0.10
    # the estimate must be an entry of the literal table (proof the LC
    # branch — not the raw formula — produced it)
    assert row.estimate in hll_lc_table(256)


def test_large_cardinality_takes_raw_branch(spark):
    # n = 50k >> 2.5m: all buckets hit, raw branch; rsd ~1.04/sqrt(256).
    row = _estimates(spark, 50_000, 256)
    assert row.buckets_used == 256
    assert abs(row.estimate - 50_000) / 50_000 < 0.20
    assert row.estimate not in hll_lc_table(256)


def test_estimate_partitioning_independent(spark):
    # register fold order must not leak into the double estimate
    keys = spark.range(3000).select(
        (F.col("id") % 7).cast("string").alias("g"),
        F.col("id").cast("string").alias("key"),
    )
    outs = []
    for parts in (1, 13):
        regs = hll_registers_by(keys.repartition(parts), "g", m=256)
        outs.append(
            {
                r.g: struct.pack("d", r.estimate)
                for r in hll_estimate_full_by(regs, "g", m=256).collect()
            }
        )
    assert outs[0] == outs[1]

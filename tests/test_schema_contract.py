"""Schema contract against the driver-generated testdata (TESTDATA.md).

The driver regenerates /root/testdata between rounds and the physical
types have drifted before (events.ts: TIMESTAMP(NANOS) → timestamp[us]
read as TIMESTAMP_NTZ, which broke every unix_micros call site). This
test pins the Spark-visible dtypes the registry assumes — after
``load_table`` normalization — so the next drift fails loudly here, not
inside a bench run.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ftm_datalake_spark.functions.timeutil import ts_micros
from ftm_datalake_spark.sources.tables import load_table

# column -> dtype (after load_table normalization) that registry queries
# and oracle SQL rely on. Only load-bearing columns are pinned; extra
# columns appearing in the data are fine.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_regionkey": "int", "n_name": "string"},
    "customer": {"c_custkey": "bigint", "c_nationkey": "int", "c_acctbal": "double"},
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int"},
    "part": {"p_partkey": "bigint", "p_retailprice": "double", "p_type": "string"},
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        # NTZ is fine here: only compared/truncated, never unix_micros'd
        "o_orderdate": "timestamp_ntz",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_shipdate": "timestamp_ntz",
        "l_returnflag": "string",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # load_table normalizes NANOS-bigint / NTZ drift
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {"doc_id": "bigint", "text": "string", "lang": "string", "source": "string"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_dtypes(spark, sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    assert os.path.exists(path), f"driver testdata missing: {path}"
    dtypes = dict(load_table(spark, sf_dir, table).dtypes)
    for col, want in EXPECTED[table].items():
        got = dtypes.get(col)
        assert got == want, (
            f"{table}.{col}: expected Spark dtype {want!r}, got {got!r}. "
            "The driver's parquet physical types drifted — update "
            "load_table normalization (ftm_datalake_spark/sources/tables.py) "
            "and re-check every registry query touching this column."
        )


def test_ts_micros_tolerates_ntz(spark, tmp_path):
    """ts_micros must accept TIMESTAMP and TIMESTAMP_NTZ identically.

    Writes an NTZ parquet fixture and drives it through the operators
    that previously hard-failed on NTZ (sessionize window math and the
    bucketized range join)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, 0), 1),
        (2, datetime.datetime(2024, 1, 1, 0, 10, 0), 1),
        (3, datetime.datetime(2024, 1, 1, 2, 0, 0), 1),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),  # no tz → NTZ
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    path = str(tmp_path / "ntz.parquet")
    pq.write_table(tbl, path)

    df = spark.read.parquet(path)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"

    micros = [r[0] for r in df.select(ts_micros("ts").alias("m")).orderBy("m").collect()]
    base = int(datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    assert micros == [base, base + 600_000_000, base + 7_200_000_000]

    # range_join over NTZ interval bounds must analyze and run
    from ftm_datalake_spark.operators.rangejoin import range_join

    intervals = df.select(
        F.col("user_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("end_ts"),
    )
    points = df.select("user_id", F.col("ts").alias("pt"), "event_id")
    out = range_join(points, intervals, on="user_id", point_ts="pt",
                     start_ts="start_ts", end_ts="end_ts")
    assert out.count() == 4  # each point in its own interval + e2 in e1's window

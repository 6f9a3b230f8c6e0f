"""Streaming DQ monitor: cumulative rule totals across incremental
drains must equal the batch rule suite over all data, and replayed
batch ids must not double-count."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("status", StringType()),
        StructField("price", IntegerType()),
    ]
)

def _rules():
    return {
        "status_domain": ~F.col("status").isin("O", "F", "P"),
        "price_positive": F.col("price") <= 0,
    }


def _write(stage: str, name: str, rows: list[tuple[str, int]]) -> None:
    os.makedirs(stage, exist_ok=True)
    with open(os.path.join(stage, name), "w") as fh:
        for status, price in rows:
            fh.write(json.dumps({"status": status, "price": price}) + "\n")


def test_streaming_dq_equals_batch(spark, tmp_path):
    from ftm_datalake_spark.operators.quality import dq_rule_summary
    from ftm_datalake_spark.streaming.quality import dq_stream_monitor, read_dq_state

    stage = str(tmp_path / "stage")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(SCHEMA).json(stage)
        q = dq_stream_monitor(stream, _rules(), state, ckpt)
        q.awaitTermination()

    batch1 = [("O", 10), ("F", 20), ("X", 5), ("O", -1)]
    batch2 = [("P", 1), ("Y", -2), ("O", 3)]
    _write(stage, "b1.json", batch1)
    drain()
    mid = {r.rule: r for r in read_dq_state(spark, state).collect()}
    assert mid["status_domain"].n_rows == 4
    assert mid["status_domain"].n_violations == 1
    assert mid["price_positive"].n_violations == 1

    _write(stage, "b2.json", batch2)
    drain()
    final = {
        (r.rule, r.n_rows, r.n_violations)
        for r in read_dq_state(spark, state).collect()
    }
    everything = spark.createDataFrame(batch1 + batch2, SCHEMA)
    expected = {
        (r.rule, r.n_rows, r.n_violations)
        for r in dq_rule_summary(everything, _rules()).collect()
    }
    assert final == expected


def test_replayed_batch_id_is_idempotent(spark, tmp_path):
    from ftm_datalake_spark.streaming.quality import (
        merge_rule_summaries,
        read_dq_state,
    )
    from ftm_datalake_spark.operators.quality import dq_rule_summary

    # simulate the foreachBatch body replaying batch id 1 twice
    from ftm_datalake_spark.streaming import quality as sq

    state = str(tmp_path / "state")
    df0 = spark.createDataFrame([("O", 1), ("X", 2)], SCHEMA)
    df1 = spark.createDataFrame([("F", -5)], SCHEMA)

    def apply_batch(batch_df, batch_id):
        summary = dq_rule_summary(batch_df, _rules())
        prior = [v for v in sq._versions(spark, state) if v < batch_id]
        if prior:
            prev = spark.read.parquet(os.path.join(state, f"v={max(prior)}"))
            summary = merge_rule_summaries(prev, summary)
        summary.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state, f"v={batch_id}")
        )

    apply_batch(df0, 0)
    apply_batch(df1, 1)
    once = {
        (r.rule, r.n_rows, r.n_violations)
        for r in read_dq_state(spark, state).collect()
    }
    apply_batch(df1, 1)  # replay: overwrites v=1 from v=0 again
    twice = {
        (r.rule, r.n_rows, r.n_violations)
        for r in read_dq_state(spark, state).collect()
    }
    assert once == twice
    rows = {r.rule: r for r in read_dq_state(spark, state).collect()}
    assert rows["status_domain"].n_rows == 3
    assert rows["price_positive"].n_violations == 1

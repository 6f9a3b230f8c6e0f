"""Bucketed co-located join: correctness + the no-Exchange plan property.

Uses the shared session (stopping a module-local session would kill the
suite-wide JVM); broadcast/AQE are disabled via runtime confs and
restored, so the no-Exchange property is attributable to bucketing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def smj_conf(spark):
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_no_shuffle(smj_conf, tmp_path):
    from ftm_datalake_spark.operators.bucketing import (
        co_located_join,
        plan_has_no_shuffle,
        write_bucketed,
    )

    spark = smj_conf
    spark.sql("DROP TABLE IF EXISTS b_stmts")
    spark.sql("DROP TABLE IF EXISTS b_ents")

    stmts = spark.range(10_000).select(
        (F.col("id") % 500).cast("string").alias("canonical_id"),
        F.col("id").alias("stmt_id"),
    )
    ents = spark.range(500).select(
        F.col("id").cast("string").alias("canonical_id"),
        F.concat(F.lit("E"), F.col("id")).alias("label"),
    )
    write_bucketed(stmts, "b_stmts", ["canonical_id"], num_buckets=4)
    write_bucketed(ents, "b_ents", ["canonical_id"], num_buckets=4)
    try:
        joined = co_located_join(spark, "b_stmts", "b_ents", ["canonical_id"])
        assert plan_has_no_shuffle(joined), (
            joined._jdf.queryExecution().executedPlan().toString()
        )
        assert joined.count() == 10_000

        # sanity: the same join on unbucketed frames DOES shuffle
        plain = stmts.join(ents, "canonical_id")
        assert not plan_has_no_shuffle(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_stmts")
        spark.sql("DROP TABLE IF EXISTS b_ents")


def test_zorder_key_interleave(spark):
    from ftm_datalake_spark.operators.bucketing import zorder_key
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(3, 5)], "a long, b long")
    # a=0b011, b=0b101 -> interleave (b_i a_i): 1_0 0_1 1_1 -> 0b100111 = 39
    got = df.select(zorder_key(F.col("a"), F.col("b")).alias("z")).first()["z"]
    assert got == 39


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """Z-ordered files cover compact (a,b) rectangles: footer min/max
    stats prune scans on EITHER dimension — a linear sort only prunes its
    leading column."""
    import glob

    import pyarrow.parquet as pq

    from ftm_datalake_spark.operators.bucketing import write_zordered

    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = str(tmp_path / "z")
    write_zordered(df, out, "a", "b", num_files=16, bits=6)

    def files_overlapping(col, lo, hi):
        n = 0
        for f in glob.glob(out + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = [md.schema.column(i).name for i in range(md.num_columns)].index(col)
            fmin = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            fmax = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            if fmax >= lo and fmin <= hi:
                n += 1
        return n

    total = len(glob.glob(out + "/part-*.parquet"))
    assert total >= 8
    # a narrow predicate on each dimension touches a strict subset of files
    assert files_overlapping("a", 0, 15) < total
    assert files_overlapping("b", 0, 15) < total
    assert spark.read.parquet(out).count() == 64 * 64


def test_documents_orc_roundtrip(spark, tmp_path):
    """Format breadth: the documents table round-trips through ORC with
    schema and values intact (Spark-native columnar alternative)."""
    from ftm_datalake_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b

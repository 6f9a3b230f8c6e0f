"""vectorized_topk must accept non-integer id columns (string doc ids),
matching the type contract of the Column-expression paths."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_vectorized_topk_string_ids(spark, sf_dir):
    from ftm_datalake_spark.operators.similarity import (
        brute_force_topk,
        vectorized_topk,
    )
    from ftm_datalake_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    queries = emb.where(F.col("vec_id").isin("doc-1", "doc-2"))
    vec = {
        (r["qid"], r["rank"]): (r["nid"], r["cosine"])
        for r in vectorized_topk(emb, queries, k=3).collect()
    }
    ref = {
        (r["qid"], r["rank"]): (r["nid"], r["cosine"])
        for r in brute_force_topk(emb, queries, k=3).collect()
    }
    assert vec == ref
    assert all(q.startswith("doc-") for q, _ in vec)

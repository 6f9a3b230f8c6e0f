"""Persisted, incrementally-maintained IVF index (ANN at 100 TB).

The registry's ``ann_ivf_topk`` derives centroids and assignments
inline per query — right for a one-shot batch probe, wrong for a
standing corpus that takes weekly deltas. This module persists the
index once and maintains it in O(|delta|):

- ``build_ivf_index``: centroids (the coarse quantizer) → ``centroids/``;
  the corpus hard-assigned to its nearest centroid →
  ``postings/cluster=K/`` (parquet partitioned by cluster — the
  inverted lists ARE partition directories).
- ``append_ivf_index``: new vectors are assigned against the FROZEN
  codebook (standard IVF practice — FAISS add() semantics: appending
  never moves existing vectors or centroids) and appended as new part
  files under exactly the affected cluster partitions. An anti-join on
  vec_id makes re-delivery a no-op (same ledger pattern as
  streaming/ledger.py and the incremental training export).
- ``ivf_index_topk``: queries are assigned to their ``nprobe`` nearest
  centroids; the probed cluster ids (bounded: |queries| × nprobe) prune
  the postings scan to those partition directories via a static
  partition filter — per query batch the engine reads only the probed
  inverted lists, never the corpus.

Scoring is the same integer-quantized cosine as operators/similarity.py
(engine-exact, no float summation order), so index results are
bit-comparable to the inline ``ivf_topk``: law-tested in
tests/test_ann_index.py (index == inline on a fresh build; append ==
rebuild under a frozen codebook; re-append is a no-op; the probe's
``inputFiles`` stay inside the probed partitions).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.similarity import (
    _assign_to_centroid,
    _with_quantized,
    cosine,
    int_dot,
    ivf_centroids,
)


def build_ivf_index(
    spark: SparkSession,
    embeddings: DataFrame,
    out_dir: str,
    cluster_col: str = "label",
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> dict:
    """Materialize the IVF index. ``centroids`` overrides the trained
    codebook (used by the append==rebuild law test; a production
    retrain would pass a fresh k-means here and rebuild)."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(embeddings, cluster_col, emb_col)
    ).localCheckpoint(eager=True)
    cents.write.mode("overwrite").parquet(os.path.join(out_dir, "centroids"))

    corpus = _with_quantized(embeddings, emb_col).select(
        F.col(id_col).alias("vid"), "q", "norm2"
    )
    assigned = _assign_to_centroid(corpus, cents)
    (
        assigned.repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(os.path.join(out_dir, "postings"))
    )
    posted = spark.read.parquet(os.path.join(out_dir, "postings"))
    return {
        "vectors": posted.count(),
        "clusters": cents.count(),
    }


def append_ivf_index(
    spark: SparkSession,
    delta: DataFrame,
    out_dir: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Fold a delta batch into an existing index in O(|delta|): assign
    against the frozen codebook, skip already-indexed vec_ids, append
    part files under only the affected cluster partitions."""
    cents = spark.read.parquet(os.path.join(out_dir, "centroids"))
    postings_dir = os.path.join(out_dir, "postings")
    existing = spark.read.parquet(postings_dir).select("vid")

    fresh = (
        _with_quantized(delta, emb_col)
        .select(F.col(id_col).alias("vid"), "q", "norm2")
        .join(existing, "vid", "left_anti")
    )
    assigned = _assign_to_centroid(fresh, cents).localCheckpoint(eager=True)
    touched = sorted(
        int(r["cluster"])
        for r in assigned.select("cluster").distinct().collect()
    )
    if touched:
        (
            assigned.repartition(len(touched), "cluster")
            .write.mode("append")
            .partitionBy("cluster")
            .parquet(postings_dir)
        )
    return {"appended": assigned.count(), "clusters_touched": touched}


def ivf_index_topk(
    spark: SparkSession,
    out_dir: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 1,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the persisted index: same output contract as
    similarity.ivf_topk — (qid, nid, rank, cosine), rank 1..k per
    query. The probed cluster set (a bounded driver list: |queries| ×
    nprobe ints) becomes a partition filter on the postings scan, so
    only the probed inverted-list directories are read."""
    from pyspark.sql import Window

    cents = spark.read.parquet(os.path.join(out_dir, "centroids"))
    qs = _with_quantized(queries, emb_col).select(
        F.col(id_col).alias("vid"), "q", "norm2"
    )
    qs_assigned = _assign_to_centroid(qs, cents, nprobe=nprobe).select(
        F.col("vid").alias("qid"),
        F.col("q").alias("qq"),
        F.col("norm2").alias("qn"),
        F.col("cluster"),
    ).localCheckpoint(eager=True)
    probed = sorted(
        int(r["cluster"])
        for r in qs_assigned.select("cluster").distinct().collect()
    )
    postings = (
        spark.read.parquet(os.path.join(out_dir, "postings"))
        .where(F.col("cluster").isin(probed))
        .select(
            F.col("vid").alias("nid"),
            F.col("q").alias("nq"),
            F.col("norm2").alias("nn"),
            "cluster",
        )
    )
    scored = (
        postings.join(F.broadcast(qs_assigned), "cluster")
        .where(F.col("nid") != F.col("qid"))
        .withColumn("dot", int_dot(F.col("qq"), F.col("nq")))
        .withColumn("cosine", cosine(F.col("dot"), F.col("qn"), F.col("nn")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cosine")
    )

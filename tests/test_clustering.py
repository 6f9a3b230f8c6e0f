"""Unit tests for the deterministic k-means operator (operators/clustering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ftm_datalake_spark.operators import clustering as C
from ftm_datalake_spark.sources.tables import load_table


def test_kmeans_assignment_partitioning_independent(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a1, c1 = C.kmeans(emb, k=4, iters=2)
    a2, c2 = C.kmeans(emb.repartition(13), k=4, iters=2)
    assert c1 == c2
    r1 = {r["vec_id"]: r["cluster"] for r in a1.select("vec_id", "cluster").collect()}
    r2 = {r["vec_id"]: r["cluster"] for r in a2.select("vec_id", "cluster").collect()}
    assert r1 == r2


def test_kmeans_covers_all_points_with_valid_ids(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, cents = C.kmeans(emb, k=4, iters=1)
    n_in = emb.count()
    stats = assigned.agg(
        F.count("*").alias("n"),
        F.min("cluster").alias("lo"),
        F.max("cluster").alias("hi"),
    ).first()
    assert stats["n"] == n_in
    assert 0 <= stats["lo"] and stats["hi"] <= 3
    assert len(cents) == 4 and all(len(v) == 64 for v in cents)


def test_kmeans_iteration_reduces_or_keeps_inertia(spark, sf_dir):
    """Lloyd's algorithm never increases total within-cluster distance
    (up to the integer floor on centroid coordinates)."""
    emb = load_table(spark, sf_dir, "embeddings")

    def inertia(iters: int) -> int:
        assigned, cents = C.kmeans(emb, k=4, iters=iters)
        total = 0
        for cid, vec in enumerate(cents):
            arr = F.array(*[F.lit(int(v)).cast("long") for v in vec])
            d = F.aggregate(
                F.zip_with(F.col("q"), arr, lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda a, v: a + v,
            )
            part = (
                assigned.where(F.col("cluster") == cid)
                .agg(F.coalesce(F.sum(d), F.lit(0)).alias("s"))
                .first()["s"]
            )
            total += part
        return total

    assert inertia(2) <= inertia(1)


def test_semantic_dedup_finds_injected_duplicates(spark, sf_dir):
    from ftm_datalake_spark.plans import REGISTRY

    out = REGISTRY["semantic_dedup_pairs"].builder(spark, sf_dir).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in out}
    emb = load_table(spark, sf_dir, "embeddings")
    injected = [
        r["vec_id"] for r in emb.where(F.col("vec_id") % 50 == 0).collect()
    ]
    # every injected exact duplicate must be recovered (same vector →
    # same cluster → cosine 1.0)
    for vid in injected:
        assert (vid, vid + 1000000) in pairs
    for r in out:
        if (r["vec_a"], r["vec_b"]) in {(v, v + 1000000) for v in injected}:
            assert r["cosine"] == 1.0


def test_kmeans_with_fewer_vectors_than_k(spark):
    tiny = spark.createDataFrame(
        [(1, [float(i) for i in range(64)]), (2, [float(i + 9) for i in range(64)])],
        "vec_id long, embedding array<float>",
    )
    assigned, cents = C.kmeans(tiny, k=4, iters=2)
    rows = assigned.collect()
    assert len(rows) == 2
    assert len(cents) == 2  # every vector seeds its own cluster
    assert {r["cluster"] for r in rows} == {0, 1}


def test_kmeans_single_vector(spark):
    one = spark.createDataFrame(
        [(7, [1.0] * 64)], "vec_id long, embedding array<float>"
    )
    assigned, cents = C.kmeans(one, k=4, iters=1)
    assert assigned.count() == 1 and len(cents) == 1

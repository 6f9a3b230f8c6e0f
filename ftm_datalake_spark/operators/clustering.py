"""Deterministic distributed k-means (Lloyd) over embedding columns.

Part of the LLM-pipeline extension surface (the reference engine has no
clustering operator; this complements the ANN family in
operators/similarity.py and underpins SemDeDup-style semantic
deduplication: cluster first, then near-dup only within clusters).

Scale design:
- Per-iteration *assignment* is a zero-shuffle map: the k centroids are
  collected to the driver (k rows — bounded, the classic MLlib
  broadcast pattern) and inlined as a literal array expression, so the
  corpus is scanned once per iteration with no join.
- The only shuffle per iteration is ONE k-group aggregation of
  per-dimension integer sums (map-side partial aggregation applies:
  each task emits at most k rows).
- At 100 TB the cost is iters × (scan + k-row shuffle) — the optimal
  shape for Lloyd's algorithm on a cluster.

Cross-engine determinism (so a SQL oracle reproduces bit-for-bit):
- embeddings quantized to BIGINT (round(x*1000), see
  operators/similarity.py);
- distances are exact integer sums of squared differences;
- argmin tie-breaks to the smallest cluster id (struct ordering);
- centroid update is exact integer floor-division
  (sum - pmod(sum, cnt)) / cnt — no float rounding anywhere;
- seeding picks the k vectors with the smallest
  (md5(CAST(id AS STRING)), id) — reproducible in any engine with md5,
  independent of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.similarity import quantize


def _assign(q_df: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Add a `cluster` column: nearest centroid by exact integer L2^2.

    The whole scoring expression — centroid matrix INCLUDED — is
    rendered as ONE SQL string parsed JVM-side in a single call (r15;
    the r14 PQ-codebook idiom from operators/ann_index.py). Building
    the k×dims nested literal through the Python DSL cost one py4j
    round-trip per element (k=4, dims=64 ⇒ ~300 ms of driver chatter
    PER _assign CALL, and Lloyd rebuilds the plan every iteration with
    fresh centroid values — measured 0.306 s → 0.036 s construction,
    identical results). `array_min` over struct(dist, cluster) gives
    (min dist, then min cluster id). Zero shuffle.
    """
    if not centroids:
        return q_df.withColumn("cluster", F.lit(None).cast("long"))
    cent_sql = "array(" + ",".join(
        "array(" + ",".join(f"{int(v)}L" for v in vec) + ")"
        for vec in centroids
    ) + ")"
    k = len(centroids)
    expr = (
        f"array_min(transform(sequence(0, {k - 1}), i -> "
        f"struct(aggregate(zip_with(q, element_at({cent_sql}, i + 1), "
        f"(x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v) AS dist, "
        f"CAST(i AS BIGINT) AS cluster))).cluster"
    )
    return q_df.withColumn("cluster", F.expr(expr))


def _floordiv(s: int, c: int) -> int:
    # Python // IS floor division — spelled out to mirror the oracle's
    # (s - ((s % c + c) % c)) / c integer identity.
    return s // c


def kmeans(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple[DataFrame, list[list[int]]]:
    """Lloyd k-means; returns (assignments, final centroids).

    Assignments: (vec_id, q, cluster) using the centroids AFTER `iters`
    updates. Driver-side state is exactly k vectors per iteration.
    """
    q_df = emb.select(
        F.col(id_col).alias("vec_id"), quantize(F.col(emb_col)).alias("q")
    )
    # Lloyd re-reads the corpus every round: materialize the quantized
    # input once so the iterations AND the returned final assignment
    # don't rescan/requantize the source. localCheckpoint (not
    # persist): persist registers the entry in the session-global
    # CacheManager KEYED ON THE CANONICAL PLAN, so a later kmeans over
    # the same input silently served its quantized corpus from an
    # earlier call's cache — cross-run result reuse a benchmark must
    # not get. A localCheckpoint is identity-keyed (this call's RDD
    # only), gives every consumer in THIS call the same reuse, and is
    # released by the ContextCleaner when the returned frame is
    # dropped. Callers that register queries over the returned frame
    # must be tagged checkpointed=True.
    # r15: the pin is LAZY — the seed collect just below is the first
    # mandatory driver read anyway, so it doubles as the materializing
    # action (was: an eager checkpoint job THEN the seed job — one
    # extra blocking round-trip per kmeans call, guide §5). Every
    # later consumer (Lloyd iterations, returned assignment) still
    # reads the pinned quantized corpus.
    q_df = q_df.localCheckpoint(eager=False)
    seeds = (
        q_df.withColumn("__ord", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__ord", "vec_id")
        .limit(k)
        .collect()
    )
    centroids = [list(r["q"]) for r in seeds]
    # fewer vectors than k: every vector seeds its own cluster
    k = min(k, len(centroids))

    for _ in range(iters):
        assigned = _assign(q_df, centroids)
        # Per-dimension sums via posexplode + (cluster, pos) hash-agg:
        # ONE generic expression instead of `dims` separate sum columns,
        # so the plan stays O(1) in dims (a 64-col agg costs ~1s of
        # analysis/codegen per iteration on a warm session). The 64x row
        # explosion collapses map-side: each task emits at most k*dims
        # partial rows, so the shuffle is k*dims*tasks — same as the
        # column-wise form.
        stats = (
            assigned.select("cluster", F.posexplode("q").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("cnt"))
        )
        sums: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats.collect():  # k*dims rows — driver-bounded
            sums.setdefault(r["cluster"], {})[r["pos"]] = (r["s"], r["cnt"])
        centroids = [
            [_floordiv(*sums[c][i]) for i in range(dims)]
            if c in sums
            else centroids[c]  # empty cluster keeps its previous centroid
            for c in range(k)
        ]

    return _assign(q_df, centroids), centroids


def cluster_profile(assigned: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Per-cluster summary: size, id-sum checksum, leading centroid dims.

    The centroids are driver-held constants (k rows), so the lookup is a
    literal-array index expression — no createDataFrame + broadcast-join
    stage for what is a compile-time-known map."""
    cent = F.lit([[int(vec[d]) for d in range(4)] for vec in centroids]).cast(
        "array<array<bigint>>"
    )
    sizes = assigned.groupBy("cluster").agg(
        F.count("*").alias("n"), F.sum("vec_id").alias("id_sum")
    )
    # element_at is 1-based; cluster ids are 0-based
    picked = F.element_at(cent, (F.col("cluster") + 1).cast("int"))
    return sizes.select(
        "cluster",
        "n",
        "id_sum",
        *[picked[d].alias(f"c{d}") for d in range(4)],
    )

"""Johnson–Lindenstrauss random projection (Achlioptas, JCSS 2003:
database-friendly ±1 projections) over the embeddings table.

Projects d-dim vectors to k dims with a dense sign matrix
R ∈ {+1,-1}^{k×d}; by the JL lemma pairwise distances are preserved
within (1±ε) for k = O(log n / ε²). Used as the cheap dimensionality
squeeze in front of ANN indexes and clustering.

Determinism & cross-engine exactness: the sign matrix entry (j, i) is
`+1 if md5("j:i") has an even first-8-hex-digit integer else -1` — the
repo's portable md5 idiom, computed HERE at plan-build time with
hashlib (bit-identical to SQL `md5`) and embedded in the plan as a
constant, and recomputed by the DuckDB oracle with SQL md5. Vector
components go through the similarity-module quantization
(`round(x*1000) AS BIGINT`), so every projected coordinate is an exact
integer sum — no float accumulation order to disagree on.

Scale shape: the matrix is a k×d compile-time literal shipped inside
the serialized plan (a few KB — exactly what you'd broadcast on a
1000-executor cluster); each output coordinate is a per-row
`aggregate()` fold over the vector — ZERO shuffles, no UDFs, whole
pipeline stays in codegen. The k-way explode to rows is bounded
fan-out (k per vector).

Reference role: the reference engine has no vector operators at all;
this extends the Spark port's ANN family (operators/similarity.py,
operators/ann_index.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def jl_sign(j: int, i: int) -> int:
    """±1 from the md5 hex prefix of "j:i" — matches the DuckDB mirror
    `CASE WHEN CAST(('0x' || substr(md5(j || ':' || i), 1, 8)) AS
    BIGINT) % 2 = 0 THEN 1 ELSE -1 END`."""
    h = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:8], 16)
    return 1 if h % 2 == 0 else -1


def jl_sign_matrix(k: int, d: int) -> list[list[int]]:
    """k rows of d signs; row j is output dimension j (1-based labels
    to match SQL's 1-based generate_series)."""
    return [[jl_sign(j, i) for i in range(1, d + 1)] for j in range(1, k + 1)]


def _quant(x: Column) -> Column:
    return F.round(x.cast("double") * 1000).cast("long")


def random_project(
    emb: DataFrame,
    d: int,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, dim, proj_q) — dim in 1..k, proj_q the exact integer
    projection Σ_i round(v_i*1000) * R[dim][i]."""
    signs = jl_sign_matrix(k, d)
    # r14 (guide §1 measured): the original Column-API construction —
    # 16 F.aggregate folds each holding a 64-element F.array of
    # F.lit(...).cast(...) — issued ~2,000 py4j round-trips and
    # dominated the query's wall time (build 3.7-28 s vs exec 0.5 s at
    # sf0.1; plan/exec were never the cost). The SAME expressions
    # rendered as one SQL string parse JVM-side in a single call.
    # The quantized vector is computed once into a named column so the
    # k folds share it instead of inlining the transform k times.
    quant_sql = (
        f"transform(`{vec_col}`, x -> "
        "cast(round(cast(x as double) * 1000) as bigint))"
    )
    folds = ", ".join(
        "aggregate(zip_with(__q, array("
        + ", ".join(f"{s}L" for s in signs[j])
        + "), (a, b) -> a * b), cast(0 as bigint), (acc, x) -> acc + x)"
        for j in range(k)
    )
    return (
        emb.withColumn("__q", F.expr(quant_sql))
        .select(
            F.col(id_col),
            F.posexplode(F.expr(f"array({folds})")).alias("pos", "proj_q"),
        )
        .select(
            id_col,
            (F.col("pos") + 1).cast("long").alias("dim"),
            F.col("proj_q").cast("long").alias("proj_q"),
        )
    )

"""Matrix-free power iteration for the top principal direction of an
embedding corpus — exact integer arithmetic end-to-end.

Classic distributed PCA never materializes the d×d Gram matrix when it
only needs the leading direction: each power step computes
    v' = Xᵀ (X v)
as ONE pass over the corpus — per row a dot product s = ⟨q, v⟩ against
the broadcast current direction, then d running sums of s·qᵢ in a
single global hash-aggregate (map-side combined, 1-row result). The
renormalization between steps floor-divides by max(1, max|v'| // 1024),
keeping the state in ~2¹¹ magnitude, so every quantity is an
order-independent BIGINT sum → bit-identical in any engine, at any
partitioning.

The whole plan is declarative: the 1-row direction frame re-enters the
next step via a broadcast cross join (no collect anywhere), so at
100 TB each step is one corpus scan whose only exchange is the 1-row
global aggregate.

Exact floor division (sums can be negative, and can exceed 2⁵³ where
double division would silently misround) uses the pmod identity
    floor(a / b) = (a - pmod(a, b)) / b        (b > 0)
whose numerator is an exact multiple of b; the division itself runs in
DECIMAL(38,0) so it stays exact far past the 2⁵³ double limit. The SQL
oracle mirrors it as `(a - ((a % b) + b) % b) // b`, which is
semantics-proof: the quotient of an exact multiple is identical under
floor or truncating `//`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.similarity import int_dot, quantize

RENORM_TARGET = 1024


def exact_floor_div(a: Column, b: Column) -> Column:
    """floor(a / b) for b > 0, exact for any Long magnitude."""
    n = a - F.pmod(a, b)
    return (
        n.cast("decimal(38,0)") / b.cast("decimal(38,0)")
    ).cast("long")


def power_iteration_top(
    embeddings: DataFrame,
    dims: int = 64,
    steps: int = 2,
    emb_col: str = "embedding",
) -> DataFrame:
    """(dim_idx 1-based, v) — the renormalized direction after `steps`
    exact power steps from the all-ones start vector."""
    spark = embeddings.sparkSession
    q_df = embeddings.select(quantize(F.col(emb_col)).alias("q"))
    v_row = spark.range(1).select(
        F.array(*[F.lit(1).cast("long") for _ in range(dims)]).alias("v")
    )
    for _ in range(steps):
        joined = q_df.crossJoin(F.broadcast(v_row))
        s = int_dot(F.col("q"), F.col("v"))
        sums = joined.select(
            *[(s * F.col("q")[i]).alias(f"m{i}") for i in range(dims)]
        ).agg(*[F.sum(f"m{i}").alias(f"m{i}") for i in range(dims)])
        m = F.array(*[F.col(f"m{i}") for i in range(dims)])
        maxabs = F.array_max(F.transform(m, lambda x: F.abs(x)))
        d = F.greatest(
            F.lit(1).cast("long"),
            exact_floor_div(maxabs, F.lit(RENORM_TARGET).cast("long")),
        )
        v_row = sums.select(
            F.transform(m, lambda x: exact_floor_div(x, d)).alias("v")
        )
    return v_row.select(
        F.posexplode(F.col("v")).alias("pos", "v")
    ).select((F.col("pos") + 1).cast("long").alias("dim_idx"), "v")

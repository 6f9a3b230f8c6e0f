"""Count-min sketch as a relational composition — a mergeable frequency
sketch with NO custom aggregation code.

The sketch is a d×w integer matrix: token t increments cell
(s, h_s(t) mod w) for each of d hash rows. Expressed relationally the
matrix is just `groupBy(seed, bucket).count()` over the token stream
exploded ×d — and Spark's map-side partial aggregation IS the sketch
merge: every task builds its local d×w matrix and the shuffle adds
them cell-wise. At 100 TB the shuffle moves only tasks × d×w cells,
never the token stream.

Estimates are `min` over the d cells a key hashes to — the classic CMS
guarantee (never under-estimates; over-estimates bounded by collisions).

Determinism: h_s(t) = first 8 hex chars of md5(seed || ':' || token) —
reproducible in any engine with md5, so the whole sketch (and every
estimate) is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.dedup import shingle_hash


def cms_bucket(token: Column, seed: Column, width: int) -> Column:
    """Row-s bucket: md5(seed || ':' || token) folded to [0, width)."""
    return shingle_hash(
        F.concat(seed.cast("string"), F.lit(":"), token)
    ) % width


def _probe(df: DataFrame, depth: int, width: int) -> DataFrame:
    """Attach (seed, bucket) rows — one per hash row — to each token."""
    return df.select(
        "token",
        F.explode(F.array(*[F.lit(s) for s in range(depth)])).alias("seed"),
    ).select(
        "token", "seed", cms_bucket(F.col("token"), F.col("seed"), width).alias("bucket")
    )


def cms_cells(tokens: DataFrame, depth: int = 3, width: int = 64) -> DataFrame:
    """Token stream (column `token`, with multiplicity) → sketch cells
    (seed, bucket, c). One shuffle of ≤ depth×width rows per task."""
    return _probe(tokens, depth, width).groupBy("seed", "bucket").agg(
        F.count("*").alias("c")
    )


def cms_estimates(
    tokens: DataFrame, keys: DataFrame, depth: int = 3, width: int = 64
) -> DataFrame:
    """Estimated frequency for every row of `keys` (column `token`):
    min over the d cells. The cell table (≤ d×w rows) broadcasts."""
    cells = cms_cells(tokens, depth, width)
    joined = (
        _probe(keys, depth, width)
        .join(F.broadcast(cells), ["seed", "bucket"], "left")
        .select("token", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    return joined.groupBy("token").agg(F.min("c").alias("est"))

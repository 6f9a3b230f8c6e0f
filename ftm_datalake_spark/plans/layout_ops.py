"""Data-layout registry queries: Z-order clustering keys and compaction
planning, both under the DuckDB oracle.

The Z-value oracle is deliberately a DIFFERENT formulation than the
engine: the Spark side interleaves bits with magic-number spreading
(operators/layout._spread2, 10 shift/mask ops), the SQL side with the
naive per-bit gather sum (operators/layout.zvalue_sql) — two independent
derivations of the same Morton code, so a hash match certifies the bit
arithmetic, not a copied formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.layout import (
    compaction_plan,
    hilbert_index,
    hilbert_sql,
    quantize,
    zvalue,
    zvalue_sql,
)
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table

_ZBITS = 10
_ZSQL = zvalue_sql(["u", "q"], _ZBITS)


@register(
    "layout_zorder_events",
    oracle=f"""
    WITH d AS (
      SELECT event_id,
             event_id % 1024 AS u,
             CAST(GREATEST(0, LEAST(1023,
               FLOOR(value / 400.0 * 1024))) AS BIGINT) AS q
      FROM events),
    z AS (SELECT event_id, u, q, ({_ZSQL}) AS zval FROM d)
    SELECT event_id, u, q, zval
    FROM z ORDER BY zval, event_id LIMIT 200
    """,
    tags=("layout", "zorder"),
)
def layout_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys over (event_id mod 2^10, value quantized to 2^10):
    the clustering key ``zorder_repartition`` sorts by before a write.
    The 200 smallest keys walk the bottom-left corner of the 2-D grid —
    any interleaving mistake (wrong bit order, off-by-one in the
    quantizer, sign leak in a shift) reorders them and fails the hash."""
    events = load_table(spark, sf_dir, "events")
    d = events.select(
        "event_id",
        F.pmod(F.col("event_id"), F.lit(1024)).alias("u"),
        quantize(F.col("value"), 0.0, 400.0, _ZBITS).alias("q"),
    )
    z = d.withColumn("zval", zvalue([F.col("u"), F.col("q")], _ZBITS))
    return z.orderBy("zval", "event_id").limit(200)


_HILBERT_INNER = hilbert_sql(
    "u", "q", 8, ["event_id", "u", "q"],
    """(SELECT event_id,
               event_id % 256 AS u,
               CAST(GREATEST(0, LEAST(255,
                 FLOOR(value / 400.0 * 256))) AS BIGINT) AS q
        FROM events)""",
)


@register(
    "layout_hilbert_events",
    oracle=f"""
    SELECT event_id, u, q, hval
    FROM ({_HILBERT_INNER})
    ORDER BY hval, event_id LIMIT 200
    """,
    tags=("layout", "hilbert"),
)
def layout_hilbert_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert keys over (event_id mod 2^8, value quantized to 2^8).
    The engine runs the rotate-and-reflect recurrence as 8 narrow
    selects (operators/layout.hilbert_index); the oracle re-derives it
    as 8 generated nested subqueries — two independent expansions of
    the same recurrence, so the hash gate certifies every level's
    rotation logic. The 200 smallest keys walk the curve's start."""
    events = load_table(spark, sf_dir, "events")
    d = events.select(
        "event_id",
        F.pmod(F.col("event_id"), F.lit(256)).alias("u"),
        quantize(F.col("value"), 0.0, 400.0, 8).alias("q"),
    )
    h = hilbert_index(d, "u", "q", 8)
    return h.orderBy("hval", "event_id").limit(200)


@register(
    "layout_compaction_plan",
    checkpointed=True,
    oracle="""
    WITH files AS (
      SELECT source || '/' || CAST(doc_id AS VARCHAR) AS path,
             n_chars AS size
      FROM documents),
    binned AS (
      SELECT path, size,
             CAST(FLOOR(COALESCE(SUM(size) OVER (
               ORDER BY path ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) / 50000.0) AS BIGINT) AS bin
      FROM files)
    SELECT bin,
           COUNT(*) AS n_files,
           CAST(SUM(size) AS BIGINT) AS total_bytes,
           MIN(path) AS first_path,
           MAX(path) AS last_path
    FROM binned GROUP BY bin ORDER BY bin
    """,
    tags=("layout", "compaction", "window"),
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction bins over a synthetic listing (one file per documents
    row, size = n_chars, path = source/doc_id): exclusive-prefix-sum
    binning at a 50 KB target. Checks the window frame semantics
    (UNBOUNDED PRECEDING .. 1 PRECEDING) and the floor-division bin
    assignment against an independent engine."""
    docs = load_table(spark, sf_dir, "documents")
    files = docs.select(
        F.concat_ws("/", F.col("source"), F.col("doc_id").cast("string")).alias(
            "path"
        ),
        F.col("n_chars").alias("size"),
    )
    plan = compaction_plan(files, target_bytes=50_000)
    return plan.orderBy("bin")

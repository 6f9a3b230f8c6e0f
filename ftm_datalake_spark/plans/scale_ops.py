"""Scale-stress variants: the flagship statement aggregation driven from
the largest test table (lineitem → ~4 statements/row), so bench exercises
A6 at millions of fragments rather than the small events table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table


# Long-format statements from lineitem: canonical_id = order, one
# statement per (prop, value) of interest. At sf0.1 this is ~2.4M
# statements over 150k entities — the RFC's "sort a terabyte" shape in
# miniature, executed as one hash-agg shuffle.
@register(
    "statement_aggregation_wide",
    oracle="""
    WITH s AS (
      SELECT 'o' || CAST(l_orderkey AS VARCHAR) AS canonical_id, 'part' AS prop,
             CAST(l_partkey AS VARCHAR) AS value FROM lineitem
      UNION ALL
      SELECT 'o' || CAST(l_orderkey AS VARCHAR), 'supplier',
             CAST(l_suppkey AS VARCHAR) FROM lineitem
      UNION ALL
      SELECT 'o' || CAST(l_orderkey AS VARCHAR), 'flag',
             l_returnflag FROM lineitem
      UNION ALL
      SELECT 'o' || CAST(l_orderkey AS VARCHAR), 'qty',
             CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) FROM lineitem
    ),
    per_prop AS (
      SELECT canonical_id, prop,
             array_to_string(list_sort(list(DISTINCT value)), ',') AS vals
      FROM s GROUP BY canonical_id, prop
    )
    SELECT canonical_id,
           array_to_string(list_sort(list(prop || '=' || vals)), '|') AS properties,
           COUNT(*) AS n_props
    FROM per_prop
    GROUP BY canonical_id
    ORDER BY canonical_id
    """,
    tags=("agg", "flagship", "scale", "bench"),
    bench=True,
)
def statement_aggregation_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Shuffle on the 8-byte bigint order key; the 'o{key}' canonical_id
    # string is built only on the (already aggregated) output rows.
    # One scan, explode 4 statements per row (same multiset as the
    # oracle's 4-way UNION ALL, without re-reading the table 4x).
    stmt = F.explode(
        F.array(
            F.struct(
                F.lit("part").alias("prop"),
                F.col("l_partkey").cast("string").alias("value"),
            ),
            F.struct(
                F.lit("supplier").alias("prop"),
                F.col("l_suppkey").cast("string").alias("value"),
            ),
            F.struct(
                F.lit("flag").alias("prop"), F.col("l_returnflag").alias("value")
            ),
            F.struct(
                F.lit("qty").alias("prop"),
                F.col("l_quantity").cast("decimal(12,2)").cast("string").alias("value"),
            ),
        )
    ).alias("s")
    stmts = li.select(F.col("l_orderkey"), stmt).select(
        "l_orderkey", "s.prop", "s.value"
    )
    # ONE shuffle: collect the distinct (prop, value) pairs per entity
    # (map-side partial collect_set dedups before the exchange), then
    # assemble the per-prop groups with higher-order functions on the
    # aggregated rows — replaces the former two-shuffle
    # (groupBy(id, prop) → groupBy(id)) plan, which spent a second
    # exchange + sort-agg pass on 2.4M intermediate rows.
    pv = F.array_sort(F.collect_set(F.struct("prop", "value")))
    props = F.array_distinct(F.transform(F.col("pv"), lambda x: x["prop"]))
    prop_strs = F.transform(
        props,
        lambda p: F.concat(
            p,
            F.lit("="),
            F.array_join(
                F.transform(
                    F.filter(F.col("pv"), lambda x: x["prop"] == p),
                    lambda x: x["value"],
                ),
                ",",
            ),
        ),
    )
    return (
        stmts.groupBy("l_orderkey")
        .agg(pv.alias("pv"))
        .select(
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias(
                "canonical_id"
            ),
            F.array_join(prop_strs, "|").alias("properties"),
            F.size(props).cast("long").alias("n_props"),
        )
        .orderBy("canonical_id")
    )

"""Core analytical queries over the TPC-H-ish test tables.

These exercise scan/filter/projection pushdown, hash aggregation,
broadcast vs shuffle joins, windows, sorts and top-k — the physical
building blocks every SURVEY §2 operator compiles to. Money math is done
in DECIMAL (exact) and cast to DOUBLE at the edge so Spark and the DuckDB
oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(12,2)")


def _one() -> F.Column:
    return F.lit(1).cast("decimal(12,2)")


# --------------------------------------------------------------------------
# q1: pricing summary (TPC-H Q1 shape) — full-scan hash aggregation.
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE)
        / 100.0 AS sum_qty,
      CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
        / 100.0 AS sum_base_price,
      CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
           AS DOUBLE) / 10000.0 AS sum_disc_price,
      CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
               * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)))
           AS DOUBLE) / 1000000.0 AS sum_charge,
      CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE)
        / 100.0 / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
        / 100.0 / COUNT(*) AS avg_price,
      CAST(SUM(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE)
        / 100.0 / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan", "bench"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 with integer-cents accumulators instead of DECIMAL(12,2)
    sums: 2-decimal money quantized to int64 cents (floor(x*100+0.5),
    identical in both engines), products kept in 1e-4 / 1e-6 fixed-point
    units, one long-sum per measure, a single double division at the
    edge. Measured 3.95x faster than the decimal formulation at sf0.1
    (1.21s -> 0.31s best-of-5) with bit-identical output — long hash-agg
    stays in whole-stage codegen primitives while decimal sums go
    through Spark's Decimal128 path. int64 headroom: the 1e-6-unit
    charge accumulator reaches ~5.7e18 of 9.2e18 at sf100; beyond that,
    widen the charge sum to DECIMAL(28,0) (one-line change, documented
    here rather than paid everywhere)."""
    li = load_table(spark, sf_dir, "lineitem")

    def cents(col: str) -> F.Column:
        return F.floor(F.col(col) * 100 + 0.5).cast("long")

    qty, price, disc, tax = (
        cents("l_quantity"),
        cents("l_extendedprice"),
        cents("l_discount"),
        cents("l_tax"),
    )
    disc_price = price * (100 - disc)  # 1e-4 units
    charge = disc_price * (100 + tax)  # 1e-6 units
    cnt = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty).cast("double") / 100.0).alias("sum_qty"),
            (F.sum(price).cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(disc_price).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(charge).cast("double") / 1000000.0).alias("sum_charge"),
            (F.sum(qty).cast("double") / 100.0 / cnt).alias("avg_qty"),
            (F.sum(price).cast("double") / 100.0 / cnt).alias("avg_price"),
            (F.sum(disc).cast("double") / 100.0 / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q3: shipping priority (TPC-H Q3 shape) — 3-way join + agg + top-k.
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT
      l_orderkey,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
           AS DOUBLE) AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "bench"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    revenue = F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q5: local-supplier revenue (TPC-H Q5 shape) — 6-way join, broadcast dims.
@register(
    "q5_region_revenue",
    oracle="""
    SELECT
      n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
           AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg", "broadcast", "bench"),
    bench=True,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --------------------------------------------------------------------------
# q12 shape: conditional (CASE) aggregation by group.
@register(
    "q12_priority_shipmode",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("join", "agg"),
)
def q12_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q14 shape: ratio of two exact decimal sums (promo revenue share).
@register(
    "q14_promo_share",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                    THEN CAST(l_extendedprice AS DECIMAL(12,2))
                         * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                    ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
      / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
      AS promo_share,
      COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
    """,
    tags=("join", "agg"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01 00:00:00").cast("timestamp"))
    )
    rev = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    promo_rev = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(25,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.sum(promo_rev).cast("double") / F.sum(rev).cast("double")).alias(
                "promo_share"
            ),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# q18 shape: HAVING over an aggregated join (large-volume customers).
@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 200.0
    ORDER BY total_qty DESC, o_orderkey
    """,
    tags=("join", "agg", "having"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    total = F.sum(_dec("l_quantity"))
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(total.alias("__total"))
        .where(F.col("__total") > 200.0)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("__total").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
    )


# --------------------------------------------------------------------------
# q19 shape: disjunctive multi-range predicates (OR of conjunction groups).
@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
           AS DOUBLE) AS revenue,
      COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5.0)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 15.0)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 25.0)
    """,
    tags=("join", "filter"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 5.0)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (F.col("l_quantity") >= 15.0)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & (F.col("l_quantity") >= 25.0)
        )
    )
    rev = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    return joined.where(cond).agg(
        F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n")
    )

@register(
    "window_running_total",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      o_orderdate,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DOUBLE) AS run_total
    FROM orders
    """,
    tags=("window",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("run_total"),
    )


# --------------------------------------------------------------------------
# Global top-k with total order (SURVEY §2.6 O3: external sort).
@register(
    "global_sort_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
    tags=("sort", "topk"),
)
def global_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Set op: INTERSECT (SURVEY §2.7).
@register(
    "set_intersect_nations",
    oracle="""
    SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'AUTOMOBILE'
    ORDER BY n_name
    """,
    tags=("setop",),
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    a = joined.where(F.col("c_mktsegment") == "BUILDING").select("n_name")
    b = joined.where(F.col("c_mktsegment") == "AUTOMOBILE").select("n_name")
    return a.intersect(b).orderBy("n_name")


# --------------------------------------------------------------------------
# Anti join: parts never ordered (SURVEY §2.3 J2/J4 shape).
@register(
    "anti_join_unsold_parts",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_partkey = p_partkey
        AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00')
    ORDER BY p_partkey
    """,
    tags=("join", "anti"),
)
def anti_join_unsold_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Semi join: customers with at least one big order (J4 existence check).
@register(
    "semi_join_big_spenders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 400000.0
    )
    ORDER BY c_custkey
    """,
    tags=("join", "semi"),
)
def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 400000.0
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )

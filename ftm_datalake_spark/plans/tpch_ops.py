"""Full-breadth TPC-H coverage (q2,q7-q11,q13,q15-q17,q20-q22), adapted to
the slim test schema (no partsupp / commit-receipt dates / phone columns).

Each query keeps the canonical *plan shape* — correlated scalar subqueries
decorrelated into window or broadcast-scalar joins, EXISTS/NOT EXISTS as
semi/anti joins, scalar-aggregate broadcasts — so the physical-plan audit
exercises the same optimizer paths as the official suite:

- q2  : per-group min correlated subquery  -> window MIN + decimal-exact filter
- q7  : symmetric nation-pair volume join (two broadcast dims aliased twice)
- q8  : market share = conditional sum / total sum in one aggregation
- q9  : profit by supplier nation x year with LIKE filter pushdown
- q10 : returned-item revenue top-k (join + agg + TakeOrderedAndProject)
- q11 : HAVING against a broadcast scalar subquery (share-of-total)
- q13 : left outer join with join-condition filter + distribution-of-counts
- q15 : max-revenue scalar subquery on a derived view (decimal-exact equality)
- q16 : NOT IN -> left-anti join + count-distinct rollup
- q17 : correlated per-part AVG -> decorrelated aggregate join
- q20 : nested semi-join chain (IN over a HAVING aggregate)
- q21 : EXISTS + NOT EXISTS -> per-order distinct-counts then filter
- q22 : anti join against recent orders + broadcast AVG scalar

Money math in DECIMAL(12,2) (exact, order-independent) cast to DOUBLE at
the edge; quantities/balances in the testdata are integral/2dp so double
sums are exact too (verified).  Cross-engine rules per plans/registry.py.
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


def _ts(s: str) -> F.Column:
    return F.lit(s + " 00:00:00").cast("timestamp")


# --------------------------------------------------------------------------
# q2 shape: minimum-cost supplier. The official query's correlated
# MIN(ps_supplycost) subquery is emulated with MIN(l_extendedprice) per
# (part, supplier) from lineitem (no partsupp table in the slim schema);
# the decorrelation — window MIN per part over region-filtered suppliers,
# then exact-equality filter — is the same plan Catalyst produces for Q2.
@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost_dec
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), cand AS (
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost_dec,
             MIN(cost_dec) OVER (PARTITION BY p_partkey) AS min_cost
      FROM part
      JOIN supply ON l_partkey = p_partkey
      JOIN eu ON s_suppkey = l_suppkey
      WHERE p_size <= 15 AND p_type = 'SMALL'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           CAST(cost_dec AS DOUBLE) AS cost
    FROM cand WHERE cost_dec = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("join", "window", "subquery", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 15) & (F.col("p_type") == "SMALL")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")

    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("cost_dec")
    )
    eu = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = supply.join(
        F.broadcast(part), supply.l_partkey == part.p_partkey
    ).join(F.broadcast(eu), supply.l_suppkey == F.col("s_suppkey"))
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("cost_dec").over(w))
        .where(F.col("cost_dec") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("cost_dec").cast("double").alias("cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q7 shape: volume shipping between two nations, both directions. The
# nation dim joins twice under different roles (supplier's vs customer's).
@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount")))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# q8 shape: national market share — conditional sum over total sum within
# one aggregation (no second pass over the data).
@register(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
               AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 00:00:00'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
    tags=("join", "agg", "broadcast", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(_ts("1995-01-01"), _ts("1996-12-31"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(12,2)")
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# q9 shape: product-type profit by supplier nation and year; the p_name
# LIKE predicate pushes to the part scan.
@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "pushdown", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit = F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount")))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(profit.cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# q10 shape: returned-item reporting — revenue lost to returns per customer
# in one quarter, top 20 (TakeOrderedAndProject, no global sort).
@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue.cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q11 shape: important parts — per-part value filtered by a share-of-total
# scalar subquery (broadcast one-row aggregate, no second scan of vals
# thanks to Spark reusing the shuffle output).
@register(
    "q11_important_parts",
    oracle="""
    WITH vals AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2))) AS value_dec
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM vals
    WHERE CAST(value_dec AS DOUBLE)
          > (SELECT CAST(SUM(value_dec) AS DOUBLE) * 0.001 FROM vals)
    ORDER BY part_value DESC, p_partkey
    """,
    tags=("agg", "subquery", "tpch"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    vals = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("value_dec"))
    )
    total = vals.agg(
        (F.sum("value_dec").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .where(F.col("value_dec").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


# --------------------------------------------------------------------------
# q13 shape: customer order-count distribution — LEFT OUTER join with an
# extra join-condition predicate (not a WHERE filter: customers with zero
# qualifying orders must survive), then a second aggregation over counts.
@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    counts = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# q15 shape: top supplier — revenue view over a quarter, then equality
# against the MAX scalar subquery (decimal-exact, so ties are found
# identically in both engines).
@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
               AS total_rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev_dec AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM rev)
    ORDER BY s_suppkey
    """,
    tags=("agg", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias(
            "total_rev_dec"
        )
    )
    mx = rev.agg(F.max("total_rev_dec").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev_dec") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# q16 shape: supplier counts per part descriptor with a NOT IN exclusion
# subquery — compiled to a left-anti join (never a per-row lookup).
@register(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#15'
      AND p_size IN (1, 4, 7)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "agg", "antijoin", "tpch"),
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#15") & F.col("p_size").isin(1, 4, 7)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# q17 shape: small-quantity-order revenue — the correlated per-part AVG
# subquery decorrelated into an aggregate join (quantities are integral so
# the double AVG is exact and the 0.2x boundary is engine-independent).
@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey AS ap_partkey, AVG(l_quantity) AS part_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avg_qty ON ap_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * part_avg
    """,
    tags=("join", "subquery", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("part_avg")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("part_avg"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# --------------------------------------------------------------------------
# q20 shape: nested semi-join chain — suppliers (of one nation) appearing
# in a HAVING-filtered aggregate over promo-part shipments.
@register(
    "q20_promo_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 300
      )
    ORDER BY s_name
    """,
    tags=("join", "semijoin", "tpch"),
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    qualified = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(qualified, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# q21 shape: EXISTS + NOT EXISTS over sibling lineitems. The slim schema
# has no receipt/commit dates, so "the supplier's fault" is marked by
# l_returnflag = 'R': count, per supplier, R-flagged lines on
# multi-supplier orders where NO other supplier's line was also flagged.
# Decorrelated: per-order distinct supplier / distinct R-supplier counts
# (one aggregation), then EXISTS == (n_supp >= 2) and NOT EXISTS ==
# (n_r_supp == 1) — the same rewrite Catalyst applies to the official Q21.
@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("join", "subquery", "antijoin", "tpch"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    supp = load_table(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    r_lines = li.where(F.col("l_returnflag") == "R")
    return (
        r_lines.join(per_order, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q22 shape: global sales opportunity — above-average-balance customers
# with no recent orders (anti join), grouped by nation (the slim schema
# has no phone column for the cntrycode prefix).
@register(
    "q22_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS v
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT v FROM avg_bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("antijoin", "subquery", "agg", "tpch"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _ts("2000-01-01")
    ).select("o_custkey")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("v")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("v"))
        .join(recent, cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Year-over-year revenue growth: yearly exact-decimal revenue, then the
# previous year attached via a broadcast self-join on yr = prev_yr + 1
# instead of LAG() OVER (ORDER BY yr) — the year frame is tiny (the
# post-agg side), but the join form keeps even this query free of
# single-partition window exchanges, so the registry-wide plan gate
# holds with no allowlist entry. Growth math runs on doubles derived
# from exact decimal sums, identically ordered in both engines.
@register(
    "lineitem_yoy_growth",
    oracle="""
    WITH yearly AS (
      SELECT CAST(year(l_shipdate) AS INT) AS yr,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(12,2))
                         - CAST(l_discount AS DECIMAL(12,2))))
                  AS DOUBLE) AS revenue
      FROM lineitem GROUP BY yr
    )
    SELECT c.yr, c.revenue,
           p.revenue AS prev_revenue,
           c.revenue / p.revenue - 1.0 AS yoy_growth
    FROM yearly c LEFT JOIN yearly p ON c.yr = p.yr + 1
    ORDER BY c.yr
    """,
    tags=("window", "agg", "analytics"),
)
def lineitem_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    yearly = li.groupBy(F.year("l_shipdate").cast("int").alias("yr")).agg(
        F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )
    prev = yearly.select(
        (F.col("yr") + 1).alias("yr"), F.col("revenue").alias("prev_revenue")
    )
    return (
        yearly.join(F.broadcast(prev), "yr", "left")
        .select(
            "yr",
            "revenue",
            "prev_revenue",
            (F.col("revenue") / F.col("prev_revenue") - 1.0).alias("yoy_growth"),
        )
        .orderBy("yr")
    )


# --------------------------------------------------------------------------
# Herfindahl-Hirschman market concentration per part type: HHI over
# supplier revenue shares, computed WITHOUT any double summation —
# sum-of-squares and total run in exact arithmetic (integer cents;
# squares in DECIMAL(38,0) so the accumulator cannot overflow at any
# realistic scale), and HHI = sum(rev_i^2)/total^2 is two IEEE ops at
# the edge. Avoids the naive share^2 formulation whose double SUM would
# be partial-agg-order-dependent.
@register(
    "supplier_concentration_hhi",
    oracle="""
    WITH rev AS (
      SELECT p.p_type AS part_type, l.l_suppkey,
             SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
               AS rev_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_type, l.l_suppkey
    ),
    agg AS (
      SELECT part_type,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
             SUM(CAST(rev_cents AS DECIMAL(38,0)) * rev_cents) AS ss
      FROM rev GROUP BY part_type
    )
    SELECT part_type, n_suppliers, total_cents,
           CAST(ss AS DOUBLE)
             / (CAST(total_cents AS DOUBLE) * total_cents) AS hhi
    FROM agg ORDER BY part_type
    """,
    tags=("agg", "analytics", "join"),
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_type").alias("part_type"), "l_suppkey")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
            .alias("rev_cents")
        )
    )
    agg = rev.groupBy("part_type").agg(
        F.count("*").cast("long").alias("n_suppliers"),
        F.sum("rev_cents").cast("long").alias("total_cents"),
        F.sum(F.col("rev_cents").cast("decimal(38,0)") * F.col("rev_cents")).alias("ss"),
    )
    return agg.select(
        "part_type",
        "n_suppliers",
        "total_cents",
        (
            F.col("ss").cast("double")
            / (F.col("total_cents").cast("double") * F.col("total_cents"))
        ).alias("hhi"),
    ).orderBy("part_type")


# --------------------------------------------------------------------------
# Substitute-product candidates: same (type, size), different brand,
# retail price within 5% — the "interchangeable part" analytics shape.
# The equi-join on the (type, size) block bounds fanout (~|block|^2
# pairs, blocks are small by construction); the 5% price band is exact
# integer-cent arithmetic (|pa-pb| * 20 <= min(pa,pb)), evaluated after
# the block join, never as a global inequality join.
@register(
    "part_substitution_candidates",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_brand, p_type, p_size,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
      FROM part
    )
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_type AS part_type, CAST(a.p_size AS BIGINT) AS part_size,
           a.price_c AS price_a, b.price_c AS price_b
    FROM p a JOIN p b
      ON a.p_type = b.p_type AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey AND a.p_brand <> b.p_brand
    WHERE abs(a.price_c - b.price_c) * 20 <= least(a.price_c, b.price_c)
    ORDER BY key_a, key_b
    """,
    tags=("join", "er", "analytics"),
)
def part_substitution_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size",
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias("price_c"),
    )
    a = part.select(
        F.col("p_partkey").alias("key_a"), F.col("p_brand").alias("brand_a"),
        F.col("p_type").alias("part_type"), F.col("p_size").alias("part_size"),
        F.col("price_c").alias("price_a"),
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"), F.col("p_brand").alias("brand_b"),
        F.col("p_type").alias("part_type"), F.col("p_size").alias("part_size"),
        F.col("price_c").alias("price_b"),
    )
    return (
        a.join(b, ["part_type", "part_size"])
        .where(
            (F.col("key_a") < F.col("key_b"))
            & (F.col("brand_a") != F.col("brand_b"))
            & (
                F.abs(F.col("price_a") - F.col("price_b")) * 20
                <= F.least(F.col("price_a"), F.col("price_b"))
            )
        )
        .select(
            "key_a", "key_b", "part_type",
            F.col("part_size").cast("long").alias("part_size"),
            "price_a", "price_b",
        )
        .orderBy("key_a", "key_b")
    )

"""Graph registry queries: fixed-point PageRank over the supplier↔customer
trade graph (operators/pagerank.py).

The oracle unrolls the K-iteration recurrence as chained CTEs — pure
integer arithmetic, so Spark's distributed loop and DuckDB's sequential
replay are bit-identical (see operators/pagerank.py for the recurrence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.pagerank import SCALE, pagerank_fixed
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table

_ITERS = 5


def _oracle_pagerank(iters: int) -> str:
    head = f"""
    WITH e0 AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'c' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    p AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST({SCALE} // (SELECT n FROM p) AS BIGINT) AS pr
           FROM nodes)"""
    steps = "".join(
        f""",
    r{k + 1} AS (
      SELECT e.dst AS node,
             CAST((SELECT (CAST({SCALE} AS BIGINT) * 15 // 100) // n FROM p)
                  + (85 * SUM(r.pr // d.outdeg)) // 100 AS BIGINT) AS pr
      FROM edges e
      JOIN r{k} r ON r.node = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst)"""
        for k in range(iters)
    )
    return head + steps + f"""
    SELECT node, pr FROM r{iters} ORDER BY node
    """


@register(
    "pagerank_trade_graph",
    oracle=_oracle_pagerank(_ITERS),
    tags=("graph", "iterative"),
)
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank on the symmetrized supplier↔customer graph (an edge per
    distinct trading pair), 5 fixed iterations in integer fixed-point."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank_fixed(edges, _ITERS).orderBy("node")

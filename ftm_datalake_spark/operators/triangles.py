"""Triangle enumeration via degree-ordered edge orientation.

The naive triangle join (three-way self-join on an undirected edge list)
explodes on high-degree vertices: a degree-d hub contributes O(d^2)
wedges. The standard fix (compact-forward / Schank-Wagner) orients every
undirected edge from the (degree, id)-smaller endpoint to the larger
one; every triangle then has exactly ONE oriented wedge u→v, u→w with
v→w, and wedge work per vertex is bounded by its *oriented* out-degree —
O(m^1.5) total regardless of skew. Both joins are hash equi-joins on
vertex ids, so the plan shuffles on small integer keys and never
nested-loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orient_edges(edges: DataFrame) -> DataFrame:
    """Undirected distinct edges (u, v) → oriented (src, dst) by
    (degree, id) order. Input must already be deduplicated with u < v."""
    ends = edges.select(F.col("u").alias("n")).unionAll(
        edges.select(F.col("v").alias("n"))
    )
    deg = ends.groupBy("n").agg(F.count("*").alias("d"))
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    with_deg = edges.join(du, "u").join(dv, "v")
    u_first = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    return with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """All triangles in an undirected graph, one row each, vertex keys
    returned in ascending numeric order (n1 < n2 < n3).

    The oriented edge list is materialized (localCheckpoint) before the
    three-way self-join: Spark does not share common subtrees across
    self-join branches, so without it the whole upstream edge
    construction would execute once per branch."""
    # Eager pin (kept eager on the r15 re-audit): both sides of the
    # wedge self-join consume `o` in concurrent map stages.
    o = orient_edges(edges).localCheckpoint()
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    ordered = F.array_sort(F.array(F.col("a"), F.col("b"), F.col("c")))
    return tri.select(
        ordered[0].alias("n1"), ordered[1].alias("n2"), ordered[2].alias("n3")
    )

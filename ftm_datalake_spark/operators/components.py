"""Connected components over candidate-pair edges: dedup families and
entity canonicalization.

MinHash/embedding candidate pairs form an undirected graph; a duplicate
*family* is a connected component, and the canonical representative is
the minimum id in the component (exactly how FTM canonical_ids collapse
merged entities). Implemented as iterative min-label propagation —
each round is one join + one aggregation, converging in O(diameter)
rounds; intermediate frames are localCheckpointed to truncate lineage.

At 100 TB this is the standard large-star/small-star regime; the
propagation join is an equi-join on node id, AQE-skew-safe."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component =
    min node id reachable. Deterministic for any input order."""
    both = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    both = both.distinct().localCheckpoint(eager=True)

    labels = (
        both.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            both.join(labels, both.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("nbr_component"), F.col("component"))
                    < F.col("component")
                ).alias("changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = updated.where(F.col("changed")).count()
        labels = updated.drop("changed")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (graph diameter too large) — raise max_iterations; "
            "returning partial labels would silently split components"
        )
    return labels


def dedup_families(pairs: DataFrame) -> DataFrame:
    """Candidate pairs → (doc_id, family) with min-id canonical labels."""
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("family")
    )

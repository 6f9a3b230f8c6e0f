"""Statement → entity aggregation — the flagship operator (SURVEY §2.4 A6).

The reference RFC (docs/rfc.md:63-73,121-129) specifies: sort all statement
fragments, group by canonical entity id, emit aggregated FTM entities —
explicitly anticipating "a Spark thing that is good at sorting a terabyte"
(docs/rfc.md:125).

Spark-first: no global sort at all. ``groupBy(canonical_id)`` hash-
aggregates with map-side partial aggregation; per-entity property maps are
built with collect_list + map_from_entries. Order stability inside value
arrays comes from sort_array, not from input order (SURVEY §7.3 hard-part
#2) — so the result is deterministic without the O(n log n) total sort the
reference performs. One shuffle on canonical_id, which AQE splits if an
entity id is skew-hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_statements(statements: DataFrame) -> DataFrame:
    """Aggregate long-format statements into FTM entity rows.

    Output schema matches ENTITY_SCHEMA: id, schema, properties
    MAP<STRING, ARRAY<STRING>>, datasets ARRAY<STRING>.
    """
    per_prop = statements.groupBy("canonical_id", "prop").agg(
        F.sort_array(F.collect_set("value")).alias("values"),
        # first() under groupBy is nondeterministic; min() is not.
        F.min("schema").alias("schema"),
    )
    per_entity = per_prop.groupBy("canonical_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("prop", "values")))
        ).alias("properties"),
        F.min("schema").alias("schema"),
    )
    datasets = statements.groupBy("canonical_id").agg(
        F.sort_array(F.collect_set("dataset")).alias("datasets")
    )
    return (
        per_entity.join(datasets, "canonical_id")
        .select(
            F.col("canonical_id").alias("id"),
            "schema",
            "properties",
            "datasets",
        )
    )


def sorted_statements(statements: DataFrame) -> DataFrame:
    """O3: the spec's "complete sorted statements.csv" export.

    ``repartitionByRange`` + ``sortWithinPartitions`` gives a globally
    sorted file set without funneling through one task — Spark's external
    shuffle sort IS the terabyte sorter the RFC asks for (docs/rfc.md:125).
    """
    return statements.repartitionByRange(
        "canonical_id", "prop", "value"
    ).sortWithinPartitions("canonical_id", "prop", "value")

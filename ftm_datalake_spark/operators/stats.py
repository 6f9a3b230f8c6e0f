"""Dataset statistics + catalog fan-in (SURVEY §2.4 A1-A5, §2.1 S12).

Reference: make_index() computes entity_count, per-schema facet counts,
total_file_size, coverage intervals per dataset
(ftm_datalake/archive/dataset.py:177-196; output shape
tests/fixtures/archive/test_dataset/.leakrfc/index.json).

Spark-first: one pass, grouping-by dataset with map-side partial aggs;
the nested `things.schemata` export is a collect_list(struct) of an
already-aggregated (tiny) frame, so the expensive work stays flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def schema_facets(entities: DataFrame, by: str = "dataset") -> DataFrame:
    """A2: per-schema entity counts within each dataset."""
    return entities.groupBy(by, "schema").agg(F.count("*").alias("count"))


def dataset_index(documents: DataFrame, entities: DataFrame) -> DataFrame:
    """A1+A2+A3 fan-in: one stats row per dataset (index.json shape)."""
    sizes = documents.groupBy("dataset").agg(
        F.sum("size").alias("total_file_size"),
        F.count("*").alias("file_count"),
        F.min("created_at").alias("coverage_start"),
        F.max("updated_at").alias("coverage_end"),
    )
    facets = (
        schema_facets(entities)
        .groupBy("dataset")
        .agg(
            F.sum("count").alias("entity_count"),
            F.sort_array(
                F.collect_list(F.struct(F.col("schema").alias("name"), "count"))
            ).alias("schemata"),
        )
    )
    return sizes.join(facets, "dataset", "full_outer")


def catalog(index_rows: DataFrame) -> DataFrame:
    """A5: archive-level catalog = union of per-dataset index rows.

    Reference iterates datasets serially (ftm_datalake/archive/base.py:75-83);
    here the per-dataset stats already arrive as one DataFrame, so the
    catalog is just a stable ordering of it.
    """
    return index_rows.orderBy("dataset")

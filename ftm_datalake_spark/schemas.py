"""Explicit StructTypes for the lake tables (SURVEY.md §1.2, FIXTURES.md).

The reference keeps row-oriented JSON/CSV with pydantic validation
(reference: ftm_datalake/model.py:55-118); here every table gets a fixed
columnar schema so scans prune columns and push predicates into parquet.
All tables are partitionable by ``dataset``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# documents.csv columns (reference: ftm_datalake/archive/documents.py:1-6,32)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("mimetype", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("dataset", T.StringType(), True),
    ]
)

# info.json / File model (reference: ftm_datalake/model.py:55-91)
FILE_INFO_SCHEMA = T.StructType(
    DOCUMENTS_SCHEMA.fields
    + [
        T.StructField("processed", T.TimestampType(), True),
        T.StructField("origin", T.StringType(), True),  # 'original'|'converted'
        T.StructField("source_file", T.StringType(), True),
        T.StructField("store", T.StringType(), True),
        T.StructField("extra", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# FTM entity proxy rows (reference: ftm_datalake/model.py:37-52)
ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("schema", T.StringType(), False),
        T.StructField(
            "properties",
            T.MapType(T.StringType(), T.ArrayType(T.StringType())),
            True,
        ),
        T.StructField("dataset", T.StringType(), True),
    ]
)

# Statement fragments, long format (reference: docs/rfc.md:63-73)
STATEMENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("canonical_id", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("prop", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("dataset", T.StringType(), True),
        T.StructField("origin", T.StringType(), True),
        T.StructField("first_seen", T.TimestampType(), True),
        T.StructField("last_seen", T.TimestampType(), True),
    ]
)

# Task-ledger cache (reference: ftm_datalake/archive/cache.py:11-23)
TASK_LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("cache_key", T.StringType(), False),
        T.StructField("completed_at", T.TimestampType(), True),
    ]
)

# Per-dataset stats index.json (reference: ftm_datalake/archive/dataset.py:177-196)
DATASET_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("entity_count", T.LongType(), True),
        T.StructField("total_file_size", T.LongType(), True),
        T.StructField(
            "things",
            T.StructType(
                [
                    T.StructField("total", T.LongType(), True),
                    T.StructField(
                        "schemata",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("name", T.StringType(), True),
                                    T.StructField("count", T.LongType(), True),
                                    T.StructField("label", T.StringType(), True),
                                    T.StructField("plural", T.StringType(), True),
                                ]
                            )
                        ),
                        True,
                    ),
                ]
            ),
            True,
        ),
    ]
)

# Driver-provided synthetic test tables (TESTDATA.md)
TEST_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

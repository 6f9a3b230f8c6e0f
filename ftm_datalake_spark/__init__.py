"""ftm_datalake_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of openaleph/ftm-datalake (reference surveyed in
SURVEY.md), re-expressed Spark-first.

Layout:
    session     SparkSession builders tuned for lake workloads
    schemas     explicit StructTypes for the lake tables (SURVEY §1.2)
    functions/  scalar expression helpers (checksums, mime maps, paths, text)
    sources/    readers/writers for the lake layout (parquet/csv/json/binary)
    operators/  the dataflow operators (SURVEY §2): documents merge, diffs,
                statement aggregation, stats, dedup, similarity, text analysis
    plans/      the query registry that pairs every operator with a DuckDB
                oracle (the driver's correctness gate)
    streaming/  incremental / structured-streaming counterparts
"""

__version__ = "0.1.0"

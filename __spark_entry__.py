"""Driver contract for the spark-graft builder (PySpark target).

- entry(spark): flagship statement-aggregation query at sf0.001
- queries(): every implemented operator from SURVEY.md §2 (+ the
  training-pipeline extensions) as (spark, sf_dir) -> DataFrame
- oracle_sql(): matching DuckDB SQL per query (None-oracle queries are
  omitted → driver records a rows-only check)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: statement → entity aggregation (SURVEY §2.4 A6)."""
    from ftm_datalake_spark.plans import REGISTRY

    return REGISTRY["statement_aggregation"].builder(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ftm_datalake_spark.plans import REGISTRY

    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from ftm_datalake_spark.plans import REGISTRY

    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }

from ftm_datalake_spark.plans.registry import REGISTRY, QuerySpec, get_registry

__all__ = ["REGISTRY", "QuerySpec", "get_registry"]

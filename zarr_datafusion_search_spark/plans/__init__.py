from zarr_datafusion_search_spark.plans.registry import REGISTRY, QuerySpec, register

__all__ = ["REGISTRY", "QuerySpec", "register"]

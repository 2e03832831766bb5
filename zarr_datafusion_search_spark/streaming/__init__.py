from zarr_datafusion_search_spark.streaming import events

__all__ = ["events"]

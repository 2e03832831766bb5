from zarr_datafusion_search_spark.sources.zarr_table import ZarrTable
from zarr_datafusion_search_spark.sources.zarr_datasource import ZarrDataSource

__all__ = ["ZarrTable", "ZarrDataSource"]

from zarr_datafusion_search_spark.functions.hashing import h64, h64_seeded
from zarr_datafusion_search_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = ["h64", "h64_seeded", "cosine_similarity", "dot_product", "l2_norm"]

from fugue_warehouses_spark.extensions import (
    dedup,
    multimodal,
    packing,
    sampling,
    similarity,
)

__all__ = ["dedup", "multimodal", "packing", "sampling", "similarity"]

from fugue_warehouses_spark.extensions import (
    contamination,
    dedup,
    multimodal,
    packing,
    quantization,
    sampling,
    similarity,
)

__all__ = [
    "contamination",
    "dedup",
    "multimodal",
    "packing",
    "quantization",
    "sampling",
    "similarity",
]

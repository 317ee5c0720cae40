from fugue_warehouses_spark.extensions import (
    chunking,
    clustering,
    contamination,
    dedup,
    graph,
    multimodal,
    packing,
    quality,
    quantization,
    sampling,
    similarity,
    sketches,
)

__all__ = [
    "chunking",
    "clustering",
    "contamination",
    "dedup",
    "graph",
    "multimodal",
    "packing",
    "quality",
    "quantization",
    "sampling",
    "similarity",
    "sketches",
]

from fugue_warehouses_spark.extensions import dedup, similarity, multimodal

__all__ = ["dedup", "similarity", "multimodal"]

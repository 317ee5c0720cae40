from fugue_warehouses_spark.functions import text, vectors

__all__ = ["text", "vectors"]

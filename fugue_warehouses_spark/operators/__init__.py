from fugue_warehouses_spark.operators.take import take, parse_presort

__all__ = ["take", "parse_presort"]

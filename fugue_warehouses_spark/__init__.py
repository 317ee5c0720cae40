"""fugue_warehouses_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of
``fugue-project/fugue-warehouses`` (see SURVEY.md): the Fugue
ExecutionEngine operator contract, full SQL pass-through, parallel
table/file load, plus LLM-data-pipeline extensions (dedup, similarity
search, multimodal columns, text analysis) and a Structured Streaming
layer — all built on the Spark DataFrame / Spark SQL / Catalyst stack.

Unlike the reference (an adapter that ships work to BigQuery/Trino/
Snowflake), here Spark SQL *is* the engine: the operator API and the
SQL surface are one Catalyst plan, so the reference's temp-table upload
dance, dialect transpilation, and engine registry are unnecessary.
"""

from fugue_warehouses_spark.schema import (
    schema_to_struct,
    struct_to_schema,
    parse_schema,
)
from fugue_warehouses_spark.session import get_spark, stop_spark
from fugue_warehouses_spark.frame import WarehouseFrame, assert_eq
from fugue_warehouses_spark.engine import SparkWarehouseEngine
from fugue_warehouses_spark.sql import is_select_query, select_sql, get_schema, describe
from fugue_warehouses_spark.transform import transform, cotransform, out_transform

__version__ = "0.1.0"

__all__ = [
    "schema_to_struct",
    "struct_to_schema",
    "parse_schema",
    "get_spark",
    "stop_spark",
    "WarehouseFrame",
    "assert_eq",
    "SparkWarehouseEngine",
    "is_select_query",
    "select_sql",
    "get_schema",
    "describe",
    "transform",
    "cotransform",
    "out_transform",
]

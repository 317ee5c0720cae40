"""SQL surface: pass-through, SQL-on-frames, dry analyze, describe.

The reference accepts any SELECT/WITH text and lets the warehouse run
it (is_select_query sniff, fugue_bigquery/_utils.py:120-124; splice of
frame placeholders into SQL, SURVEY.md §3.3). In Spark the entire 2.C
SQL repertoire is built-in: frames register as temp views, one
``spark.sql`` call produces a single Catalyst plan across the whole
statement — no dialect transpilation, no temp-table uploads.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from fugue_warehouses_spark.frame import WarehouseFrame

_SELECT_RE = re.compile(r"^\s*(--[^\n]*\n|\s)*(select|with)\b", re.IGNORECASE)


def is_select_query(sql: str) -> bool:
    """True if the text is a SELECT/WITH query (vs DDL/table name).

    Same sniff semantics as the reference
    (fugue_bigquery/_utils.py:120-124, tests/fugue_bigquery/test_utils.py).
    """
    return _SELECT_RE.match(sql) is not None


def select_sql(
    spark: SparkSession,
    *fragments: Any,
    dfs: dict[str, WarehouseFrame | DataFrame] | None = None,
) -> WarehouseFrame:
    """SQL over named frames (Fugue contract B1).

    Two calling styles:

    - fragment splicing, like ``dag.select("* FROM", df, "WHERE b>0")``
      (tests/fugue_trino/test_workflow.py:27-68): string fragments and
      frames interleave; each frame becomes a temp view spliced in by
      name. A missing leading SELECT is added.
    - named dict: ``select_sql(spark, "SELECT * FROM a", dfs={"a": df})``.

    Returns a lazy WarehouseFrame over the single spark.sql plan.
    """
    views: dict[str, DataFrame] = {}
    parts: list[str] = []
    counter = 0
    for frag in fragments:
        if isinstance(frag, (WarehouseFrame, DataFrame)):
            counter += 1
            name = f"__wf_sel_{counter}"
            views[name] = frag.native if isinstance(frag, WarehouseFrame) else frag
            parts.append(name)
        else:
            parts.append(str(frag))
    statement = " ".join(parts).strip()
    for name, df in (dfs or {}).items():
        views[name] = df.native if isinstance(df, WarehouseFrame) else df
    if not is_select_query(statement):
        statement = "SELECT " + statement
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return WarehouseFrame(spark.sql(statement))


def get_schema(spark: SparkSession, query_or_table: str) -> T.StructType:
    """Schema of a query or table without executing it (A20).

    The reference needs PREPARE/DESCRIBE OUTPUT against the warehouse
    (fugue_trino/ibis_trino/backend.py:13-33); Spark's lazy analysis
    gives it for free — ``spark.sql(q).schema`` runs no job.
    """
    if is_select_query(query_or_table):
        return spark.sql(query_or_table).schema
    return spark.table(query_or_table).schema


def describe(df: WarehouseFrame | DataFrame) -> str:
    """Pretty description: schema plus the optimized plan (A21).

    The reference prints transpiled SQL + schema (fugue_trino/api.py:13-28);
    here the honest equivalent is the Catalyst optimized logical plan.
    """
    native = df.native if isinstance(df, WarehouseFrame) else df
    schema_line = native.schema.simpleString()
    plan = native._jdf.queryExecution().optimizedPlan().toString()
    return f"schema: {schema_line}\n{plan}"

"""Python transform surface (Fugue contracts B12/B13) — Arrow-batched.

The reference ships warehouse data OUT to a companion engine to run
Python (SURVEY.md §3.2 — Ibis expr -> SQL -> temp table -> Arrow ->
pandas/Ray, then re-UPLOADS results to feed them back to SQL). In Spark
the UDF runs inside the same plan: ``mapInPandas`` /
``applyInPandas`` move Arrow batches to a Python worker colocated with
the executor — no engine hop, no re-upload, and the frame before and
after is the same distributed DataFrame.

Supported conventions:
- ``schema="*"`` passthrough, ``"*,ct:int"`` additive, or an explicit
  compact schema string (parsed by fugue_warehouses_spark.schema);
- ``# schema: *,ct:int,p:int`` comment hints read from the function
  source (tests/fugue_trino/test_workflow.py:64-75);
- param binding: extra kwargs forwarded to the function
  (``params={"p": 1}``);
- ``partition_by`` -> per-key groups via applyInPandas (+ presort
  inside each group); no partition -> per-physical-partition via
  mapInPandas;
- cotransform (B13, which the reference *disabled* on both backends —
  tests/fugue_bigquery/test_execution_engine.py:27-37) via
  ``cogroup(...).applyInPandas``.

UDFs are the slow path by design: row-at-a-time Python is never used,
only Arrow-batched pandas, and everything expressible with built-in
functions should stay out of this module.
"""

from __future__ import annotations

import inspect
import re
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fugue_warehouses_spark.frame import WarehouseFrame
from fugue_warehouses_spark.operators.take import parse_presort
from fugue_warehouses_spark.schema import parse_schema, struct_to_schema

_SCHEMA_HINT_RE = re.compile(r"^\s*#\s*schema\s*:\s*(.+)$", re.MULTILINE)


def _hint_from_source(fn: Callable) -> str | None:
    try:
        src = inspect.getsource(fn)
        comments = inspect.getcomments(fn) or ""
    except (OSError, TypeError):
        return None
    m = _SCHEMA_HINT_RE.search(comments + "\n" + src)
    return m.group(1).strip() if m else None


def resolve_output_schema(
    input_schema: T.StructType, schema: str | T.StructType | None, fn: Callable
) -> T.StructType:
    """Explicit schema arg wins; else the ``# schema:`` comment hint.

    ``*`` expands to the input schema; ``*,extra:type`` appends fields.
    """
    if schema is None:
        schema = _hint_from_source(fn)
    if schema is None:
        raise ValueError(
            "output schema required: pass schema= or add a '# schema:' hint"
        )
    if isinstance(schema, T.StructType):
        return schema
    text = schema.strip()
    if text == "*":
        return input_schema
    if text.startswith("*"):
        extra = parse_schema(text[1:].lstrip(","))
        fields = list(input_schema.fields) + list(extra.fields)
        return T.StructType(fields)
    return parse_schema(text)


def _wrap(fn: Callable, params: dict[str, Any]) -> Callable[[pd.DataFrame], pd.DataFrame]:
    def call(pdf: pd.DataFrame) -> pd.DataFrame:
        return fn(pdf, **params)

    return call


def _conform(pdf: pd.DataFrame, out_schema: T.StructType) -> pd.DataFrame:
    cols = [f.name for f in out_schema.fields]
    return pdf[cols]


def transform(
    df: WarehouseFrame | DataFrame,
    fn: Callable,
    schema: str | T.StructType | None = None,
    partition_by: list[str] | None = None,
    presort: str | None = None,
    params: dict[str, Any] | None = None,
) -> WarehouseFrame:
    """Schema-hinted pandas transform over partitions (B12).

    ``fn(pdf: pd.DataFrame, **params) -> pd.DataFrame``.
    With ``partition_by`` each key group arrives whole (and presorted if
    requested); otherwise each physical partition arrives whole.
    """
    native = df.native if isinstance(df, WarehouseFrame) else df
    params = params or {}
    out_schema = resolve_output_schema(native.schema, schema, fn)
    call = _wrap(fn, params)
    sort_spec = parse_presort(presort)

    if partition_by:

        def apply_group(pdf: pd.DataFrame) -> pd.DataFrame:
            if sort_spec:
                pdf = pdf.sort_values(
                    by=[c for c, _, _ in sort_spec],
                    ascending=[asc for _, asc, _ in sort_spec],
                )
            return _conform(call(pdf), out_schema)

        out = native.groupBy(*partition_by).applyInPandas(apply_group, out_schema)
        return WarehouseFrame(out)

    def map_partition(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        if sort_spec:
            pdf = pdf.sort_values(
                by=[c for c, _, _ in sort_spec],
                ascending=[asc for _, asc, _ in sort_spec],
            )
        yield _conform(call(pdf), out_schema)

    return WarehouseFrame(native.mapInPandas(map_partition, out_schema))


def cotransform(
    df1: WarehouseFrame | DataFrame,
    df2: WarehouseFrame | DataFrame,
    fn: Callable,
    on: list[str],
    schema: str | T.StructType | None = None,
    params: dict[str, Any] | None = None,
) -> WarehouseFrame:
    """Key-aligned two-frame transform (B13) via cogroup.applyInPandas.

    ``fn(left: pd.DataFrame, right: pd.DataFrame, **params) -> pd.DataFrame``
    receives the two groups sharing each key. The reference disabled
    this capability on both its backends; Spark makes it native.
    """
    a = df1.native if isinstance(df1, WarehouseFrame) else df1
    b = df2.native if isinstance(df2, WarehouseFrame) else df2
    params = params or {}
    if schema is None:
        schema = _hint_from_source(fn)
    if schema is None:
        raise ValueError("output schema required for cotransform")
    out_schema = schema if isinstance(schema, T.StructType) else parse_schema(schema)

    def apply(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return _conform(fn(left, right, **params), out_schema)

    out = a.groupBy(*on).cogroup(b.groupBy(*on)).applyInPandas(apply, out_schema)
    return WarehouseFrame(out)


def out_transform(
    df: WarehouseFrame | DataFrame,
    fn: Callable,
    partition_by: list[str] | None = None,
    params: dict[str, Any] | None = None,
) -> None:
    """Side-effect-only transform (Fugue's out_transform): run ``fn``
    over every partition/group, discard output, force execution."""
    native = df.native if isinstance(df, WarehouseFrame) else df
    params = params or {}

    def consume(pdf: pd.DataFrame) -> pd.DataFrame:
        fn(pdf, **(params or {}))
        return pd.DataFrame({"n": [len(pdf)]})

    schema = T.StructType([T.StructField("n", T.LongType())])
    if partition_by:
        out = native.groupBy(*partition_by).applyInPandas(
            lambda pdf: consume(pdf), schema
        )
    else:
        def map_partition(batches):
            for pdf in batches:
                yield consume(pdf)

        out = native.mapInPandas(map_partition, schema)
    out.count()


def pandas_agg(
    df: WarehouseFrame | DataFrame,
    by: list[str],
    aggs: dict[str, tuple[Callable, str, list[str]]],
    builtin: dict[str, Any] | None = None,
) -> WarehouseFrame:
    """Custom vectorized aggregates (the pandas GROUPED_AGG / UDAF
    surface): each entry is ``out_name -> (fn, return_ddl, input_cols)``
    where ``fn(*cols: pd.Series) -> scalar`` reduces each group.

    Unlike ``transform(partition_by=...)`` (whole group as a
    DataFrame), a grouped-agg UDF participates in a real HashAggregate:
    Spark evaluates it per group inside the aggregation operator with
    Arrow-batched columns — the idiomatic way to add one custom
    statistic next to built-in aggs without materializing groups.
    ``builtin`` adds ordinary Column aggregates (``F.count``/``F.sum``
    ...) to the result. Spark forbids mixing group-agg pandas UDFs
    with non-pandas aggregates inside one Aggregate operator
    (INVALID_PANDAS_UDF_PLACEMENT), so they run as a second aggregate
    over the same grouping and join back on the group key with
    null-safe equality (groupBy emits a NULL-key group; a plain
    equi-join would drop it). Both sides come out hash-partitioned on
    the key; it does read the input twice — persist upstream if that
    scan is expensive.

    Note partial (map-side) aggregation does NOT apply to pandas
    UDAFs — the group's rows shuffle to one task, so at 100 TB prefer
    built-in aggregates when one expresses the statistic; this surface
    is for the genuinely custom ones."""
    import warnings

    from pyspark.sql.pandas.functions import PandasUDFType

    native = df.native if isinstance(df, WarehouseFrame) else df
    exprs = []
    for out_name, (fn, ddl, cols) in aggs.items():
        # eval type pinned explicitly: type-hint inference needs the
        # caller's module to have pandas as a resolvable global, which
        # a library can't assume (PandasUDFType is soft-deprecated but
        # is the only hint-free spelling of GROUPED_AGG).
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            udf = F.pandas_udf(fn, ddl, PandasUDFType.GROUPED_AGG)
        exprs.append(udf(*[F.col(c) for c in cols]).alias(out_name))
    out = native.groupBy(*by).agg(*exprs)
    if builtin:
        bexprs = [col.alias(name) for name, col in builtin.items()]
        other = native.groupBy(*by).agg(*bexprs)
        # null-safe key equality: groupBy emits a NULL-key group, and a
        # plain on=by equi-join (NULL != NULL) would silently drop it
        renamed = other
        for k in by:
            renamed = renamed.withColumnRenamed(k, f"__rhs_{k}")
        cond = None
        for k in by:
            c = out[k].eqNullSafe(renamed[f"__rhs_{k}"])
            cond = c if cond is None else (cond & c)
        out = out.join(renamed, cond).drop(*[f"__rhs_{k}" for k in by])
    return WarehouseFrame(out)

"""WarehouseFrame — the engine's bounded, schema-fixed table.

Mirrors the reference's single data abstraction (SURVEY.md §1.1): a
bounded relational table with an explicit schema, lazy until executed,
carrying an optional metadata dict preserved across conversions
(fugue_bigquery/execution_engine.py:66-67,138-139). Here the lazy
expression is a Spark DataFrame (Catalyst logical plan) instead of an
Ibis expression; conversions (B17) map to toPandas/toArrow/collect.

The ``alter_columns`` cast matrix re-implements the semantics the
reference's conformance tests pin down
(tests/fugue_bigquery/test_dataframe.py:62-175): per-column cast to a
target schema, str<->bool case-insensitive, whole-double->int,
ISO date/timestamp rendering, NULL preservation, no-op skip.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator
from typing import Any

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fugue_warehouses_spark.schema import schema_to_struct, struct_to_schema


class WarehouseFrame:
    """Thin, typed wrapper over a Spark DataFrame.

    ``is_bounded`` is always True (batch frames); streaming frames live
    in :mod:`fugue_warehouses_spark.streaming`. ``is_local`` is always
    False — the data is engine-resident (distributed), matching the
    reference's warehouse-resident lazy tables
    (fugue_bigquery/dataframe.py:29-31).
    """

    def __init__(self, df: DataFrame, metadata: dict[str, Any] | None = None):
        self._df = df
        self._metadata: dict[str, Any] = dict(metadata or {})

    # ---- identity -------------------------------------------------
    @property
    def native(self) -> DataFrame:
        return self._df

    @property
    def schema(self) -> T.StructType:
        return self._df.schema

    @property
    def schema_str(self) -> str:
        return struct_to_schema(self._df.schema)

    @property
    def columns(self) -> list[str]:
        return list(self._df.columns)

    @property
    def is_bounded(self) -> bool:
        return True

    @property
    def is_local(self) -> bool:
        return False

    # ---- metadata -------------------------------------------------
    @property
    def metadata(self) -> dict[str, Any]:
        return self._metadata

    @property
    def has_metadata(self) -> bool:
        return len(self._metadata) > 0

    def reset_metadata(self, metadata: dict[str, Any] | None) -> "WarehouseFrame":
        return WarehouseFrame(self._df, metadata)

    # ---- schema ops ----------------------------------------------
    def alter_columns(self, schema: str | T.StructType) -> "WarehouseFrame":
        """Cast the listed columns to new types; other columns pass through.

        Casting to the current type is a no-op (skipped, preserving the
        plan). Semantics per the reference's cast matrix
        (tests/fugue_bigquery/test_dataframe.py:62-175).
        """
        target = schema_to_struct(schema)
        current = {f.name: f.dataType for f in self._df.schema.fields}
        casts: dict[str, Any] = {}
        for field in target.fields:
            if field.name not in current:
                raise ValueError(f"column {field.name!r} not in frame")
            if current[field.name] == field.dataType:
                continue
            casts[field.name] = _cast_column(
                F.col(field.name), current[field.name], field.dataType
            )
        if not casts:
            return self
        return WarehouseFrame(self._df.withColumns(casts), self._metadata)

    def rename(self, mapping: dict[str, str]) -> "WarehouseFrame":
        missing = set(mapping) - set(self._df.columns)
        if missing:
            raise ValueError(f"columns not in frame: {sorted(missing)}")
        return WarehouseFrame(self._df.withColumnsRenamed(mapping), self._metadata)

    def select_columns(self, columns: list[str]) -> "WarehouseFrame":
        return WarehouseFrame(self._df.select(*columns), self._metadata)

    # ---- conversions (B17) ---------------------------------------
    def as_pandas(self):
        return self._df.toPandas()

    def as_arrow(self) -> pa.Table:
        return self._df.toArrow()

    def as_array(self, type_safe: bool = False) -> list[list[Any]]:
        rows = self._df.collect()
        return [list(r) for r in rows]

    def as_dict_iterable(self) -> Iterator[dict[str, Any]]:
        for row in self._df.toLocalIterator():
            yield row.asDict(recursive=True)

    def head(self, n: int, columns: list[str] | None = None) -> list[list[Any]]:
        """First n rows, via a driver-side parquet read when the frame
        is a bare scan (the reference's ``list_rows`` fast path,
        fugue_bigquery/dataframe.py:88-108) — no Spark job, only the
        first file(s') leading row groups are touched. Falls back to
        ``limit(n).collect()`` (itself a short-circuit scan) whenever
        the plan or the file types make the shortcut unsafe."""
        fast = _metadata_head(self._df, n, columns)
        if fast is not None:
            return fast
        df = self._df.select(*columns) if columns else self._df
        return [list(r) for r in df.limit(n).collect()]

    def count(self) -> int:
        """Row count, served from parquet footer metadata when possible.

        Mirrors the reference's metadata count shortcut
        (fugue_bigquery/dataframe.py:53-56): when the frame is a raw
        file scan (no filter/limit/join/aggregate — projections can't
        change cardinality), the count is the sum of per-file
        ``num_rows`` from the parquet footers, read driver-side with no
        Spark job at all. On a 100 TB table that's a handful of footer
        reads instead of a cluster-wide scan job. Any other plan shape
        falls back to ``df.count()``.
        """
        fast = _metadata_count(self._df)
        return fast if fast is not None else self._df.count()

    def column_stats(self, column: str) -> dict[str, Any]:
        """(min, max, null_count, n_rows) for one column — served from
        parquet row-group statistics with NO Spark job when the frame
        is a bare local parquet scan and the column's physical type
        carries exact footer stats (numeric/date/timestamp; string
        min/max may be truncated in footers, so strings always take
        the job path). The 100 TB payoff is the same as the count
        shortcut: a handful of footer reads instead of a full-column
        cluster scan. Every other shape falls back to a single
        min/max/count aggregate job (which parquet still serves mostly
        from statistics via predicate/aggregate pushdown)."""
        fast = _metadata_column_stats(self._df, column)
        if fast is not None:
            return fast
        row = self._df.agg(
            F.min(column), F.max(column),
            F.sum(F.col(column).isNull().cast("long")), F.count(F.lit(1)),
        ).collect()[0]
        return {
            "min": row[0], "max": row[1],
            "null_count": row[2] or 0, "n_rows": row[3],
        }

    def show(self, n: int = 20) -> None:
        self._df.show(n)

    def peek_dict(self) -> dict[str, Any]:
        rows = self._df.limit(1).collect()
        if not rows:
            raise ValueError("frame is empty")
        return rows[0].asDict(recursive=True)


# Plan nodes that cannot change row cardinality. Anything else
# (Filter, GlobalLimit, Join, Aggregate, Generate/explode, Sample...)
# disqualifies the metadata shortcut.
_COUNT_SAFE_NODES = {"LogicalRelation", "Project", "SubqueryAlias", "View"}


def _metadata_count(df: DataFrame) -> int | None:
    """Footer-stats count for bare parquet scans; None when ineligible.

    Eligible = every node in the analyzed plan is cardinality-
    preserving (scan/projection/alias) and every input file is a local
    parquet file (object-store paths fall back to the Spark job, which
    is itself footer-cheap for count)."""
    try:
        paths = _local_scan_files(df, _COUNT_SAFE_NODES)
        if paths is None:
            return None
        import pyarrow.parquet as pq

        return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    except Exception:
        return None


def _local_scan_files(df: DataFrame, allowed_nodes: set[str]) -> list[str] | None:
    """Local parquet paths backing ``df`` iff every plan node is in
    ``allowed_nodes``; None otherwise."""
    node = df._jdf.queryExecution().analyzed()
    stack = [node]
    while stack:
        n = stack.pop()
        if n.getClass().getSimpleName() not in allowed_nodes:
            return None
        kids = n.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
    files = df.inputFiles()
    if not files:
        return None
    paths = []
    for uri in files:
        if uri.startswith("file:"):
            from urllib.parse import unquote, urlparse

            path = unquote(urlparse(uri).path)
        elif uri.startswith("/"):
            path = uri
        else:
            return None
        if not path.endswith(".parquet"):
            return None
        paths.append(path)
    return paths


# Arrow types whose to_pylist() values match Spark's collect() values
# exactly. Anything else (ns/tz timestamps, decimals, nested) falls
# back to the Spark path rather than risking a conversion delta.
def _arrow_type_safe(t) -> bool:
    import pyarrow as _pa

    if t in (
        _pa.bool_(), _pa.int8(), _pa.int16(), _pa.int32(), _pa.int64(),
        _pa.float32(), _pa.float64(), _pa.string(), _pa.large_string(),
        _pa.binary(), _pa.date32(),
    ):
        return True
    return _pa.types.is_timestamp(t) and t.unit == "us" and t.tz is None


def _metadata_head(
    df: DataFrame, n: int, columns: list[str] | None
) -> list[list[Any]] | None:
    """First-n rows straight from the leading parquet row groups;
    None when the plan isn't a bare local scan or types are unsafe."""
    try:
        # scan only — a Project would reorder/derive columns; the
        # ``columns`` argument is applied here instead
        paths = _local_scan_files(df, {"LogicalRelation"})
        if paths is None:
            return None
        import pyarrow.parquet as pq

        cols = list(columns) if columns else list(df.columns)
        out: list[list[Any]] = []
        for path in paths:
            pf = pq.ParquetFile(path)
            if not all(
                _arrow_type_safe(pf.schema_arrow.field(c).type) for c in cols
            ):
                return None
            for batch in pf.iter_batches(batch_size=n, columns=cols):
                tbl = batch.to_pylist()
                for row in tbl:
                    out.append([row[c] for c in cols])
                    if len(out) == n:
                        return out
        return out
    except Exception:
        return None


def _cast_column(col, from_type: T.DataType, to_type: T.DataType):
    """One column of the cast matrix. Spark's native cast already gives
    case-insensitive str->bool, truncating double->int, ISO renderings;
    only a couple of edges need help."""
    if isinstance(from_type, T.BooleanType) and isinstance(to_type, T.StringType):
        # canonical rendering "true"/"false" (Spark native does this too)
        return col.cast("string")
    if isinstance(from_type, (T.FloatType, T.DoubleType)) and isinstance(
        to_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        # reference semantics: whole floats convert exactly; we truncate
        return col.cast(to_type)
    if isinstance(from_type, T.StringType) and isinstance(to_type, T.TimestampNTZType):
        # accept both "2020-01-01" and "2020-01-01 01:02:03"
        return col.cast(to_type)
    return col.cast(to_type)


# ---- construction helpers ----------------------------------------


def frame_from_local(
    spark: SparkSession,
    data: Any,
    schema: str | T.StructType | None = None,
) -> WarehouseFrame:
    """Ingest local data (A9): list-of-rows / pandas / Arrow / dict-of-lists
    plus an optional compact schema string -> engine-resident frame.

    The reference uploads local data to a warehouse temp table
    (fugue_bigquery/execution_engine.py:55-77); in Spark this is just
    ``spark.createDataFrame`` — no upload round-trip.
    """
    struct = schema_to_struct(schema) if schema is not None else None
    if isinstance(data, WarehouseFrame):
        return data if struct is None else data.alter_columns(struct)
    if isinstance(data, DataFrame):
        wf = WarehouseFrame(data)
        return wf if struct is None else wf.alter_columns(struct)
    if isinstance(data, pa.Table):
        try:
            # Spark 4 ingests Arrow tables directly (zero-copy batches,
            # no pandas detour)
            df = spark.createDataFrame(data, schema=struct)
        except Exception:
            df = spark.createDataFrame(data.to_pandas(), schema=struct)
        return WarehouseFrame(df)
    import pandas as pd

    if isinstance(data, pd.DataFrame):
        return WarehouseFrame(spark.createDataFrame(data, schema=struct))
    if isinstance(data, dict):
        return WarehouseFrame(spark.createDataFrame(pd.DataFrame(data), schema=struct))
    # iterable of rows
    if isinstance(data, Iterable):
        rows = [tuple(r) for r in data]
        if struct is None:
            raise ValueError("schema required for row-iterable input")
        return WarehouseFrame(spark.createDataFrame(rows, schema=struct))
    raise TypeError(f"cannot build frame from {type(data)}")


# ---- test-kit equality (B18) -------------------------------------


def _normalize_value(v: Any, ndigits: int = 6) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, ndigits)
    if isinstance(v, list):
        return tuple(_normalize_value(x, ndigits) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _normalize_value(x, ndigits)) for k, x in v.items()))
    return v


def assert_eq(
    actual: WarehouseFrame | DataFrame,
    expected: Any,
    schema: str | T.StructType | None = None,
    check_order: bool = False,
    ndigits: int = 6,
) -> None:
    """Order-insensitive dataframe equality (Fugue contract B18).

    ``expected`` may be a WarehouseFrame, Spark DataFrame, or a list of
    rows (with ``schema`` naming the columns for error messages only).
    Floats compared after rounding to ``ndigits``.
    """
    adf = actual.native if isinstance(actual, WarehouseFrame) else actual
    arows = [tuple(_normalize_value(v, ndigits) for v in r) for r in adf.collect()]
    if isinstance(expected, WarehouseFrame):
        expected = expected.native
    if isinstance(expected, DataFrame):
        erows = [
            tuple(_normalize_value(v, ndigits) for v in r) for r in expected.collect()
        ]
    else:
        erows = [tuple(_normalize_value(v, ndigits) for v in r) for r in expected]
    if not check_order:
        arows = sorted(arows, key=repr)
        erows = sorted(erows, key=repr)
    assert arows == erows, f"frames differ:\n actual={arows}\n expect={erows}"


# physical parquet types whose footer min/max are exact (strings may be
# truncated by writers; nested/binary carry none; INT96 timestamp stats
# are writer-inconsistent and deprecated — excluded)
_STATS_EXACT_PHYSICAL = {"INT32", "INT64", "FLOAT", "DOUBLE", "BOOLEAN"}


def _metadata_column_stats(df: DataFrame, column: str) -> dict | None:
    """Row-group-statistics min/max/null_count for bare parquet scans;
    None when any file/row-group lacks exact stats for the column."""
    try:
        paths = _local_scan_files(df, _COUNT_SAFE_NODES)
        if paths is None or column not in df.columns:
            return None
        import pyarrow.parquet as pq

        mn = mx = None
        nulls = 0
        rows = 0
        for p in paths:
            md = pq.ParquetFile(p).metadata
            try:
                idx = md.schema.names.index(column)
            except ValueError:
                return None
            if md.schema.column(idx).physical_type not in _STATS_EXACT_PHYSICAL:
                return None
            rows += md.num_rows
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max or st.null_count is None:
                    return None
                nulls += st.null_count
                if st.min is not None:
                    mn = st.min if mn is None else min(mn, st.min)
                if st.max is not None:
                    mx = st.max if mx is None else max(mx, st.max)
        return {"min": mn, "max": mx, "null_count": nulls, "n_rows": rows}
    except Exception:
        return None

"""File-level data skipping via zone maps (per-file min/max indexes).

Parquet already gives Spark *row-group* pruning: the pushed filter is
re-checked against each row group's statistics at scan time. What it
does NOT give on a plain directory table is *file-list* pruning — the
scan still lists, opens and footer-reads every file. A zone map is the
tiny driver-side index that closes that gap (the same idea as Delta /
Iceberg data-skipping stats, Snowflake micro-partition pruning, or the
reference warehouses' clustered-table metadata): one row per file with
min/max per indexed column; a range predicate intersects the index
first and hands Spark only the overlapping files.

At 100 TB the arithmetic is the point: a million-file table with a
date-clustered layout (see operators/layout.py compact + z-order)
prunes to the handful of files whose [min,max] overlaps the predicate
— the query plans against those alone, so listing, footer reads, task
scheduling and the scan itself all shrink by the pruning factor.

Safety rules:
- Pruning is CONSERVATIVE: a file with missing statistics for the
  indexed column is always kept.
- Only exact-stats physical types are indexable (ints, floats, date,
  timestamp, bool). Strings are rejected: parquet footers may truncate
  string min/max, and a truncated max can understate the true range —
  which would prune a file that has matching rows.
- ``read_pruned`` re-applies the predicate as a normal Spark filter,
  so results are exact even if the index is stale-but-superset; a
  stale index that MISSES files yields wrong results, so rebuild (or
  incrementally extend) the index on ingest, exactly like any other
  secondary index.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXACT_STAT_TYPES = (
    "int8", "int16", "int32", "int64", "uint8", "uint16", "uint32",
    "uint64", "float", "double", "date32", "date64", "bool",
)


def _stats_ok(arrow_type: str) -> bool:
    t = str(arrow_type)
    return t in _EXACT_STAT_TYPES or t.startswith("timestamp")


def _file_zone_entry(path: str, columns: Sequence[str]) -> dict[str, Any]:
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    meta = pf.metadata
    schema = pf.schema_arrow
    entry: dict[str, Any] = {"file": path, "n_rows": meta.num_rows}
    for col in columns:
        fld = schema.field(col)
        if not _stats_ok(fld.type):
            raise TypeError(
                f"column {col!r} has type {fld.type} — only exact-stats "
                "types (numeric/date/timestamp/bool) are indexable; "
                "string footer stats may be truncated"
            )
        idx = meta.schema.to_arrow_schema().get_field_index(col)
        lo = hi = None
        complete = True
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                complete = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        entry[f"{col}_min"] = lo if complete else None
        entry[f"{col}_max"] = hi if complete else None
    return entry


def build_zone_map(
    path: str, columns: Sequence[str]
) -> list[dict[str, Any]]:
    """Zone map for every parquet file under ``path`` (driver-side).

    Fine for up to ~10^4 files; beyond that use
    ``build_zone_map_distributed`` — same output, footer reads fan out
    across executors.
    """
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    return [_file_zone_entry(f, columns) for f in files]


def build_zone_map_distributed(
    spark: SparkSession, path: str, columns: Sequence[str]
) -> list[dict[str, Any]]:
    """Same index, built as a Spark job: the file list is parallelized
    and each task footer-reads its shard (the scale path — a million
    footer reads is an embarrassingly parallel map, not a driver
    loop). Only the tiny stats rows come back to the driver."""
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    cols = list(columns)

    def read_footers(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for p in pdf["file"]:
                e = _file_zone_entry(p, cols)
                # stats ride back as strings (repr round-trips every
                # exact-stats type unambiguously); parsed driver-side
                row = {"file": e["file"], "n_rows": e["n_rows"]}
                for c in cols:
                    for side in ("min", "max"):
                        v = e[f"{c}_{side}"]
                        row[f"{c}_{side}"] = None if v is None else str(v)
                rows.append(row)
            yield pd.DataFrame(rows)

    stat_fields = ", ".join(
        f"`{c}_min` string, `{c}_max` string" for c in cols
    )
    schema = f"file string, n_rows bigint, {stat_fields}"
    out = (
        spark.createDataFrame([(f,) for f in files], "file string")
        .repartition(min(len(files), 64))
        .mapInPandas(read_footers, schema)
        .collect()
    )
    # parse back to native python types, keyed off the column's ARROW
    # TYPE (schema is identical across files), never off the first
    # file's stat VALUES — a first file whose stats happen to be
    # missing (all-NULL chunk) must not leave every other file's
    # min/max stringly-typed
    import datetime as _dt

    import pyarrow.parquet as pq

    schema_arrow = pq.ParquetFile(files[0]).schema_arrow

    def parser_for(col: str):
        t = str(schema_arrow.field(col).type)
        if t == "bool":
            return lambda v: v == "True"
        if t.startswith(("int", "uint")):
            return int
        if t in ("float", "double", "halffloat"):
            return float
        if t.startswith("timestamp"):
            return _dt.datetime.fromisoformat
        if t.startswith("date"):
            return _dt.date.fromisoformat
        return lambda v: v

    parsers = {c: parser_for(c) for c in cols}
    entries = []
    for r in out:
        d = r.asDict()
        for c in cols:
            for side in ("min", "max"):
                v = d[f"{c}_{side}"]
                d[f"{c}_{side}"] = None if v is None else parsers[c](v)
        entries.append(d)
    return sorted(entries, key=lambda e: e["file"])


def prune_files(
    zone_map: list[dict[str, Any]],
    column: str,
    lo: Any = None,
    hi: Any = None,
) -> list[str]:
    """Files whose [min,max] MAY overlap [lo, hi] (either bound may be
    None for a half-open range). Files without stats are kept."""
    kept = []
    for e in zone_map:
        fmin, fmax = e.get(f"{column}_min"), e.get(f"{column}_max")
        if fmin is None or fmax is None:
            kept.append(e["file"])  # conservative
            continue
        if lo is not None and fmax < lo:
            continue
        if hi is not None and fmin > hi:
            continue
        kept.append(e["file"])
    return kept


def read_pruned(
    spark: SparkSession,
    path: str,
    column: str,
    lo: Any = None,
    hi: Any = None,
    zone_map: list[dict[str, Any]] | None = None,
) -> DataFrame:
    """Range-predicate read with file-list pruning: intersect the zone
    map, plan the scan over surviving files only, then re-apply the
    predicate as a normal filter (row-group pruning + exactness).

    Returns an empty-but-typed frame when nothing survives."""
    zm = zone_map if zone_map is not None else build_zone_map(path, [column])
    kept = prune_files(zm, column, lo, hi)
    if not kept:
        full = spark.read.parquet(path)
        return full.filter(F.lit(False))
    df = spark.read.parquet(*kept)
    if lo is not None:
        df = df.filter(F.col(column) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(column) <= F.lit(hi))
    return df

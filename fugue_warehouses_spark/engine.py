"""SparkWarehouseEngine — the reference's ExecutionEngine contract, Spark-native.

Every operator from SURVEY.md §2.A/§2.B, expressed declaratively so
Catalyst owns planning: joins pick broadcast/sort-merge by stats + AQE,
filters/projections push into the parquet scan, semi/anti are native
join types (no rewrite, unlike fugue_bigquery/execution_engine.py:104-124).

Scale stance: no driver-side collects in any operator; every method
returns a lazy frame. Small dimension tables go through
``broadcast``; persist offers both memory caching and durable
content-addressed checkpoints (plans/checkpoint.py).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fugue_warehouses_spark.frame import WarehouseFrame, frame_from_local
from fugue_warehouses_spark.naming import TableName
from fugue_warehouses_spark.operators.take import take as _take
from fugue_warehouses_spark.plans.checkpoint import (
    deterministic_checkpoint,
    yield_table_as,
)
from fugue_warehouses_spark.sql import is_select_query, select_sql

_JOIN_HOW = {
    "inner": "inner",
    "cross": "cross",
    "left_outer": "left",
    "left": "left",
    "right_outer": "right",
    "right": "right",
    "full_outer": "full",
    "outer": "full",
    "full": "full",
    "semi": "left_semi",
    "left_semi": "left_semi",
    "anti": "left_anti",
    "left_anti": "left_anti",
}


class SparkWarehouseEngine:
    """One engine, one session. The reference's registry/inference layer
    (fugue_bigquery/registry.py) collapses away: Spark SQL is both the
    operator API and the SQL engine."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    # ---- ingest / frames (A9) ------------------------------------
    def to_df(self, data: Any, schema: str | None = None) -> WarehouseFrame:
        return frame_from_local(self.spark, data, schema)

    # ---- scans (A1, A2, A5) --------------------------------------
    def load_table(
        self,
        table: "str | TableName",
        columns: list[str] | None = None,
        sample: float | None = None,
        sample_unit: str = "rows",
    ) -> WarehouseFrame:
        """Table name (str or parsed TableName) or SELECT text -> lazy
        frame (A1+A2 unified).

        ``sample`` (0 < p <= 1) is the source-level sample, the analog
        of the reference splicing ``TABLESAMPLE SYSTEM (p PERCENT)``
        into generated SQL so the warehouse prunes the scan
        (fugue_bigquery/_utils.py:99-117, api.py:54-57). Two units:

        - ``sample_unit="rows"`` (default, Bernoulli): a ``Sample``
          node attached directly at the scan, BELOW any later
          joins/aggregates the caller builds on the frame, so
          downstream wide ops see only the sampled rows
          (plan-asserted in tests/test_plans.py). NOTE: OSS Spark's
          ``Sample`` still READS every row and then discards — the
          win is plan position (cheaper downstream), not scan cost.
        - ``sample_unit="files"`` (cluster sampling, the true
          ``TABLESAMPLE SYSTEM`` intent): deterministically keeps a
          ~p fraction of the table's underlying files (md5 of the
          file path) and re-reads only those, pinning the original
          schema — a real scan-cost cut, at the price of
          cluster-sample statistics (whole files in or out, like
          SYSTEM's storage-block granularity). Requires a file-backed
          parquet table; at least one file is always kept.
        """
        if sample_unit not in ("rows", "files"):
            # validated even when sample is None: a typo'd unit (or a
            # unit passed without a fraction) must fail loudly, not be
            # silently ignored
            raise ValueError(
                f"sample_unit must be 'rows' or 'files', got {sample_unit!r}"
            )
        if sample is None and sample_unit != "rows":
            raise ValueError(
                "sample_unit='files' given without a sample fraction; "
                "pass sample=p to actually sample"
            )
        is_query = not isinstance(table, TableName) and is_select_query(table)
        if isinstance(table, TableName):
            df = self.spark.table(table.full_name)
        elif is_query:
            df = self.spark.sql(table)
        else:
            df = self.spark.table(table)
        if sample is not None:
            if not (0.0 < sample <= 1.0):
                raise ValueError(f"sample must be in (0, 1], got {sample}")
            if sample_unit == "files":
                if is_query:
                    # a SELECT source still reports the base table's
                    # inputFiles, so a naive re-read would silently DROP
                    # the query's filters/projections — refuse instead
                    raise ValueError(
                        "file-level sampling applies to plain tables only "
                        "(re-reading a SELECT source's files would discard "
                        "the query's own semantics); use "
                        "sample_unit='rows', or sample the base table and "
                        "query the sampled frame"
                    )
                df = self._sample_files(df, sample)
            else:
                df = df.sample(fraction=sample, seed=42)
        if columns:
            df = df.select(*columns)
        return WarehouseFrame(df)

    def _sample_files(self, df: DataFrame, fraction: float) -> DataFrame:
        """Listing-level cluster sample: keep files whose md5(path)
        falls under ``fraction`` (deterministic across runs and
        clusters — no seed state), re-read with the schema pinned so
        a sampled read can't drift from the full table's types.

        Hive-partitioned tables are read with ``basePath`` set to the
        common listing root, so partition-directory columns
        (``g=1/part-...``) are still discovered instead of null-filling
        from the pinned schema."""
        import hashlib
        import posixpath

        files = df.inputFiles()
        if not files:
            raise ValueError(
                "file-level sampling needs a file-backed table "
                "(this source has no file listing); use sample_unit='rows'"
            )
        if not all(f.split("?")[0].endswith(".parquet") for f in files):
            raise ValueError(
                "file-level sampling currently supports parquet tables"
            )
        key = lambda f: int(hashlib.md5(f.encode()).hexdigest()[:8], 16)
        chosen = [f for f in files if key(f) < fraction * 0x100000000]
        if not chosen:  # never sample down to an empty relation
            chosen = [min(files, key=key)]
        # common directory root of the FULL listing (not just the chosen
        # subset): partition discovery needs the true table root.
        # Segment-wise prefix — a string prefix could cut mid-directory.
        dirs = [posixpath.dirname(f).split("/") for f in files]
        root_parts = dirs[0]
        for d in dirs[1:]:
            i = 0
            while i < min(len(root_parts), len(d)) and root_parts[i] == d[i]:
                i += 1
            root_parts = root_parts[:i]
        # A table where every row shares ONE partition value lists as
        # .../table/g=1/part-*.parquet — the partition dir itself lands
        # inside the common root. Trim trailing key=value segments off
        # the root so basePath points above them and the partition
        # column is rediscovered instead of silently null-filled from
        # the pinned schema. Only segments whose KEY is a column of the
        # table's schema count as partition dirs: with basePath +
        # user schema Spark APPENDS any discovered partition column
        # (measured — it is NOT dropped), so an unpartitioned table
        # whose directory merely contains '=' (".../t=x/") must not
        # trigger the trim or the check, or the sampled read would grow
        # a phantom column. AND the key must be absent from the parquet
        # files' PHYSICAL schema: a hive partition column is never
        # stored in the data files, so a key that IS physically present
        # means an unpartitioned table whose root merely looks like a
        # partition dir (".../g=2/" with a real data column g) — setting
        # basePath above such a root would make partition discovery
        # OVERWRITE every row's g with the literal 2 (silent
        # corruption). One file-footer read, and only when a candidate
        # segment exists at all.
        cols = set(df.schema.names)
        _phys: list[set] = []  # lazy one-footer physical-schema memo

        def _physical_cols() -> set:
            if not _phys:
                _phys.append(
                    set(self.spark.read.parquet(files[0]).schema.names)
                )
            return _phys[0]

        def _is_part_dir(seg: str) -> bool:
            key, eq, _ = seg.partition("=")
            return eq == "=" and key in cols and key not in _physical_cols()

        while root_parts and _is_part_dir(root_parts[-1]):
            root_parts = root_parts[:-1]
        root = "/".join(root_parts)
        reader = self.spark.read.schema(df.schema)
        if any(
            _is_part_dir(seg) for d in dirs for seg in d[len(root_parts):]
        ):
            reader = reader.option("basePath", root)
        return reader.parquet(*chosen)

    def load_df(
        self,
        path: str,
        fmt: str | None = None,
        columns: list[str] | None = None,
        **options: Any,
    ) -> WarehouseFrame:
        """File load (A5). Format inferred from the extension when not
        given. Column pruning + any later filter push into the scan
        (Catalyst: ColumnPruning / PushDownPredicates — verified in
        tests via explain)."""
        fmt = fmt or _infer_format(path)
        reader = self.spark.read
        if fmt == "csv":
            reader = reader.option("header", "true").option("inferSchema", "true")
        df = reader.options(**options).format(fmt).load(path)
        if columns:
            df = df.select(*columns)
        return WarehouseFrame(df)

    def load_jdbc(
        self,
        url: str,
        table: str,
        partition_column: str | None = None,
        lower_bound: int | str | None = None,
        upper_bound: int | str | None = None,
        num_partitions: int | None = None,
        predicates: list[str] | None = None,
        columns: list[str] | None = None,
        **properties: str,
    ) -> WarehouseFrame:
        """Federated parallel read of a remote database (the Spark analog
        of the reference's partitioned Storage-API reader,
        fugue_bigquery/client.py:227-296: driver plans N shards, workers
        each open their own connection and read one shard).

        Two sharding modes, mutually exclusive:

        - **range**: ``partition_column`` + ``lower_bound`` /
          ``upper_bound`` + ``num_partitions`` — Spark issues N
          concurrent range-predicate queries (the stream-count knob of
          the reference, ``max_stream_count``).
        - **predicates**: one partition per WHERE fragment — the analog
          of the reference's explicit ``row_restriction`` sharding.

        With neither, the read is single-partition (correct but serial
        — fine for small dimension tables only). ``table`` may be a
        table name or a ``(SELECT ...) t`` derived-table alias;
        connection settings (driver, user, password, fetchsize...) pass
        through ``properties``.
        """
        if predicates is not None and partition_column is not None:
            raise ValueError(
                "pass either partition_column (range mode) or predicates, not both"
            )
        if partition_column is not None and (
            lower_bound is None or upper_bound is None or num_partitions is None
        ):
            raise ValueError(
                "range mode needs lower_bound, upper_bound and num_partitions"
            )
        kwargs: dict[str, Any] = {"properties": dict(properties) or None}
        if partition_column is not None:
            kwargs.update(
                column=partition_column,
                lowerBound=lower_bound,
                upperBound=upper_bound,
                numPartitions=num_partitions,
            )
        elif predicates is not None:
            kwargs.update(predicates=list(predicates))
        df = self.spark.read.jdbc(url, table, **kwargs)
        if columns:
            df = df.select(*columns)
        return WarehouseFrame(df)

    # ---- sinks (A6, A7) ------------------------------------------
    def save_table(
        self,
        df: WarehouseFrame | DataFrame,
        table: "str | TableName",
        mode: str = "overwrite",
        bucket_by: list[str] | None = None,
        num_buckets: int = 32,
        sort_by: list[str] | None = None,
    ) -> None:
        """Persist as a managed table (A6).

        ``bucket_by`` hash-buckets the table on the given keys at write
        time — the co-located-join lever at scale: two tables bucketed
        on the same keys with the same bucket count join with ZERO
        shuffle (asserted in tests/test_plans.py), because each task
        reads matching bucket files from both sides. Pay one shuffle at
        write, save it on every subsequent join/aggregation on the key.
        """
        writer = _n(df).write.mode(mode)
        if bucket_by:
            writer = writer.bucketBy(num_buckets, *bucket_by)
            writer = writer.sortBy(*(sort_by or bucket_by))
        writer.saveAsTable(
            table.full_name if isinstance(table, TableName) else table
        )

    def save_df(
        self,
        df: WarehouseFrame | DataFrame,
        path: str,
        fmt: str | None = None,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        force_single: bool = False,
        **options: Any,
    ) -> None:
        native = _n(df)
        if force_single:
            native = native.coalesce(1)
        fmt = fmt or _infer_format(path)
        if fmt == "csv":
            # symmetric with load_df's csv defaults: write the header
            # row so a header=true read round-trips
            options = {"header": "true", **options}
        writer = native.write.mode(mode).options(**options)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.format(fmt).save(path)

    # ---- catalog (A22, A23) --------------------------------------
    def table_exists(self, name: "str | TableName") -> bool:
        if isinstance(name, TableName):
            name = name.full_name
        return self.spark.catalog.tableExists(name)

    def analyze_table(
        self, name: "str | TableName", columns: list[str] | None = None
    ) -> None:
        """Collect table (and optionally column) statistics into the
        catalog for cost-based optimization — the engine-side analog of
        the statistics a warehouse maintains automatically (row counts
        back the reference's metadata-only count fast path,
        fugue_bigquery/dataframe.py:53-56).

        With stats present, Catalyst's CBO can pick broadcast sides and
        join orders from measured sizes instead of file-size guesses —
        on a 100 TB star schema that is the difference between
        broadcasting a filtered dim by evidence vs. by luck.
        """
        if isinstance(name, TableName):
            name = name.full_name
        if columns:
            cols = ", ".join(f"`{c}`" for c in columns)
            self.spark.sql(
                f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}"
            )
        else:
            self.spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")

    def table_stats(self, name: "str | TableName") -> dict[str, int]:
        """Catalog statistics for a saved table: ``rows`` and ``bytes``
        (absent keys mean never analyzed). Serves count()-style
        metadata queries without a scan."""
        if isinstance(name, TableName):
            name = name.full_name
        rows = self.spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        out: dict[str, int] = {}
        for r in rows:
            if r["col_name"] == "Statistics":
                # e.g. "123456 bytes, 1500 rows"
                for part in r["data_type"].split(","):
                    part = part.strip()
                    if part.endswith("bytes"):
                        out["bytes"] = int(part.split()[0])
                    elif part.endswith("rows"):
                        out["rows"] = int(part.split()[0])
        return out

    def register_temp(self, df: WarehouseFrame | DataFrame, name: str) -> None:
        _n(df).createOrReplaceTempView(name)

    def drop_temp(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)

    # ---- SQL (B1, A2, A25) ---------------------------------------
    def sql(self, statement: str) -> WarehouseFrame:
        """Raw SQL — SELECT or DDL (A25); full 2.C surface."""
        return WarehouseFrame(self.spark.sql(statement))

    def select(
        self, *fragments: Any, dfs: dict[str, Any] | None = None
    ) -> WarehouseFrame:
        return select_sql(self.spark, *fragments, dfs=dfs)

    # ---- joins (A10, A11, B4) ------------------------------------
    def join(
        self,
        df1: WarehouseFrame | DataFrame,
        df2: WarehouseFrame | DataFrame,
        how: str,
        on: list[str] | None = None,
        broadcast_right: bool = False,
        strategy: str | None = None,
    ) -> WarehouseFrame:
        """All Fugue join types. Key default = same-named columns
        (SURVEY.md A11). semi/anti are Spark-native left_semi/left_anti
        — result carries the left schema only, right side implicitly
        dedup'd, matching the reference's rewrite semantics without the
        rewrite. ``broadcast_right`` hints Catalyst for small dims (it
        also auto-broadcasts under the size threshold / AQE).

        ``strategy`` pins the physical join when the optimizer's choice
        must be overridden: ``"broadcast"`` | ``"merge"`` (sort-merge,
        e.g. to let bucketed tables join shuffle-free instead of being
        masked by a broadcast) | ``"shuffle_hash"`` |
        ``"shuffle_replicate_nl"``. Hints are placement preferences,
        not semantics — results are identical either way; leave None
        (AQE decides from runtime sizes) unless a plan test or a skew
        profile says otherwise."""
        a, b = _n(df1), _n(df2)
        how_norm = _JOIN_HOW.get(how.lower().replace(" ", "_"))
        if how_norm is None:
            raise ValueError(f"unknown join type {how!r}")
        if strategy is not None:
            valid = {"broadcast", "merge", "shuffle_hash", "shuffle_replicate_nl"}
            if strategy not in valid:
                raise ValueError(
                    f"unknown join strategy {strategy!r}; pick from {sorted(valid)}"
                )
            b = b.hint(strategy)
        if broadcast_right:
            b = F.broadcast(b)
        if how_norm == "cross":
            return WarehouseFrame(a.crossJoin(b))
        keys = on if on is not None else sorted(set(a.columns) & set(b.columns))
        if not keys:
            raise ValueError("no join keys: no same-named columns and no `on`")
        return WarehouseFrame(a.join(b, on=keys, how=how_norm))

    def merge_into(
        self,
        target: WarehouseFrame | DataFrame,
        source: WarehouseFrame | DataFrame,
        on: list[str],
        update_cols: list[str] | None = None,
        insert_unmatched: bool = True,
        action_col: str | None = None,
    ) -> WarehouseFrame:
        """Warehouse-style MERGE (SCD1 upsert) as a pure relational op.

        ``WHEN MATCHED THEN UPDATE SET update_cols``, ``WHEN NOT
        MATCHED THEN INSERT`` — the DML every reference warehouse runs
        natively (BigQuery/Trino/Snowflake MERGE); here it's a full
        (or left, if ``insert_unmatched=False``) outer join producing
        the post-merge table, which the caller persists via save_table.

        ``source`` must carry the key columns plus the update columns;
        ``update_cols`` defaults to every non-key source column that
        exists in the target. Inserted rows leave target-only columns
        null. ``action_col`` optionally adds 'update'/'insert'/'keep'
        provenance.

        Scale: one shuffle on the merge keys for both sides (or none
        for the target if it is bucketed by the keys, engine.save_table
        bucket_by); a small source broadcasts under AQE as usual.
        """
        t, s = _n(target), _n(source)
        if not on:
            raise ValueError("merge_into requires join keys")
        missing = [k for k in on if k not in s.columns]
        if missing:
            raise ValueError(f"source lacks key columns {missing}")
        if update_cols is None:
            update_cols = [
                c for c in s.columns if c not in on and c in t.columns
            ]
        bad = [c for c in update_cols if c not in s.columns or c not in t.columns]
        if bad:
            raise ValueError(f"update columns {bad} must exist in both frames")
        # presence flags (not key-null checks): a row whose KEY is null
        # never joins, but it still exists on its own side — key-based
        # matched/in_target tests would misclassify it
        s = s.select(*on, *update_cols).withColumn("__s_present", F.lit(True))
        t = t.withColumn("__t_present", F.lit(True))
        ta, sa = t.alias("_t"), s.alias("_s")
        cond = None
        for k in on:
            eq = ta[k] == sa[k]
            cond = eq if cond is None else (cond & eq)
        how = "full_outer" if insert_unmatched else "left_outer"
        joined = ta.join(sa, cond, how)
        matched = F.coalesce(sa["__s_present"], F.lit(False))
        in_target = F.coalesce(ta["__t_present"], F.lit(False))
        cols = []
        for c in t.columns:
            if c == "__t_present":
                continue
            if c in on:
                cols.append(F.coalesce(ta[c], sa[c]).alias(c))
            elif c in update_cols:
                cols.append(F.when(matched, sa[c]).otherwise(ta[c]).alias(c))
            else:
                cols.append(ta[c].alias(c))
        if action_col:
            cols.append(
                F.when(matched & in_target, F.lit("update"))
                .when(matched, F.lit("insert"))
                .otherwise(F.lit("keep"))
                .alias(action_col)
            )
        return WarehouseFrame(joined.select(*cols))

    # ---- set ops (B5, B6, B7) ------------------------------------
    def union(
        self,
        df1: WarehouseFrame | DataFrame,
        df2: WarehouseFrame | DataFrame,
        distinct: bool = True,
    ) -> WarehouseFrame:
        out = _n(df1).unionByName(_n(df2))
        return WarehouseFrame(out.distinct() if distinct else out)

    def intersect(
        self,
        df1: WarehouseFrame | DataFrame,
        df2: WarehouseFrame | DataFrame,
        distinct: bool = True,
    ) -> WarehouseFrame:
        a, b = _n(df1), _n(df2)
        return WarehouseFrame(a.intersect(b) if distinct else a.intersectAll(b))

    def subtract(
        self,
        df1: WarehouseFrame | DataFrame,
        df2: WarehouseFrame | DataFrame,
        distinct: bool = True,
    ) -> WarehouseFrame:
        a, b = _n(df1), _n(df2)
        return WarehouseFrame(a.subtract(b) if distinct else a.exceptAll(b))

    def distinct(self, df: WarehouseFrame | DataFrame) -> WarehouseFrame:
        return WarehouseFrame(_n(df).distinct())

    # ---- null handling (B8, B9) ----------------------------------
    def dropna(
        self,
        df: WarehouseFrame | DataFrame,
        how: str = "any",
        thresh: int | None = None,
        subset: list[str] | None = None,
    ) -> WarehouseFrame:
        return WarehouseFrame(_n(df).dropna(how=how, thresh=thresh, subset=subset))

    def fillna(
        self, df: WarehouseFrame | DataFrame, value: Any, subset: list[str] | None = None
    ) -> WarehouseFrame:
        if isinstance(value, dict):
            return WarehouseFrame(_n(df).fillna(value))
        return WarehouseFrame(_n(df).fillna(value, subset=subset))

    # ---- sample / limit / take (A12, A13, B10) -------------------
    def sample(
        self,
        df: WarehouseFrame | DataFrame,
        n: int | None = None,
        frac: float | None = None,
        replace: bool = False,
        seed: int | None = None,
    ) -> WarehouseFrame:
        """Fraction sampling is a Sample plan node (pushed below wide
        ops); n-sampling is exact-n via limit, matching the reference
        (count()==90 asserted, tests/fugue_bigquery/test_execution_engine.py:52-58)."""
        if (n is None) == (frac is None):
            raise ValueError("specify exactly one of n, frac")
        native = _n(df)
        if n is not None:
            return WarehouseFrame(native.limit(n))
        return WarehouseFrame(
            native.sample(withReplacement=replace, fraction=frac, seed=seed)
        )

    def take(
        self,
        df: WarehouseFrame | DataFrame,
        n: int,
        presort: str | None = None,
        na_position: str = "last",
        partition_by: list[str] | None = None,
    ) -> WarehouseFrame:
        return WarehouseFrame(_take(_n(df), n, presort, na_position, partition_by))

    # ---- aggregation (B11) ---------------------------------------
    def aggregate(
        self,
        df: WarehouseFrame | DataFrame,
        partition_by: list[str] | None,
        agg_exprs: dict[str, str],
    ) -> WarehouseFrame:
        """Per-key or global aggregation; ``agg_exprs`` maps output name
        -> SQL aggregate expression (map-side partial aggregation comes
        free from Spark's HashAggregate pair)."""
        cols = [F.expr(e).alias(name) for name, e in agg_exprs.items()]
        native = _n(df)
        if partition_by:
            return WarehouseFrame(native.groupBy(*partition_by).agg(*cols))
        return WarehouseFrame(native.agg(*cols))

    # ---- partitioning (B14, B15, A3) -----------------------------
    def repartition(
        self,
        df: WarehouseFrame | DataFrame,
        num: int | None = None,
        by: list[str] | None = None,
        presort: str | None = None,
        algo: str = "hash",
    ) -> WarehouseFrame:
        """PartitionSpec mapping (SURVEY.md §1.4): hash -> repartition,
        even/rand -> round-robin, range -> repartitionByRange; presort ->
        sortWithinPartitions (no global shuffle); per_row -> exactly one
        row per partition (the reference's ``PartitionSpec("per_row")``
        fan-out, fugue_bigquery/client.py:294 — used to hand each row
        its own task, e.g. one model/config per worker; small frames by
        contract, since it materializes a count and schedules one task
        per row)."""
        native = _n(df)
        if algo == "per_row":
            n = native.count()
            if n == 0:
                return WarehouseFrame(native)
            rdd = (
                native.rdd.zipWithIndex()
                .map(lambda t: (t[1], t[0]))
                .partitionBy(n, lambda k: int(k))
                .values()
            )
            out = native.sparkSession.createDataFrame(rdd, native.schema)
            return WarehouseFrame(out)
        if by:
            if algo == "range":
                native = (
                    native.repartitionByRange(num, *by)
                    if num
                    else native.repartitionByRange(*by)
                )
            else:
                native = native.repartition(num, *by) if num else native.repartition(*by)
        elif num:
            native = native.repartition(num)
        if presort:
            from fugue_warehouses_spark.operators.take import _order_columns

            native = native.sortWithinPartitions(*_order_columns(presort, []))
        return WarehouseFrame(native)

    def broadcast(self, df: WarehouseFrame | DataFrame) -> WarehouseFrame:
        return WarehouseFrame(F.broadcast(_n(df)))

    # ---- persist / checkpoint (A17, B16) -------------------------
    def persist(self, df: WarehouseFrame | DataFrame, lazy: bool = False) -> WarehouseFrame:
        native = _n(df).cache()
        if not lazy:
            native.count()  # force materialization, like the reference's CTAS persist
        return WarehouseFrame(native)

    def checkpoint(self, df: WarehouseFrame | DataFrame, namespace: str = "") -> WarehouseFrame:
        return WarehouseFrame(
            deterministic_checkpoint(_n(df), self.spark, namespace=namespace)
        )

    def yield_table_as(self, df: WarehouseFrame | DataFrame, name: str) -> None:
        yield_table_as(_n(df), name, self.spark)

    # ---- convenience ---------------------------------------------
    def stop(self) -> None:
        self.spark.stop()


def _n(df: WarehouseFrame | DataFrame) -> DataFrame:
    return df.native if isinstance(df, WarehouseFrame) else df


def _infer_format(path: str) -> str:
    lowered = path.rstrip("/").lower()
    for ext, fmt in (
        (".parquet", "parquet"),
        (".csv", "csv"),
        (".json", "json"),
        (".orc", "orc"),
        (".avro", "avro"),
    ):
        if lowered.endswith(ext):
            return fmt
    return "parquet"

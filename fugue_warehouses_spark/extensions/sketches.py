"""Mergeable cardinality / frequency sketches with engine-reproducible
registers.

Two sketches back the approximate-aggregate surface (SURVEY.md §2.C
``APPROX_COUNT_DISTINCT`` analog, plus the heavy-hitter counting a
training-data pipeline needs for corpus frequency stats):

- **KMV (k-minimum values)** distinct-count sketch (Bar-Yossef et al.
  2002; Beyer et al. SIGMOD'07 "On synopses for distinct value
  estimation"): keep the ``k`` smallest values of a uniform hash of the
  column; estimate ``D ≈ (k-1) / U_(k)`` where ``U_(k)`` is the k-th
  smallest hash normalized to (0,1].
- **Count-min sketch** (Cormode & Muthukrishnan 2005): a ``depth ×
  width`` grid of counters; each item increments one counter per row
  (bucket = row-seeded hash mod width); a point estimate is the MIN of
  an item's ``depth`` counters (biased high, never low).

Unlike the engine-native ``approx_count_distinct`` (HLL++, whose
registers are implementation-specific), every register here derives
from md5 — identical in any engine — so the *approximate* answers are
exactly reproducible cross-engine and the registry queries built on
them carry full hash-compared DuckDB oracles (queries.py
``orders_kmv_distinct`` / ``events_cms_user_counts``).

Scale design (the 100 TB stance):

- A KMV sketch is ONE distributed top-k over the hash — partial
  per-partition top-k, single k-row merge (``TakeOrderedAndProject``);
  no full shuffle of the distinct set. The sketch is k rows no matter
  the input size, and two sketches union-merge (take the k smallest of
  the union), so per-partition / per-day sketches roll up without
  rescanning.
- A CMS is one ``groupBy(row, bucket).count()`` — map-side partial
  aggregation collapses each task's stream to at most ``depth*width``
  rows before the shuffle, so shuffle volume is bounded by the sketch
  size times the task count, not the data. Sketches merge by summing
  counters (``cms_merge``), the standard mergeability argument of the
  paper, and a merged sketch is small enough to broadcast to the probe
  side.

The reference has no sketch layer (it delegates APPROX_* to the
warehouse); this module is the self-contained equivalent, per
SURVEY.md §2.C.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^60 — the hash range: 15 hex chars of md5, always positive in BIGINT.
_M60 = 1 << 60


def hash60(col: Column) -> Column:
    """Uniform 60-bit hash as a non-negative BIGINT, from md5.

    15 hex chars = 60 bits < 2^63, so the value is exact in a signed
    64-bit integer in every engine (DuckDB twin:
    ``('0x' || substr(md5(x), 1, 15))::UBIGINT``).
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


# ---------------------------------------------------------------------
# KMV distinct-count sketch
# ---------------------------------------------------------------------


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The k smallest distinct ``hash60`` values of ``df[col]``.

    One column ``h`` (BIGINT), at most ``k`` rows. The plan is a
    partial-aggregate distinct followed by a global top-k
    (``TakeOrderedAndProject``) — no full shuffle of the distinct set.
    """
    return (
        df.select(hash60(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Union-merge two KMV sketches: the k smallest of the union."""
    return a.union(b).distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate from a KMV sketch.

    If the sketch holds fewer than ``k`` hashes the count is exact
    (every distinct value is present). Otherwise
    ``D ≈ (k-1) * 2^60 / h_(k)``. The arithmetic is a single IEEE
    double division of exactly-determined integers, so the estimate is
    bit-identical cross-engine; it is floored to BIGINT so no float
    leaves the query.

    Returns one row: ``est_distinct`` BIGINT, ``sketch_size`` BIGINT,
    ``kth_min_hash`` BIGINT (the raw register, pinning determinism).
    """
    agg = sketch.agg(
        F.count(F.lit(1)).alias("sketch_size"),
        F.max("h").alias("kth_min_hash"),
    )
    numer = float((k - 1) * _M60)  # exact: (k-1) has <= 11 significant bits
    est = F.when(
        F.col("sketch_size") < k, F.col("sketch_size").cast("double")
    ).otherwise(
        F.lit(numer) / F.greatest(F.col("kth_min_hash"), F.lit(1)).cast("double")
    )
    return agg.select(
        F.floor(est).cast("long").alias("est_distinct"),
        F.col("sketch_size").cast("long"),
        F.col("kth_min_hash").cast("long"),
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """``kmv_estimate(kmv_sketch(df, col, k), k)`` in one call."""
    return kmv_estimate(kmv_sketch(df, col, k), k)


def kmv_rollup(
    df: DataFrame, group_col: str, col: str, k: int = 256
) -> DataFrame:
    """Per-group KMV estimates PLUS the merged all-groups estimate,
    computed from the group sketches alone — the mergeability property
    that makes sketches the scale answer: per-partition / per-day
    sketches (k rows each) roll up to the global estimate without
    rescanning the data. The k smallest hashes of the union of
    per-group top-k sets ARE the global top-k (any globally-small hash
    is small within its own group), so the merged estimate is exactly
    what a fresh full-data sketch would produce.

    One scan: distinct (group, hash) pairs -> per-group window top-k;
    the merge works over ≤ k·groups sketch rows. Output one row per
    group plus scope='ALL': (scope, est_distinct, sketch_size,
    kth_min_hash).
    """
    from pyspark.sql.window import Window

    hs = df.select(
        F.col(group_col).cast("string").alias("scope"),
        hash60(F.col(col)).alias("h"),
    ).distinct()
    w = Window.partitionBy("scope").orderBy("h")
    sk = (
        hs.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )
    per = sk.groupBy("scope").agg(
        F.count(F.lit(1)).alias("sketch_size"), F.max("h").alias("kth_min_hash")
    )
    merged = (
        sk.select("h").distinct().orderBy("h").limit(k)
        .agg(
            F.count(F.lit(1)).alias("sketch_size"),
            F.max("h").alias("kth_min_hash"),
        )
        .select(F.lit("ALL").alias("scope"), "sketch_size", "kth_min_hash")
    )
    both = per.unionByName(merged)
    numer = float((k - 1) * _M60)
    est = F.when(
        F.col("sketch_size") < k, F.col("sketch_size").cast("double")
    ).otherwise(
        F.lit(numer) / F.greatest(F.col("kth_min_hash"), F.lit(1)).cast("double")
    )
    return both.select(
        "scope",
        F.floor(est).cast("long").alias("est_distinct"),
        F.col("sketch_size").cast("long").alias("sketch_size"),
        F.col("kth_min_hash").cast("long").alias("kth_min_hash"),
    )


def kmv_sql(table: str, col: str, k: int = 256) -> str:
    """DuckDB twin of ``kmv_distinct`` (ANSI-ish; used by the oracle)."""
    numer = f"{float((k - 1) * _M60)!r}"
    return f"""
    WITH hs AS (
      SELECT DISTINCT CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))
                           AS UBIGINT) AS h
      FROM {table}),
    sk AS (SELECT h FROM hs ORDER BY h LIMIT {k}),
    a AS (SELECT count(*) AS n, CAST(max(h) AS BIGINT) AS kh FROM sk)
    SELECT CAST(floor(CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
                           ELSE {numer} / CAST(greatest(kh, 1) AS DOUBLE) END)
                AS BIGINT) AS est_distinct,
           CAST(n AS BIGINT) AS sketch_size,
           kh AS kth_min_hash
    FROM a
    """


# ---------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------


def _cms_bucket(col: Column, row: Column, width: int) -> Column:
    """Row-seeded bucket: hash60("<row>:<value>") mod width."""
    seeded = F.concat(row.cast("string"), F.lit(":"), col.cast("string"))
    return (hash60(seeded) % F.lit(width)).cast("int")


def cms_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of ``df[col]`` occurrences.

    Columns ``(row int, bucket int, cnt bigint)``; at most
    ``depth*width`` rows. The explode-by-depth happens map-side and the
    partial aggregation collapses each task to sketch-sized output
    before the single shuffle.
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    return (
        df.select(F.col(col).alias("__v"))
        .select("__v", rows)
        .groupBy(
            F.col("row"), _cms_bucket(F.col("__v"), F.col("row"), width).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches of identical (depth, width): counters add."""
    return (
        a.union(b).groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate counts for each key: MIN over the key's buckets.

    ``keys`` is a small frame (one column ``col``); the probe explodes
    it by depth, joins the (broadcast) sketch on (row, bucket), and
    takes the min counter. Absent buckets count 0 via the left join.
    Output: ``(col, est_count bigint)``.
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    probes = (
        keys.select(F.col(col))
        .distinct()
        .select(F.col(col), rows)
        .withColumn("bucket", _cms_bucket(F.col(col), F.col("row"), width))
    )
    joined = probes.join(F.broadcast(sketch), on=["row", "bucket"], how="left")
    return (
        joined.groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
        .select(F.col(col), F.col("est_count").cast("long"))
    )


def cms_sql(
    table: str,
    col: str,
    keys_predicate: str,
    depth: int = 4,
    width: int = 256,
) -> str:
    """DuckDB twin of ``cms_estimate(cms_sketch(...), keys, ...)`` where
    the probed keys are ``SELECT DISTINCT col FROM table WHERE
    keys_predicate``."""
    bucket = (
        "CAST(CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||"
        f" CAST({col} AS VARCHAR)), 1, 15)) AS UBIGINT) % {width} AS INTEGER)"
    )
    return f"""
    WITH ex AS (
      SELECT {col}, r FROM {table},
        UNNEST(generate_series(0, {depth - 1})) AS u(r)),
    sk AS (
      SELECT r, {bucket} AS bucket, count(*) AS cnt
      FROM ex GROUP BY 1, 2),
    probe AS (
      SELECT {col}, r, {bucket} AS bucket
      FROM (SELECT DISTINCT {col} FROM {table} WHERE {keys_predicate}),
        UNNEST(generate_series(0, {depth - 1})) AS u(r))
    SELECT probe.{col},
           CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est_count
    FROM probe LEFT JOIN sk USING (r, bucket)
    GROUP BY 1
    """


def kmv_set_estimates(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    k: int = 256,
) -> DataFrame:
    """Set-operation estimates from two KMV sketches — the Theta-sketch
    algebra (Druid/DataSketches) on the KMV register set: A, B, A∪B
    and A∩B cardinalities, all computed from at most ``k`` hashes per
    side, never from the raw sets.

    - union: the k smallest of the combined registers are exactly what
      a fresh sketch of A∪B would hold — standard estimate.
    - intersection: theta = min(theta_A, theta_B) where theta_X is the
      sketch's k-th min hash (or the full hash space when the sketch
      is under capacity and therefore exact). Registers below theta
      present in BOTH sketches form a uniform sample of A∩B at rate
      theta/2^60, so |A∩B| ≈ |sample| * 2^60 / theta. Under-capacity
      sketches make the estimate exact.

    Everything after the two sketch builds operates on ≤ 2k register
    rows (broadcast-sized at any corpus scale); md5-derived registers
    make every estimate hash-identical in the DuckDB oracle.

    Output rows: (op ∈ 'A' | 'B' | 'UNION' | 'INTERSECT',
    est_distinct BIGINT, sample_size BIGINT, theta BIGINT).
    """
    ska = kmv_sketch(df_a, col, k).localCheckpoint(eager=False)
    skb = kmv_sketch(df_b, col, k).localCheckpoint(eager=False)

    def stats(sk, op):
        return sk.agg(
            F.count(F.lit(1)).alias("sketch_size"),
            F.max("h").alias("kth"),
        ).select(
            F.lit(op).alias("op"),
            "sketch_size",
            F.when(F.col("sketch_size") < k, F.lit(_M60))
            .otherwise(F.col("kth"))
            .alias("theta"),
            F.col("kth"),
        )

    sa, sb = stats(ska, "A"), stats(skb, "B")
    numer = float((k - 1) * _M60)

    def estimate(st):
        est = F.when(
            F.col("sketch_size") < k, F.col("sketch_size").cast("double")
        ).otherwise(
            F.lit(numer) / F.greatest(F.col("kth"), F.lit(1)).cast("double")
        )
        return st.select(
            "op",
            F.floor(est).cast("long").alias("est_distinct"),
            F.col("sketch_size").cast("long").alias("sample_size"),
            F.col("theta").cast("long").alias("theta"),
        )

    union_sk = ska.unionByName(skb).distinct().orderBy("h").limit(k)
    union_row = estimate(stats(union_sk, "UNION"))

    theta = (
        sa.select(F.col("theta").alias("ta"))
        .crossJoin(sb.select(F.col("theta").alias("tb")))
        .select(F.least("ta", "tb").alias("theta"))
    )
    inter_sample = (
        ska.join(skb, "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .groupBy("theta")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # theta group may be empty when no register collides: rebuild from
    # the theta scalar so INTERSECT always emits one row
    inter_row = (
        theta.join(inter_sample, "theta", "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .select(
            F.lit("INTERSECT").alias("op"),
            F.floor(
                F.col("c").cast("double")
                * F.lit(float(_M60))
                / F.col("theta").cast("double")
            ).cast("long").alias("est_distinct"),
            F.col("c").cast("long").alias("sample_size"),
            F.col("theta").cast("long").alias("theta"),
        )
    )
    return (
        estimate(sa)
        .unionByName(estimate(sb))
        .unionByName(union_row)
        .unionByName(inter_row)
    )


def kmv_trailing_rollup(
    df: DataFrame,
    bucket_col: str,
    col: str,
    k: int = 256,
    trailing: int = 4,
) -> DataFrame:
    """Sliding distinct-count over time buckets from per-bucket KMV
    sketches — "distinct users over the trailing hour, every 15
    minutes" without ever holding a distinct set per window: each
    bucket keeps its k smallest registers ONCE, every register
    contributes to the ``trailing`` windows ending at or after its
    bucket (an explode of k·trailing rows per bucket, independent of
    data volume), and each window's k smallest merged registers yield
    the estimate. Lossless merge: the k smallest of a union are each
    among the k smallest of their own bucket.

    Windows are emitted only for buckets present in the data; a
    window's trailing range covers buckets (b-trailing+1 .. b) that
    exist. Output per bucket: (bucket, est_distinct, sketch_size,
    kth_min_hash) — under-capacity windows are exact, like every KMV
    estimate here.
    """
    from pyspark.sql.window import Window

    hs = df.select(
        F.col(bucket_col).cast("long").alias("b"),
        hash60(F.col(col)).alias("h"),
    ).distinct()
    w = Window.partitionBy("b").orderBy("h")
    # lazy barrier: sk feeds both the contribution explode and the
    # valid-bucket set; without it each branch re-runs the full-data
    # distinct
    sk = (
        hs.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
        .localCheckpoint(eager=False)
    )
    contrib = sk.select(
        F.explode(
            F.sequence(F.col("b"), F.col("b") + F.lit(trailing - 1))
        ).alias("bucket"),
        "h",
    )
    # every bucket present in the data keeps >= 1 register in sk, so
    # the bounded sk frame carries the exact bucket set — no second
    # full-data scan
    valid = sk.select(F.col("b").alias("bucket")).distinct()
    cand = contrib.join(F.broadcast(valid), "bucket").distinct()
    w2 = Window.partitionBy("bucket").orderBy("h")
    merged = (
        cand.withColumn("__r", F.row_number().over(w2))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )
    per = merged.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("sketch_size"),
        F.max("h").alias("kth_min_hash"),
    )
    numer = float((k - 1) * _M60)
    est = F.when(
        F.col("sketch_size") < k, F.col("sketch_size").cast("double")
    ).otherwise(
        F.lit(numer) / F.greatest(F.col("kth_min_hash"), F.lit(1)).cast("double")
    )
    return per.select(
        "bucket",
        F.floor(est).cast("long").alias("est_distinct"),
        F.col("sketch_size").cast("long").alias("sketch_size"),
        F.col("kth_min_hash").cast("long").alias("kth_min_hash"),
    )

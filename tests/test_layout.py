"""Storage-layout operators: compaction and Z-order clustering."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from fugue_warehouses_spark.operators.layout import compact, zorder_write


def _parquet_files(path):
    return [f for f in glob.glob(os.path.join(path, "*.parquet")) if os.path.isfile(f)]


def test_compact_merges_small_files(spark, tmp_path):
    path = str(tmp_path / "fragmented")
    spark.range(0, 10_000).repartition(50).write.parquet(path)
    assert len(_parquet_files(path)) == 50
    before = spark.read.parquet(path).agg(
        F.count(F.lit(1)), F.sum("id")
    ).collect()[0]
    n = compact(spark, path, target_file_mb=512)
    assert n == 1 and len(_parquet_files(path)) == 1
    after = spark.read.parquet(path).agg(
        F.count(F.lit(1)), F.sum("id")
    ).collect()[0]
    assert tuple(before) == tuple(after)


def _per_file_ranges(path, col):
    """(min, max) per parquet file from footer stats, no data read."""
    out = []
    for f in _parquet_files(path):
        md = pq.ParquetFile(f).metadata
        idx = _col_idx(md, col)
        stats = [md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)]
        out.append((min(s.min for s in stats), max(s.max for s in stats)))
    return out


def _col_idx(md, name):
    names = [md.schema.column(i).name for i in range(len(md.schema))]
    return names.index(name)


def test_zorder_clusters_both_columns(spark, tmp_path):
    """Footer min-max ranges of BOTH z-ordered columns are narrow in
    every file — the property min-max pruning needs. A plain sort
    clusters only its leading column."""
    df = spark.range(0, 20_000).select(
        (F.col("id") % 141).cast("double").alias("x"),
        ((F.col("id") * 7919) % 149).cast("double").alias("y"),
    )
    zpath = str(tmp_path / "zordered")
    zorder_write(df, zpath, ["x", "y"], num_files=16)
    assert spark.read.parquet(zpath).count() == 20_000

    # contrast layout: sorted by x only
    spath = str(tmp_path / "xsorted")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    def avg_range(path, col, span):
        rs = [(hi - lo) / span for lo, hi in _per_file_ranges(path, col)]
        return sum(rs) / len(rs)

    # z-order: both dimensions clustered well below the full span
    assert avg_range(zpath, "x", 141.0) < 0.5
    assert avg_range(zpath, "y", 149.0) < 0.5
    # x-sort clusters x tightly but leaves y unclustered (~full span)
    assert avg_range(spath, "x", 141.0) < 0.2
    assert avg_range(spath, "y", 149.0) > 0.8


def test_zvalue_validates_inputs(spark):
    import pytest

    from fugue_warehouses_spark.operators.layout import zvalue

    with pytest.raises(ValueError, match="same nonzero length"):
        zvalue(["a"], [0.0], [1.0, 2.0])
    with pytest.raises(ValueError, match="max must exceed min"):
        zvalue(["a"], [1.0], [1.0])


def test_export_shards_writes_and_manifests(spark, tmp_path):
    from fugue_warehouses_spark.operators.layout import (
        export_shards,
        shard_assignment,
        shard_manifest,
    )

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "shards")
    manifest = export_shards(df, path, "doc_id", n_shards=8).collect()
    # one directory per shard, all shards present, counts sum to input
    dirs = sorted(
        d for d in os.listdir(path) if d.startswith("shard=")
    )
    assert len(dirs) == 8
    assert sum(r["n_rows"] for r in manifest) == 1000
    # the manifest read back from disk equals the pre-write assignment
    pre = sorted(
        tuple(r)
        for r in shard_manifest(
            shard_assignment(df, "doc_id", 8), "doc_id"
        ).collect()
    )
    assert sorted(tuple(r) for r in manifest) == pre
    # re-export is byte-stable: same assignment, same checksums
    again = export_shards(df, str(tmp_path / "shards2"), "doc_id", 8).collect()
    assert sorted(tuple(r) for r in again) == pre


def test_shard_assignment_deterministic_and_partition_free(spark):
    from fugue_warehouses_spark.operators.layout import shard_assignment

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    a = {r["k"]: r["shard"] for r in shard_assignment(df, "k", 4).collect()}
    b = {
        r["k"]: r["shard"]
        for r in shard_assignment(df.repartition(13), "k", 4).collect()
    }
    assert a == b
    assert set(a.values()) == {0, 1, 2, 3}


def test_token_balanced_shards(spark):
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.operators.layout import token_balanced_shards

    # heavy-tailed weights: a hash-mod split would be badly unbalanced
    rows = [(i, 1 if i % 50 else 500) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    planned = token_balanced_shards(df, "doc_id", "w", 4)
    got = planned.collect()
    assert len(got) == 300 and {r["shard"] for r in got} == {0, 1, 2, 3}
    total = sum(w for _, w in rows)
    max_w = max(w for _, w in rows)
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard"], 0)
        by_shard[r["shard"]] += r["w"]
    # classic prefix-sum partitioning bound
    assert all(v <= total / 4 + max_w for v in by_shard.values())
    # contiguous in the draw order: shard is monotone along the order
    draw = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    ordered = [
        r["shard"]
        for r in planned.withColumn("__d", draw)
        .orderBy("__d", "doc_id")
        .collect()
    ]
    assert ordered == sorted(ordered)
    # deterministic under physical re-partitioning
    again = {
        r["doc_id"]: r["shard"]
        for r in token_balanced_shards(
            df.repartition(13), "doc_id", "w", 4
        ).collect()
    }
    assert again == {r["doc_id"]: r["shard"] for r in got}
    # degenerate inputs: one shard; all-zero weights
    assert {
        r["shard"] for r in token_balanced_shards(df, "doc_id", "w", 1).collect()
    } == {0}
    z = df.withColumn("w", F.lit(0))
    assert {
        r["shard"] for r in token_balanced_shards(z, "doc_id", "w", 4).collect()
    } == {0}


def test_export_tar_shards_roundtrip_and_reproducible(spark, sf_dir, tmp_path):
    import tarfile

    from fugue_warehouses_spark.operators.layout import export_tar_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    m1 = {r["shard"]: r for r in export_tar_shards(
        docs, d1, "doc_id", "text", n_shards=4).collect()}
    # re-export of identical data is BYTE-identical per shard
    m2 = {r["shard"]: r for r in export_tar_shards(
        docs.repartition(7), d2, "doc_id", "text", n_shards=4).collect()}
    assert set(m1) == set(m2) == {0, 1, 2, 3}
    for s in m1:
        assert m1[s]["tar_md5"] == m2[s]["tar_md5"], "reproducible shards"
    # round-trip: every document comes back intact from the tars
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    seen = {}
    total_members = 0
    for s in m1:
        with tarfile.open(f"{d1}/shard-{s:05d}.tar") as tar:
            names = tar.getnames()
            # members are id-ordered within the shard
            assert names == sorted(names, key=lambda n: int(n.split(".")[0]))
            for mem in tar.getmembers():
                doc_id = int(mem.name.split(".")[0])
                seen[doc_id] = tar.extractfile(mem).read().decode("utf-8")
                total_members += 1
    assert total_members == len(texts)
    assert seen == texts
    # manifest accounting matches reality
    assert sum(r["n_members"] for r in m1.values()) == len(texts)


def test_export_tar_shards_rejects_null_ids(spark, tmp_path):
    import pytest

    from fugue_warehouses_spark.operators.layout import export_tar_shards

    df = spark.createDataFrame([(None, "x"), (1, "y")], "doc_id long, text string")
    with pytest.raises(Exception, match="NULL doc_id"):
        export_tar_shards(df, str(tmp_path / "w"), "doc_id", "text", 2).collect()

"""Streaming embedding-dedup ingest + reconciliation
(streaming/embedding.py): greedy stream == batch semantics closure,
one-representative guarantee, rolling-IVF identity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fugue_warehouses_spark.streaming import (
    read_parquet_stream,
    reconcile_embedding_survivors,
    run_embedding_dedup_ingest,
)


def _vec(rng, dim=16):
    v = rng.normal(size=dim)
    return [float(x) for x in v / np.linalg.norm(v)]


def _near(v, rng, eps=0.05):
    w = np.asarray(v) + rng.normal(scale=eps, size=len(v))
    return [float(x) for x in w / np.linalg.norm(w)]


def _corpus(spark, seed=5):
    """Duplicate classes {1,2,3} (transitive CHAIN: 1~3, 2~3, 1!~2 at
    threshold 0.9 — built deterministically as a ± d*u around vector
    3 with u ⟂ a, so cos(1,3)=cos(2,3)=1/sqrt(1+d^2)=0.944 and
    cos(1,2)=(1-d^2)/(1+d^2)=0.782), cliques {10,11}, {20,21};
    singletons 30..33 (random 16-dim unit cosines ~0)."""
    rng = np.random.default_rng(seed)
    a = np.asarray(_vec(rng))
    u = rng.normal(size=len(a))
    u -= np.dot(u, a) * a
    u /= np.linalg.norm(u)
    d = 0.35
    v1 = (a + d * u) / np.linalg.norm(a + d * u)
    v2 = (a - d * u) / np.linalg.norm(a - d * u)
    rows = [
        (1, [float(x) for x in v1]),
        (2, [float(x) for x in v2]),
        (3, [float(x) for x in a]),
    ]
    for base_id in (10, 20):
        v = _vec(rng)
        rows += [(base_id, v), (base_id + 1, _near(v, rng, 0.02))]
    rows += [(30 + i, _vec(rng)) for i in range(4)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _batch_cc_kept(docs, threshold):
    from fugue_warehouses_spark.extensions.dedup import dedup_near
    from fugue_warehouses_spark.extensions.similarity import similarity_pairs

    pairs = similarity_pairs(docs, threshold, "vec_id", "embedding", 6)
    return {r["vec_id"] for r in dedup_near(docs, pairs, "vec_id").collect()}


def test_embedding_ingest_stream_equals_batch_after_reconcile(spark, tmp_path):
    """Greedy streaming + offline reconcile == batch CC EXACTLY when
    min ids arrive first (the text pipeline's property, embedding
    twin). The chain {1,2,3} is split across micro-batches so
    cross-batch greedy drops are exercised."""
    docs = _corpus(spark)
    thr = 0.9
    cc_kept = _batch_cc_kept(docs, thr)

    feed = str(tmp_path / "feed")
    b0 = {1, 10, 30, 31}
    docs.filter(F.col("vec_id").isin(*b0)).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    docs.filter(~F.col("vec_id").isin(*b0)).coalesce(1).write.mode(
        "append"
    ).parquet(feed)

    greedy = run_embedding_dedup_ingest(
        read_parquet_stream(spark, feed, max_files_per_trigger=1),
        index_store=str(tmp_path / "idx"),
        survivors_path=str(tmp_path / "kept"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        dropped_store=str(tmp_path / "dropped"),
        threshold=thr,
    )
    greedy_kept = {r["vec_id"] for r in greedy.collect()}
    assert cc_kept <= greedy_kept  # greedy only over-keeps

    over = {
        r["vec_id"]
        for r in reconcile_embedding_survivors(
            spark, str(tmp_path / "idx"), str(tmp_path / "dropped"),
            threshold=thr,
        ).collect()
    }
    assert over <= greedy_kept
    assert greedy_kept - over == cc_kept

    # index-only reconcile (no drop log): survivors are pairwise clean
    assert (
        reconcile_embedding_survivors(
            spark, str(tmp_path / "idx"), threshold=thr
        ).count()
        == 0
    )


def test_embedding_reconcile_never_over_drops_late_min(spark, tmp_path):
    """A duplicate class whose MIN id arrives after a larger-id
    neighbor keeps its (sole) survivor — the one-representative
    guarantee is unconditional (same fix as the text reconcile,
    round 7, shipped here from day one)."""
    docs = _corpus(spark)
    thr = 0.9
    feed = str(tmp_path / "feed")
    # larger ids of classes {10,11} and {20,21} arrive FIRST
    b0 = {11, 21, 30}
    docs.filter(F.col("vec_id").isin(*b0)).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    docs.filter(~F.col("vec_id").isin(*b0)).coalesce(1).write.mode(
        "append"
    ).parquet(feed)

    greedy = run_embedding_dedup_ingest(
        read_parquet_stream(spark, feed, max_files_per_trigger=1),
        index_store=str(tmp_path / "idx"),
        survivors_path=str(tmp_path / "kept"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        dropped_store=str(tmp_path / "dropped"),
        threshold=thr,
    )
    greedy_kept = {r["vec_id"] for r in greedy.collect()}
    assert 11 in greedy_kept and 10 not in greedy_kept
    assert 21 in greedy_kept and 20 not in greedy_kept

    over = {
        r["vec_id"]
        for r in reconcile_embedding_survivors(
            spark, str(tmp_path / "idx"), str(tmp_path / "dropped"),
            threshold=thr,
        ).collect()
    }
    kept = greedy_kept - over
    # every duplicate class retains exactly one representative
    assert 11 in kept and 21 in kept
    assert len({1, 2, 3} & kept) == 1
    assert {30, 31, 32, 33} <= kept


def test_embedding_ingest_rolling_ivf_full_probe_identity(spark, tmp_path):
    """centroids_store + full probe (n_probe=None) must answer
    IDENTICALLY to the exact path — bucketing without pruning is the
    index-consistency guarantee, streaming edition."""
    docs = _corpus(spark, seed=9)
    thr = 0.9
    feed = str(tmp_path / "feed")
    b0 = {1, 10, 30, 31}
    docs.filter(F.col("vec_id").isin(*b0)).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    docs.filter(~F.col("vec_id").isin(*b0)).coalesce(1).write.mode(
        "append"
    ).parquet(feed)

    exact = run_embedding_dedup_ingest(
        read_parquet_stream(spark, feed, max_files_per_trigger=1),
        index_store=str(tmp_path / "idx_e"),
        survivors_path=str(tmp_path / "kept_e"),
        checkpoint_dir=str(tmp_path / "ckpt_e"),
        threshold=thr,
    )
    ivf = run_embedding_dedup_ingest(
        read_parquet_stream(spark, feed, max_files_per_trigger=1),
        index_store=str(tmp_path / "idx_i"),
        survivors_path=str(tmp_path / "kept_i"),
        checkpoint_dir=str(tmp_path / "ckpt_i"),
        threshold=thr,
        centroids_store=str(tmp_path / "cents"),
        n_centroids=3,
    )
    assert {r["vec_id"] for r in exact.collect()} == {
        r["vec_id"] for r in ivf.collect()
    }
    # the stored index carries the inverted-list cidx column
    from fugue_warehouses_spark.plans import versioned as V

    idx = V.read_all_versions(spark, str(tmp_path / "idx_i"))
    assert "cidx" in idx.columns


def test_embedding_ingest_crash_before_index_never_loses_survivors(
    spark, tmp_path, monkeypatch
):
    """Crash-window delivery (round-8 ADVICE fix): survivors are
    appended BEFORE the index version, so a crash between the two
    writes re-delivers the batch on replay (duplicate survivor files,
    deduped on read) instead of the round-7 zero-times hole (rows
    indexed but never appended self-suppressed on replay)."""
    from fugue_warehouses_spark.plans import versioned as V

    docs = _corpus(spark)
    thr = 0.9
    feed = str(tmp_path / "feed")
    docs.coalesce(1).write.mode("append").parquet(feed)
    idx_store = str(tmp_path / "idx")
    kept_path = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")

    real_write = V.write_version
    calls = {"n": 0}

    def crashing_write(df, store, sp):
        if store == idx_store and calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("simulated crash after survivors append")
        return real_write(df, store, sp)

    monkeypatch.setattr(V, "write_version", crashing_write)
    with pytest.raises(Exception, match="simulated crash|STREAM"):
        run_embedding_dedup_ingest(
            read_parquet_stream(spark, feed),
            index_store=idx_store,
            survivors_path=kept_path,
            checkpoint_dir=ckpt,
            threshold=thr,
        )
    # survivors were appended before the crash; the index version was not
    assert spark.read.parquet(kept_path).count() > 0
    with pytest.raises(FileNotFoundError):
        V.read_all_versions(spark, idx_store)

    # recovery: rerun with the SAME checkpoint — the uncommitted batch
    # replays, re-survives (nothing indexed to suppress it), re-appends
    monkeypatch.setattr(V, "write_version", real_write)
    out = run_embedding_dedup_ingest(
        read_parquet_stream(spark, feed),
        index_store=idx_store,
        survivors_path=kept_path,
        checkpoint_dir=ckpt,
        threshold=thr,
    )
    kept = [r["vec_id"] for r in out.collect()]
    # exactly-once presentation: every survivor exactly once, none lost
    assert sorted(kept) == sorted(set(kept))
    assert set(kept) == _batch_cc_kept(docs, thr)
    # ... while the files really did record the at-least-once replay
    assert spark.read.parquet(kept_path).count() == 2 * len(kept)


def test_embedding_ingest_empty_stream(spark, tmp_path):
    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    ).coalesce(1).write.parquet(feed)
    out = run_embedding_dedup_ingest(
        read_parquet_stream(spark, feed),
        index_store=str(tmp_path / "idx"),
        survivors_path=str(tmp_path / "kept"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert out.count() == 0

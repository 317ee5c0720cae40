"""Cross-process re-open of persisted serving handles (round 10,
VERDICT r9 #5).

The _serving_handle contract's per-process tempdir made the versioned
store durable in name only: every new process rebuilt the index from
the corpus. The actual 100 TB serving story is build-once /
re-open-everywhere — a serving process re-reads the stored tables
(index-sized) instead of re-scanning the corpus (corpus-sized). These
tests kill the in-process handle cache, forbid the corpus-side build
functions outright, and require the re-opened handle to answer
byte-identically with zero new store versions.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fugue_warehouses_spark import queries as Q
from fugue_warehouses_spark.extensions import similarity as SS
from fugue_warehouses_spark.extensions import dedup as DD
from fugue_warehouses_spark.plans import versioned as V


def _facet_rows(spark, sf_dir, store):
    idx = Q._ivf_index_for(spark, sf_dir, store=store)
    emb = Q._t(spark, sf_dir, "embeddings")
    out = SS.ivf_topk_from_index(
        idx["assigned"],
        idx["centroids"],
        emb.filter(F.col("vec_id") < 10),
        k=10,
        n_probe=8,
        centroid_rows=idx["centroid_rows"],
    )
    return sorted(map(tuple, out.collect()))


def test_ivf_handle_reopens_from_durable_store_without_rebuild(
    spark, sf_dir, tmp_path
):
    store = str(tmp_path / "ivf_store")
    first = _facet_rows(spark, sf_dir, store)
    assert first, "facet produced no rows"
    assert os.path.exists(os.path.join(store, "_HANDLE_COMPLETE"))
    versions_before = {
        name: V.list_versions(spark, os.path.join(store, name))
        for name in ("assigned", "centroids")
    }
    assert all(versions_before.values())

    # "new process": the handle cache is gone; the build path is not
    # merely unused but FORBIDDEN — a re-open that touches the corpus
    # fails the test, not just the stopwatch
    Q._SERVING_HANDLES.clear()
    real_build = SS.build_ivf_hash_index

    def forbidden(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("re-open must not rebuild the IVF index")

    SS.build_ivf_hash_index = forbidden
    try:
        second = _facet_rows(spark, sf_dir, store)
    finally:
        SS.build_ivf_hash_index = real_build

    assert second == first
    versions_after = {
        name: V.list_versions(spark, os.path.join(store, name))
        for name in ("assigned", "centroids")
    }
    assert versions_after == versions_before, "re-open wrote new versions"


def test_half_built_store_rebuilds_instead_of_serving_garbage(
    spark, sf_dir, tmp_path
):
    """A store missing the completion marker (crash between the last
    table write and the marker commit) must take the build path — the
    shadowed extra versions are the crash-safety cost, a partial
    re-open would be silent wrong answers."""
    store = str(tmp_path / "ivf_store")
    first = _facet_rows(spark, sf_dir, store)
    Q._SERVING_HANDLES.clear()
    os.remove(os.path.join(store, "_HANDLE_COMPLETE"))
    second = _facet_rows(spark, sf_dir, store)
    assert second == first
    # the rebuild wrote a NEW assigned version (shadowing, not reuse)
    assert len(V.list_versions(spark, os.path.join(store, "assigned"))) == 2


def test_minhash_handle_reopens_without_rereading_history(
    spark, sf_dir, tmp_path
):
    store = str(tmp_path / "mh_store")
    docs = Q._t(spark, sf_dir, "documents")

    def probe():
        h = Q._minhash_index_for(spark, sf_dir, store=store)
        pairs = DD.near_dup_pairs_against_index(
            docs.filter(F.col("doc_id") % 5 == 4),
            h["idx"],
            "doc_id",
            "text",
            threshold=0.6,
            index_bands_df=h["bands"],
        )
        return sorted(
            (r["id_new"], r["id_match"], round(r["jaccard_sim"], 6))
            for r in pairs.collect()
        )

    first = probe()
    Q._SERVING_HANDLES.clear()
    real = DD.build_minhash_index

    def forbidden(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("re-open must not re-sign history text")

    DD.build_minhash_index = forbidden
    try:
        second = probe()
    finally:
        DD.build_minhash_index = real
    assert second == first


def test_bloom_handle_reopens_without_rehashing_history(
    spark, sf_dir, tmp_path
):
    store = str(tmp_path / "bloom_store")
    docs = Q._t(spark, sf_dir, "documents")

    def probe():
        h = Q._bloom_handle_for(spark, sf_dir, store=store)
        out = DD.incremental_dedup_bloom(
            docs.filter(F.col("doc_id") >= h["thr"]),
            docs.filter(F.col("doc_id") < h["thr"]),
            m_bits=1 << 20,
            k=5,
            bloom_df=h["bloom"],
            history_fp_df=h["fps"],
        )
        return sorted(r["doc_id"] for r in out.select("doc_id").collect())

    first = probe()
    assert first
    Q._SERVING_HANDLES.clear()
    real = DD.fingerprint_bloom

    def forbidden(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("re-open must not rebuild the Bloom bitset")

    DD.fingerprint_bloom = forbidden
    try:
        second = probe()
    finally:
        DD.fingerprint_bloom = real
    assert second == first


def test_bloom_reopen_keeps_the_build_time_threshold(
    spark, sf_dir, tmp_path
):
    """The split threshold is part of the stored state (round-10
    review): the bitset and fp table only cover doc_id below the
    AT-BUILD-TIME threshold. A re-open on a since-grown corpus must
    read the stored thr back, not re-derive it — docs between the two
    thresholds would otherwise be treated as covered history the
    bitset never saw (silent under-dedup)."""
    store = str(tmp_path / "bloom_store")
    h = Q._bloom_handle_for(spark, sf_dir, store=store)
    thr_build = h["thr"]
    Q._SERVING_HANDLES.clear()
    real = Q._doc_split_thr
    # simulate corpus growth: the live derivation now returns more
    Q._doc_split_thr = lambda *a, **k: thr_build + 1000
    try:
        h2 = Q._bloom_handle_for(spark, sf_dir, store=store)
    finally:
        Q._doc_split_thr = real
    assert h2["thr"] == thr_build


def test_non_local_store_uri_is_refused(spark, sf_dir):
    """Round-10 ADVICE: the handle's completion marker (and sidecars
    like thr.json) are driver-local os.path IO while the tables go
    through Hadoop writers. A non-local store URI would silently
    rebuild every process (marker never seen) or fail opaquely inside
    open() — refuse it loudly instead."""
    import pytest

    for bad in ("hdfs://nn/warehouse/idx", "s3a://bucket/idx"):
        with pytest.raises(ValueError, match="local filesystem"):
            Q._serving_handle(
                spark, "minhash_idx", sf_dir,
                build=lambda store_dir: (_ for _ in ()).throw(
                    AssertionError("build must not run")
                ),
                store=bad,
            )


def test_concurrent_build_lock_refuses_second_builder(
    spark, sf_dir, tmp_path
):
    """Round-10 ADVICE: two processes building the same store would
    interleave table versions with unverified cross-table pairing.
    The exclusive-create _BUILD_LOCK makes the second builder fail
    with instructions instead of double-building — and a successful
    build removes the lock so later processes re-open normally."""
    import pytest

    store = str(tmp_path / "locked_store")
    os.makedirs(store)
    with open(os.path.join(store, "_BUILD_LOCK"), "w") as f:
        f.write("other:999")
    with pytest.raises(RuntimeError, match="_BUILD_LOCK"):
        Q._serving_handle(
            spark, "minhash_idx", sf_dir,
            build=lambda store_dir: (_ for _ in ()).throw(
                AssertionError("build must not run under a held lock")
            ),
            store=store,
        )
    os.unlink(os.path.join(store, "_BUILD_LOCK"))
    Q._SERVING_HANDLES.clear()
    h = Q._minhash_index_for(spark, sf_dir, store=store)
    assert h["idx"] is not None
    assert os.path.exists(os.path.join(store, "_HANDLE_COMPLETE"))
    assert not os.path.exists(os.path.join(store, "_BUILD_LOCK"))

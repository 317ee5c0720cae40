"""Streaming SEMANTIC (embedding-cosine) dedup ingest + offline
reconciliation — the embedding twin of :mod:`streaming.dedup`'s
MinHash pipeline, completing the streaming leg of the family symmetry
(text and embeddings each get batch / incremental / index-served /
STREAMING shapes; the reference has no streaming at all — see the
package docstring and reference fugue_bigquery/client.py:243-271 for
its batch-only scan surface).

Shape per micro-batch (foreachBatch — the match set derives from the
stream itself, the same no-watermark-can-bound-it argument as the text
ingest):

1. read the accepted corpus's vectors from the versioned delta-log
   store (append-only: each version is one batch's survivors, so
   per-batch writes stay batch-sized);
2. probe: EXACT streaming-BLAS max-cosine of the batch against the
   stored vectors (:func:`extensions.similarity.max_cosine_against`
   via :func:`incremental_embedding_dedup` — no shuffle before the
   narrow hit set), or IVF existence probe when a ``centroids_store``
   is maintained (see below);
3. within-batch resolution: exact pair graph -> connected components
   -> keep min id (driver-local union-find under the FLOP budget,
   distributed above it — same gate as the batch operator);
4. survivors append to ``survivors_path``; their (id, vector) rows
   fold into a new index version; dropped rows' vectors optionally
   land in ``dropped_store`` (the drop log reconciliation needs).

Greedy-vs-batch semantics are the same as the text ingest: within a
batch both members of a near pair can't survive; across batches the
index match drops the LATER vector. Greedy therefore over-keeps only
on classes whose edges run through dropped vectors;
:func:`reconcile_embedding_survivors` recomputes the exact pair graph
from STORED vectors alone and returns the over-kept ids under the
one-representative guarantee (over-kept = survivors that are not the
minimum SURVIVOR of their component — unconditional under any
arrival order; see streaming/dedup.py's round-7 note).

Rolling IVF option: pass ``centroids_store`` to maintain a persisted
IVF geometry — the FIRST batch samples centroids from itself and
writes them once; every batch then probes only its queries' top
``n_probe`` cells of the stored ASSIGNED vectors (cell-grouped BLAS,
inverted-list layout) and new survivors are appended already
cell-assigned. n_probe < n_centroids trades exactness for
probe-proportional cost with the documented one-sided error: a missed
neighbor OVER-KEEPS (the vector still enters the corpus), never
over-drops, and reconciliation recovers it offline.

Delivery is at-least-once, and the per-batch write ORDER makes that
true across crash windows: survivors append FIRST, then the index
version, then the drop log. A crash after the survivors append but
before the index version leaves the rows un-indexed, so the replayed
batch re-survives and re-appends — duplicate survivor rows (deduped
on id at read; the returned frame is already deduped), never lost
rows. A crash after the index version self-suppresses the replay
(cosine 1.0 against its own copies), and the survivors are already
durable. The inverse order (index first — the round-7 shape) had a
zero-times-delivery hole: rows indexed but not yet appended
self-suppressed on replay and never reached survivors_path (round-8
ADVICE fix; regression test at tests/test_streaming_embedding.py). With
``dropped_store`` set a replay may re-log its rows as dropped;
reconcile dedups ids on read and keys survivorship off the INDEX, so
a survivor id in the drop log is verify noise, never a correctness
error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def run_embedding_dedup_ingest(
    stream_df: DataFrame,
    index_store: str,
    survivors_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    round_digits: int | None = 6,
    timeout_sec: int = 300,
    compact_every: int | None = None,
    dropped_store: str | None = None,
    centroids_store: str | None = None,
    n_centroids: int | None = None,
    n_probe: int | None = None,
) -> DataFrame:
    """Drain an embedding stream with rolling semantic dedup (see
    module docstring); returns the survivors table as a batch frame
    (empty, with the stream's schema, if nothing ever arrived).

    The index store holds (id, vector) rows — with ``centroids_store``
    set, (id, vector, cidx) rows in inverted-list order. Globally
    unique ids are the caller's contract (the probe excludes identical
    ids, so a duplicated id would mask its own true duplicate).
    """
    from fugue_warehouses_spark.extensions.similarity import (
        build_ivf_hash_index,
        incremental_embedding_dedup,
    )
    from fugue_warehouses_spark.plans import versioned as V

    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # per-batch localCheckpoint blocks are garbage once the batch's
        # writes commit; scope them so the long-lived stream JVM never
        # accumulates block state across micro-batches (round-9 fix,
        # same leak as the text ingest — see streaming/dedup.py)
        from fugue_warehouses_spark.plans.checkpoint import released_after

        with released_after(spark):
            _apply_inner(batch_df)

    def _apply_inner(batch_df: DataFrame) -> None:
        batch_df = batch_df.localCheckpoint()
        if batch_df.isEmpty():
            return
        try:
            idx = V.read_all_versions(spark, index_store)
        except FileNotFoundError:
            idx = None
        cents = None
        if centroids_store is not None:
            try:
                cents = V.read_version(spark, centroids_store)
            except FileNotFoundError:
                # first batch: sample the geometry once, from the only
                # vectors that exist yet
                _, cents = build_ivf_hash_index(
                    batch_df.select(
                        F.col(id_col), F.col(vec_col)
                    ),
                    n_centroids,
                    corpus_id=id_col,
                    corpus_vec=vec_col,
                )
                V.write_version(cents, centroids_store, spark)
                cents = V.read_version(spark, centroids_store)
        if idx is None:
            # empty history: within-batch resolution only — an empty
            # typed history frame takes the exact probe path
            hist = spark.createDataFrame(
                [], batch_df.select(id_col, vec_col).schema
            )
            survivors = incremental_embedding_dedup(
                batch_df, hist, threshold=threshold, id_col=id_col,
                vec_col=vec_col, round_digits=round_digits,
            ).localCheckpoint()
        elif cents is not None:
            survivors = incremental_embedding_dedup(
                batch_df,
                assigned=idx.select(vec_col, "cidx"),
                centroids=cents,
                n_probe=n_probe,
                threshold=threshold, id_col=id_col, vec_col=vec_col,
                round_digits=round_digits,
            ).localCheckpoint()
        else:
            survivors = incremental_embedding_dedup(
                batch_df, idx.select(id_col, vec_col),
                threshold=threshold, id_col=id_col, vec_col=vec_col,
                round_digits=round_digits,
            ).localCheckpoint()
        # survivors append FIRST (module note: a crash before the index
        # version makes the replay re-survive and re-append — duplicate
        # rows, deduped on read; index-first inverted that into
        # zero-times delivery for the crash window)
        survivors.write.mode("append").parquet(survivors_path)
        # delivery-contract marker for raw-path readers (hidden to
        # parquet scans; idempotent)
        from fugue_warehouses_spark.streaming.io import (
            write_at_least_once_marker,
        )

        write_at_least_once_marker(spark, survivors_path)
        delta = survivors.select(id_col, vec_col)
        if cents is not None:
            from fugue_warehouses_spark.extensions.similarity import (
                _assign_to_centroids,
            )

            delta = _assign_to_centroids(delta, cents, id_col, vec_col)
        V.write_version(delta, index_store, spark)
        if (
            compact_every is not None
            and len(V.list_versions(spark, index_store)) >= compact_every
        ):
            V.compact_versions(spark, index_store)
        if dropped_store is not None:
            dropped = batch_df.join(
                survivors.select(id_col), id_col, "left_anti"
            ).select(id_col, vec_col)
            if not dropped.isEmpty():
                V.write_version(dropped, dropped_store, spark)
                if (
                    compact_every is not None
                    and len(V.list_versions(spark, dropped_store))
                    >= compact_every
                ):
                    V.compact_versions(spark, dropped_store)

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_sec)
        if not finished:
            raise TimeoutError(
                f"embedding-dedup ingest did not drain within "
                f"{timeout_sec}s — partial survivors are on disk; rerun "
                "with the same checkpoint_dir to continue"
            )
    finally:
        q.stop()
    try:
        # dedup on id: survivors-before-index ordering means a crash
        # replay can append the same row twice (at-least-once files,
        # exactly-once presentation); external consumers of the RAW
        # path materialize the same view with io.compact_survivors
        return spark.read.parquet(survivors_path).dropDuplicates([id_col])
    except AnalysisException:
        return spark.createDataFrame([], stream_df.schema)


def reconcile_embedding_survivors(
    spark,
    index_store: str,
    dropped_store: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    round_digits: int | None = 6,
    max_iter: int = 15,
) -> DataFrame:
    """Offline reconciliation of the greedy embedding ingest: returns
    the OVER-KEPT survivor ids. Deleting them from the survivors
    table leaves EXACTLY ONE representative per duplicate class — the
    minimum surviving id of its component (== the batch-CC survivor
    whenever each component's min id arrived before its neighbors; a
    late-arriving min was greedily dropped and its class keeps the
    min SURVIVOR instead — over-keeps relative to batch CC, NEVER
    over-drops). Runs entirely from storage: union the index and drop
    log (both (id, vector) delta-log stores), dedup ids (crash-replay
    defense), exact all-pairs cosine graph
    (:func:`extensions.similarity.similarity_pairs` — triangle-block
    distributed above the broadcast bound), connected components,
    per-component min among SURVIVORS. With no/empty drop log the
    survivor set is pairwise clean by the ingest guarantee and the
    result is correctly empty."""
    from fugue_warehouses_spark.extensions.dedup import (
        connected_components,
    )
    from fugue_warehouses_spark.extensions.similarity import (
        similarity_pairs,
    )
    from fugue_warehouses_spark.plans import versioned as V

    idx = V.read_all_versions(spark, index_store).select(id_col, vec_col)
    all_vecs = idx
    if dropped_store is not None:
        try:
            all_vecs = all_vecs.unionByName(
                V.read_all_versions(spark, dropped_store).select(
                    id_col, vec_col
                )
            )
        except FileNotFoundError:
            pass
    all_vecs = all_vecs.dropDuplicates([id_col])
    pairs = similarity_pairs(
        all_vecs, threshold, id_col, vec_col, round_digits
    ).select(F.col("id_a"), F.col("id_b"))
    comps = connected_components(pairs, max_iter)
    surv_comps = comps.join(
        idx.select(F.col(id_col).alias("id")), "id", "left_semi"
    )
    keep = surv_comps.groupBy("component").agg(F.min("id").alias("__keep"))
    return (
        surv_comps.join(keep, "component")
        .filter(F.col("id") != F.col("__keep"))
        .select(F.col("id").alias(id_col))
    )

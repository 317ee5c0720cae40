"""Streaming deduplication with bounded state.

The batch engine's exact dedup (extensions/dedup.py) is a hash groupBy;
unbounded streams need the watermarked variant so the state store can
evict: ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
until the watermark passes it, trading unbounded-history exactness for
bounded state — the standard choice for at-least-once ingest dedup
(e.g. replayed events with stable event_ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(
    df: DataFrame,
    subset: list[str],
    time_col: str,
    delay: str,
) -> DataFrame:
    """Drop rows whose ``subset`` key was already seen within the
    watermark horizon. Batch frames fall back to plain dropDuplicates
    (same result on bounded data, where 'history' is the whole input).
    """
    if not df.isStreaming:
        return df.dropDuplicates(subset)
    ntz = dict(df.dtypes).get(time_col) == "timestamp_ntz"
    if ntz:
        # watermarks need TIMESTAMP; UTC session TZ makes this lossless
        df = df.withColumn(time_col, F.col(time_col).cast("timestamp"))
    out = df.withWatermark(time_col, delay).dropDuplicatesWithinWatermark(subset)
    if ntz:
        out = out.withColumn(time_col, F.col(time_col).cast("timestamp_ntz"))
    return out


def incremental_ingest_dedup(
    stream_df: DataFrame,
    history_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    time_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Continuous-ingest content dedup as a STREAMING job: each
    arriving document is dropped if its normalized-text fingerprint
    (functions.text.fingerprint — the same 16-byte key the batch
    pipeline shuffles) is already in the static history table, or was
    already seen on the stream within the watermark horizon.

    The history side is a stream-static ``left_anti`` join — Spark
    re-plans the static side per micro-batch, so the history frame can
    point at the versioned fingerprint store and new versions are
    picked up without restarting the query. Within-stream dedup is
    ``dropDuplicatesWithinWatermark`` on the fingerprint: state holds
    one 16-byte key per unseen document within the horizon, evicted as
    the watermark passes — bounded regardless of stream length.

    On a batch frame this degrades to exactly
    ``extensions.dedup.incremental_dedup`` (min-id representative) —
    the batch twin the oracle checks.
    """
    from fugue_warehouses_spark.extensions.dedup import incremental_dedup
    from fugue_warehouses_spark.functions.text import fingerprint

    if not stream_df.isStreaming:
        return incremental_dedup(stream_df, history_df, text_col, id_col)
    seen = history_df.select(fingerprint(text_col).alias("__fp")).distinct()
    fresh = stream_df.withColumn("__fp", fingerprint(text_col)).join(
        seen, "__fp", "left_anti"
    )
    return dedup_within_watermark(fresh, ["__fp"], time_col, delay).drop(
        "__fp"
    )


def run_near_dedup_ingest(
    stream_df: DataFrame,
    index_store: str,
    survivors_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_hashes: int = 64,
    shingle: int = 5,
    bands: int = 8,
    max_bucket_size: int | None = None,
    update_index: bool = True,
    timeout_sec: int = 300,
) -> DataFrame:
    """Rolling-corpus NEAR-dedup ingest: drain a document stream where
    each micro-batch is near-deduped (MinHash-LSH) against the
    persisted signature index, survivors are appended to
    ``survivors_path``, and (by default) their signatures are folded
    into a NEW index version — so later batches dedup against
    everything that survived before them, across restarts.

    The streaming analog of the batch
    :func:`extensions.dedup.near_dup_pairs_against_index` loop, run
    through ``foreachBatch`` because the match set derives from the
    stream itself (a stream-stream anti-join shape no watermark can
    bound for arbitrary replays). Per micro-batch:

    1. read the LATEST complete index version (plans/versioned) — new
       versions written by this query or by an offline rebuild are
       picked up without restarting;
    2. ``near_dup_pairs_against_index`` flags batch docs that
       near-match the index or an earlier (smaller-id) doc of the same
       batch — only the batch pays signing cost, the index contributes
       stored signatures/grams;
    3. survivors (no pair) append to ``survivors_path``;
    4. ``update_index``: survivors' signatures union the current index
       into a new immutable version (atomic, snapshot-isolated).

    Resolution is GREEDY, not connected-component: any batch doc with a
    pair is dropped, even when its only neighbor was itself dropped —
    the streaming-friendly convention (CC over an unbounded stream is
    unbounded state; run the batch
    :func:`extensions.dedup.dedup_near` over a bounded corpus when CC
    semantics are required). Guarantee preserved: no two SURVIVORS are
    LSH-detectable near-dups of each other — within a batch both sides
    of a pair can't survive, and across batches the index match drops
    the later doc.

    Delivery is at-least-once on the survivors sink (checkpointed
    foreachBatch; a crash between append and index-write can replay a
    batch — replayed ids then match their own index copy and the
    in-plan disjointness guard fails the query loudly rather than
    silently double-appending; recover by vacuuming to the pre-crash
    version or re-keying the replay). Batch ids must be globally
    unique — the usual contract of ingest pipelines with stable doc
    ids. Returns the survivors table as a batch frame.

    Scale: per batch, one banding shuffle on (band, bucket) and one
    grams verify join — both batch-sized on the probe side; the index
    is never re-signed. Index versions grow by one parquet write per
    batch; vacuum(keep_last=...) bounds storage.
    """
    from fugue_warehouses_spark.extensions.dedup import (
        build_minhash_index,
        near_dup_pairs_against_index,
    )
    from fugue_warehouses_spark.plans import versioned as V

    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()
        if batch_df.rdd.isEmpty():
            return
        try:
            idx = V.read_version(spark, index_store).localCheckpoint(
                eager=False
            )
        except FileNotFoundError:
            idx = None
        if idx is None:
            # first batch, empty store: only within-batch near-dedup
            from fugue_warehouses_spark.extensions.dedup import (
                near_dup_pairs_minhash,
            )

            pairs = near_dup_pairs_minhash(
                batch_df, id_col, text_col, threshold, num_hashes,
                shingle, bands, max_bucket_size=max_bucket_size,
            ).select(F.col("id_b").alias("__dup"))
        else:
            pairs = near_dup_pairs_against_index(
                batch_df, idx, id_col, text_col, threshold, num_hashes,
                shingle, bands, max_bucket_size,
            ).select(F.col("id_new").alias("__dup"))
        survivors = batch_df.join(
            pairs.distinct(),
            batch_df[id_col] == F.col("__dup"),
            "left_anti",
        ).localCheckpoint()
        survivors.write.mode("append").parquet(survivors_path)
        if update_index:
            new_sigs = build_minhash_index(
                survivors, id_col, text_col, num_hashes, shingle
            )
            merged = (
                new_sigs if idx is None else idx.unionByName(new_sigs)
            )
            V.write_version(merged, index_store, spark)

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
    return spark.read.parquet(survivors_path)

"""Streaming audio featurization: stream == batch parity + restart
incrementality + exactly-once replay behavior of the file sink."""

from __future__ import annotations

import numpy as np
import pytest

from fugue_warehouses_spark.extensions import multimodal as MM
from fugue_warehouses_spark.extensions.wav import encode_wav
from fugue_warehouses_spark.streaming.audio import run_audio_feature_ingest

SCHEMA = "id long, payload binary"


def _clips(seed, ids):
    rng = np.random.default_rng(seed)
    return [
        (i, encode_wav(
            rng.integers(-32768, 32768, size=200 + 31 * i, dtype=np.int16),
            16000,
        ))
        for i in ids
    ]


def _drain(spark, src, dst, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_audio_feature_ingest(stream, dst, ckpt)
    q.awaitTermination(120)


def test_stream_matches_batch_and_restarts_incrementally(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "feats")
    ckpt = str(tmp_path / "ckpt")

    batch1 = _clips(1, range(0, 6))
    spark.createDataFrame(batch1, SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, dst, ckpt)

    got = {r.id: tuple(r) for r in spark.read.parquet(dst).collect()}
    exp = {
        r.id: tuple(r)
        for r in MM.audio_features(
            spark.createDataFrame(batch1, SCHEMA), "payload", "id",
            decode_stub=False,
        ).collect()
    }
    assert got == exp  # stream == batch, byte-identical

    # restart with the same checkpoint: only NEW files processed,
    # existing feature rows untouched
    batch2 = _clips(2, range(6, 9))
    spark.createDataFrame(batch2, SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, dst, ckpt)
    after = spark.read.parquet(dst)
    assert after.count() == 9
    assert after.select("id").distinct().count() == 9  # no replays

    # a third drain with nothing new appends nothing (sink log +
    # source offsets make replay a no-op)
    _drain(spark, src, dst, ckpt)
    assert spark.read.parquet(dst).count() == 9


def test_rejects_batch_frame(spark):
    df = spark.createDataFrame(_clips(3, range(2)), SCHEMA)
    with pytest.raises(ValueError, match="streaming"):
        run_audio_feature_ingest(df, "/tmp/x", "/tmp/y")

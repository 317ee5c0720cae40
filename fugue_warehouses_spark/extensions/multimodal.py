"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (SURVEY.md §2.E): image/audio/video as
``binary`` columns with a ``StructType`` metadata sibling (mime,
uri, width/height/duration/...), processed by Arrow-batched pandas
UDFs over ``mapInPandas``.

The decode/feature kernels depend on codec libraries (PIL/ffmpeg/...)
that are NOT in this container, so the kernel bodies default to
stubs: ``decode_stub=True`` produces deterministic fake features
derived from the payload bytes. With ``decode_stub=False`` the image
kernels now run a REAL decode→process→re-encode path for PNG
payloads via the stdlib-only codec in :mod:`extensions.png`
(decode, box-resample, encode — round 6), and the audio kernel
really decodes RIFF/WAV PCM via :mod:`extensions.wav` (round 11);
every other format still
raises ``NotImplementedError`` at the point its codec would run —
that boundary is honest, not a stub farm. The Spark-side plumbing —
schema, batch shape, partitioning, UDF signatures — is identical in
both modes.

Scale notes: payloads never pass through the driver; partition sizing
should target `spark.sql.files.maxPartitionBytes` chunks of payload
bytes, and feature extraction is embarrassingly parallel (mapInPandas,
no shuffle). Columnar parquet keeps metadata scans payload-free
(column pruning skips the binary column entirely unless selected).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_media_metadata(
    df: DataFrame,
    payload_col: str,
    mime: str,
    uri_col: str | None = None,
) -> DataFrame:
    """Add a typed ``meta`` struct next to a binary payload column."""
    meta = F.struct(
        F.lit(mime).alias("mime"),
        (F.col(uri_col) if uri_col else F.lit(None).cast("string")).alias("uri"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return df.withColumn("meta", meta)


def _fake_features(payload: bytes, n: int) -> list[float]:
    """Deterministic stand-in for a decode+embed kernel: n floats in
    [0,1) derived from the payload digest."""
    out: list[float] = []
    seed = payload or b""
    counter = 0
    while len(out) < n:
        h = hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        for i in range(0, 32, 4):
            out.append(int.from_bytes(h[i : i + 4], "big") / 2**32)
            if len(out) == n:
                break
        counter += 1
    return out


def extract_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    n_features: int = 16,
    decode_stub: bool = True,
) -> DataFrame:
    """binary payload -> array<double> feature vector via mapInPandas.

    Output schema: (id, features array<double>, n_bytes long). With
    ``decode_stub=False`` PNG payloads (extensions.png) and baseline
    JPEG payloads (extensions.jpeg, round 7) are REALLY decoded and
    featurized from pixels — dims + per-channel mean/std, normalized
    to [0,1], padded/truncated to ``n_features`` — while any other
    format raises ``NotImplementedError`` (its codec is genuinely
    absent here)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def _pixel_features(payload: bytes) -> list[float]:
        import numpy as np

        from fugue_warehouses_spark.extensions.png import decode_png

        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            px = decode_png(payload)
        elif payload[:2] == b"\xff\xd8":
            from fugue_warehouses_spark.extensions.jpeg import decode_jpeg

            px = decode_jpeg(payload)
            if px.ndim == 2:
                px = px[:, :, None]
        else:
            raise NotImplementedError(
                "real decode beyond PNG/JPEG requires codec libraries "
                "(PIL/ffmpeg) not present in this environment"
            )
        h, w, c = px.shape
        feats = [min(w, 4096) / 4096.0, min(h, 4096) / 4096.0, c / 4.0]
        flat = px.reshape(-1, c).astype(np.float64)
        for ch in range(c):
            feats.append(float(flat[:, ch].mean()) / 255.0)
            feats.append(float(flat[:, ch].std()) / 255.0)
        feats = feats[:n_features]
        return feats + [0.0] * (n_features - len(feats))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            kernel = (
                (lambda p: _fake_features(p, n_features))
                if decode_stub
                else _pixel_features
            )
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "features": [
                        kernel(bytes(p) if p is not None else b"")
                        for p in payloads
                    ],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def audio_features(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    frame_len: int = 160,
    decode_stub: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """binary audio payload -> integer acoustic aggregates per payload.

    Output schema (all exact integers so a SQL oracle can replay it):
    ``(id long, sample_rate int, n_samples long, n_frames long,
    sumsq long, zero_crossings long, peak int, max_frame_sumsq long,
    n_bytes long)``.

    ``decode_stub=False``: WAV/PCM payloads take the REAL pipeline —
    RIFF chunk-walk decode, channel mixdown, ``frame_len``-sample
    framing, vectorized integer features (:mod:`extensions.wav`,
    round 11) — any other container raises ``NotImplementedError``
    (mp3/flac/ogg codecs are genuinely absent here).
    ``decode_stub=True``: deterministic pseudo-aggregates derived from
    the payload digest (same convention as ``_fake_features``), so the
    plumbing is testable with no codec at all.

    ``on_error``: ``"raise"`` (default — deterministic pipelines and
    the oracle-checked facet) or ``"skip"`` — undecodable payloads
    (wrong container, truncated header, null) are DROPPED instead of
    failing the task. Skip is what an unattended ingest wants: one
    bad clip in a crawl batch must not wedge the stream (a failed
    task replays the same file forever under checkpointing). Rows
    needing quarantine rather than silence should be routed upstream
    by container sniff (``substring(payload, 1, 4) = X'52494646'`` is
    the WAV check, expressible in the stream itself).

    Scale shape: identical to ``extract_features`` — ``mapInPandas``
    over the payload column, embarrassingly parallel, payloads never
    shuffled or collected; outputs are 9 scalars per payload, so the
    frame after this is metadata-sized regardless of audio length.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("sumsq", T.LongType()),
            T.StructField("zero_crossings", T.LongType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("max_frame_sumsq", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def _real(payload: bytes) -> tuple[int, int, int, int, int, int, int]:
        from fugue_warehouses_spark.extensions.wav import (
            decode_wav,
            frame_features,
            mixdown,
        )

        if payload[:4] != b"RIFF":
            raise NotImplementedError(
                "real audio decode beyond WAV/PCM requires codec "
                "libraries absent in this environment"
            )
        samples, rate = decode_wav(payload)
        mono = mixdown(samples)
        ff = frame_features(mono, frame_len)
        return (
            int(rate),
            int(mono.size),
            int(ff["sumsq"].size),
            int(ff["sumsq"].sum()),
            int(ff["zero_crossings"].sum()),
            int(ff["peak"].max()) if ff["peak"].size else 0,
            int(ff["sumsq"].max()) if ff["sumsq"].size else 0,
        )

    def _stub(payload: bytes) -> tuple[int, int, int, int, int, int, int]:
        h = hashlib.sha256((payload or b"") + (0).to_bytes(4, "big")).digest()
        w = [int.from_bytes(h[i : i + 4], "big") for i in range(0, 28, 4)]
        n_samples = w[1] % 65536
        n_frames = -(-n_samples // frame_len) if n_samples else 0
        return (16000, n_samples, n_frames, w[2], w[3] % (n_samples + 1),
                w[4] % 32768, w[5])

    def _fast(pdf: pd.DataFrame) -> pd.DataFrame | None:
        """Batch-vectorized real path (round 11, guide §4.2): one
        reduceat sweep over the whole Arrow batch's concatenated mono
        PCM instead of ~10 numpy calls per 256–1024-sample payload
        (per-call overhead measured ~3 ms/payload on the audio
        facets). Applies when every decodable payload is mono 16-bit
        PCM — any stereo/8-bit payload returns None and the batch
        takes the per-payload kernel (output identical either way;
        property-pinned in tests/test_wav.py)."""
        import numpy as np

        from fugue_warehouses_spark.extensions.wav import (
            batch_frame_features,
            parse_wav_raw,
        )

        ids = pdf[id_col]
        n_rows = len(ids)
        raws: list[bytes] = []
        counts = np.zeros(n_rows, dtype=np.int64)
        rates = np.zeros(n_rows, dtype=np.int64)
        nbytes = np.zeros(n_rows, dtype=np.int64)
        keep = np.ones(n_rows, dtype=bool)
        for j, payload in enumerate(pdf[payload_col]):
            payload = bytes(payload) if payload is not None else b""
            nbytes[j] = len(payload)
            try:
                if payload[:4] != b"RIFF":
                    raise NotImplementedError(
                        "real audio decode beyond WAV/PCM requires codec "
                        "libraries absent in this environment"
                    )
                raw, ch, rate, bits = parse_wav_raw(payload)
            except (NotImplementedError, ValueError):
                if on_error == "skip":
                    keep[j] = False
                    continue
                raise
            if ch != 1 or bits != 16:
                return None  # mixdown/8-bit upconvert: per-payload path
            usable = len(raw) - len(raw) % 2
            raws.append(raw[:usable])
            counts[j] = usable // 2
            rates[j] = rate
        x = np.frombuffer(b"".join(raws), dtype="<i2").astype(np.int64)
        ff = batch_frame_features(x, counts, frame_len)
        nfr = ff["fcounts"]
        sumsq_t = np.zeros(n_rows, dtype=np.int64)
        zc_t = np.zeros(n_rows, dtype=np.int64)
        peak_m = np.zeros(n_rows, dtype=np.int64)
        mfs = np.zeros(n_rows, dtype=np.int64)
        nz = nfr > 0
        if nz.any():
            # empty payloads own no frames, so dropping their (equal)
            # offsets keeps the remaining reduceat segments contiguous
            offs_nz = ff["foffs"][nz]
            sumsq_t[nz] = np.add.reduceat(ff["sumsq"], offs_nz)
            zc_t[nz] = np.add.reduceat(ff["zero_crossings"], offs_nz)
            peak_m[nz] = np.maximum.reduceat(ff["peak"], offs_nz)
            mfs[nz] = np.maximum.reduceat(ff["sumsq"], offs_nz)
        out = pd.DataFrame(
            {
                "id": ids.astype("int64").to_numpy(),
                "sample_rate": rates,
                "n_samples": counts,
                "n_frames": nfr,
                "sumsq": sumsq_t,
                "zero_crossings": zc_t,
                "peak": peak_m,
                "max_frame_sumsq": mfs,
                "n_bytes": nbytes,
            }
        )
        return out if keep.all() else out[keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = _stub if decode_stub else _real
        for pdf in batches:
            if not decode_stub:
                fast = _fast(pdf)
                if fast is not None:
                    yield fast
                    continue
            rows = {k: [] for k in (
                "id", "sample_rate", "n_samples", "n_frames", "sumsq",
                "zero_crossings", "peak", "max_frame_sumsq", "n_bytes",
            )}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    rate, n, nf, ss, zc, pk, mfs = kernel(payload)
                except (NotImplementedError, ValueError):
                    if on_error == "skip":
                        continue
                    raise
                rows["id"].append(int(rid))
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["n_frames"].append(nf)
                rows["sumsq"].append(ss)
                rows["zero_crossings"].append(zc)
                rows["peak"].append(pk)
                rows["max_frame_sumsq"].append(mfs)
                rows["n_bytes"].append(len(payload))
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def audio_segments(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    frame_len: int = 160,
    sumsq_threshold: int = 0,
    decode_stub: bool = True,
) -> DataFrame:
    """VAD-style silence segmentation: one output row per maximal run
    of consecutive ACTIVE frames (frame energy ``sumsq >
    sumsq_threshold``) — the utterance-extraction primitive an audio
    training pipeline runs before transcription/embedding.

    Output: ``(id long, seg_idx int, start_frame long, end_frame long,
    n_frames long, seg_sumsq long, seg_peak int)`` — ``end_frame``
    inclusive, ``seg_idx`` 0-based per payload in time order; all
    integer-exact so a SQL oracle replays it as a classic
    gaps-and-islands over the decoded frame table.

    ``decode_stub=False`` really decodes WAV/PCM (:mod:`extensions
    .wav`); the stub path fabricates a deterministic frame-energy
    sequence from the payload digest so plumbing is testable with no
    codec. Same scale shape as ``audio_features``: per-payload Arrow
    kernel, no shuffle, output rows are segment-sized (7 scalars),
    never sample-sized.
    """
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("seg_idx", T.IntegerType()),
            T.StructField("start_frame", T.LongType()),
            T.StructField("end_frame", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("seg_sumsq", T.LongType()),
            T.StructField("seg_peak", T.IntegerType()),
        ]
    )

    def _frames_real(payload: bytes):
        from fugue_warehouses_spark.extensions.wav import (
            decode_wav,
            frame_features,
            mixdown,
        )

        if payload[:4] != b"RIFF":
            raise NotImplementedError(
                "real audio decode beyond WAV/PCM requires codec "
                "libraries absent in this environment"
            )
        ff = frame_features(mixdown(decode_wav(payload)[0]), frame_len)
        return ff["sumsq"], ff["peak"]

    def _frames_stub(payload: bytes):
        import numpy as np

        h = hashlib.sha256((payload or b"") + (1).to_bytes(4, "big"))
        seed = int.from_bytes(h.digest()[:8], "big")
        rng = np.random.default_rng(seed)
        n_frames = int(seed % 24)
        sumsq = rng.integers(0, 2**40, size=n_frames, dtype=np.int64)
        peak = rng.integers(0, 32768, size=n_frames, dtype=np.int64)
        return sumsq, peak

    def _fast(pdf: pd.DataFrame) -> pd.DataFrame | None:
        """Batch-vectorized real path (round 11, guide §4.2): frame
        the whole Arrow batch's concatenated mono PCM in one reduceat
        sweep, then extract every payload's active islands with one
        vectorized rise/fall-edge pass — the per-payload island loop
        ran ~10 numpy calls on <8-frame arrays per payload. Mono
        16-bit PCM batches only; otherwise None -> per-payload path
        (identical output, property-pinned in tests/test_wav.py)."""
        import numpy as np

        from fugue_warehouses_spark.extensions.wav import (
            batch_frame_features,
            parse_wav_raw,
        )

        ids = pdf[id_col]
        n_rows = len(ids)
        raws: list[bytes] = []
        counts = np.zeros(n_rows, dtype=np.int64)
        for j, payload in enumerate(pdf[payload_col]):
            payload = bytes(payload) if payload is not None else b""
            if payload[:4] != b"RIFF":
                raise NotImplementedError(
                    "real audio decode beyond WAV/PCM requires codec "
                    "libraries absent in this environment"
                )
            raw, ch, _rate, bits = parse_wav_raw(payload)
            if ch != 1 or bits != 16:
                return None  # mixdown/8-bit upconvert: per-payload path
            usable = len(raw) - len(raw) % 2
            raws.append(raw[:usable])
            counts[j] = usable // 2
        x = np.frombuffer(b"".join(raws), dtype="<i2").astype(np.int64)
        ff = batch_frame_features(x, counts, frame_len)
        fsumsq, fpeak = ff["sumsq"], ff["peak"]
        fcounts, foffs = ff["fcounts"], ff["foffs"]
        tot_f = fsumsq.size
        if not tot_f:
            return pd.DataFrame(
                {k: pd.Series(dtype="int64") for k in (
                    "id", "seg_idx", "start_frame", "end_frame",
                    "n_frames", "seg_sumsq", "seg_peak",
                )}
            )
        active = fsumsq > sumsq_threshold
        # rise/fall edges WITHIN each payload (frame grids never span
        # payloads; first/last frame of a payload has no neighbor)
        prev_a = np.zeros(tot_f, dtype=bool)
        prev_a[1:] = active[:-1]
        prev_a[foffs[fcounts > 0]] = False
        next_a = np.zeros(tot_f, dtype=bool)
        next_a[:-1] = active[1:]
        last_idx = (foffs + fcounts - 1)[fcounts > 0]
        next_a[last_idx] = False
        starts = np.flatnonzero(active & ~prev_a)
        ends = np.flatnonzero(active & ~next_a)
        if not starts.size:
            return pd.DataFrame(
                {k: pd.Series(dtype="int64") for k in (
                    "id", "seg_idx", "start_frame", "end_frame",
                    "n_frames", "seg_sumsq", "seg_peak",
                )}
            )
        # map each segment to its payload row and per-payload ordinal
        row_of_frame = np.repeat(
            np.arange(n_rows, dtype=np.int64), fcounts
        )
        seg_row = row_of_frame[starts]
        per_row = np.bincount(seg_row, minlength=n_rows)
        seg_idx = np.arange(starts.size, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(per_row)))[:-1], per_row
        )
        csum = np.concatenate(([0], np.cumsum(fsumsq)))
        # seg_peak via interleaved reduceat [start, end+1); the gap
        # entries between pairs are discarded, so a duplicate index
        # (segment ending at a payload edge abutting the next start)
        # is harmless; pad one element so end+1 == len is in range
        idx2 = np.empty(2 * starts.size, dtype=np.int64)
        idx2[0::2] = starts
        idx2[1::2] = ends + 1
        last_dup = idx2[-1] == fpeak.size
        peak_src = np.append(fpeak, 0) if last_dup else fpeak
        seg_peak = np.maximum.reduceat(peak_src, idx2)[0::2]
        return pd.DataFrame(
            {
                "id": ids.astype("int64").to_numpy()[seg_row],
                "seg_idx": seg_idx,
                "start_frame": starts - foffs[seg_row],
                "end_frame": ends - foffs[seg_row],
                "n_frames": ends - starts + 1,
                "seg_sumsq": csum[ends + 1] - csum[starts],
                "seg_peak": seg_peak,
            }
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        frames = _frames_stub if decode_stub else _frames_real
        for pdf in batches:
            if not decode_stub:
                fast = _fast(pdf)
                if fast is not None:
                    yield fast
                    continue
            cols = {k: [] for k in (
                "id", "seg_idx", "start_frame", "end_frame", "n_frames",
                "seg_sumsq", "seg_peak",
            )}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                sumsq, peak = frames(payload)
                active = sumsq > sumsq_threshold
                if not active.any():
                    continue
                # island boundaries: starts where active rises, ends
                # where it falls (vectorized run-length extraction)
                edges = np.diff(active.astype(np.int8))
                starts = np.flatnonzero(edges == 1) + 1
                ends = np.flatnonzero(edges == -1)
                if active[0]:
                    starts = np.concatenate(([0], starts))
                if active[-1]:
                    ends = np.concatenate((ends, [active.size - 1]))
                csum = np.concatenate(([0], np.cumsum(sumsq)))
                for k, (s, e) in enumerate(zip(starts, ends)):
                    cols["id"].append(int(rid))
                    cols["seg_idx"].append(k)
                    cols["start_frame"].append(int(s))
                    cols["end_frame"].append(int(e))
                    cols["n_frames"].append(int(e - s + 1))
                    cols["seg_sumsq"].append(int(csum[e + 1] - csum[s]))
                    cols["seg_peak"].append(int(peak[s : e + 1].max()))
            yield pd.DataFrame(cols)

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    every_ms: int = 1000,
    decode_stub: bool = True,
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.

    Stubbed kernel emits a deterministic frame count derived from
    payload size (1 frame per 10 KiB, >=1); a real kernel would demux
    and decode. Output: (id, frame_idx, ts_ms, frame binary)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("video demux requires ffmpeg")
            # column-wise zip, not iterrows (row-at-a-time Series
            # construction dominates on wide batches); the per-frame
            # sha256 is the stub "decode kernel" and stays per-item
            ids, idxs, tss, frames = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                n_frames = max(1, len(payload) // 10240)
                for i in range(n_frames):
                    ids.append(int(rid))
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(
                        hashlib.sha256(payload + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def resize_images(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    width: int = 64,
    height: int = 64,
    decode_stub: bool = True,
) -> DataFrame:
    """binary image -> resized thumbnail binary + typed dims.

    Output: (id, thumb binary, width int, height int, n_bytes long).
    ``decode_stub=True``: deterministic width*height/256-byte
    pseudo-thumbnail stretched from the payload digest, so
    partitioning/batch plumbing and output sizing are testable with
    no codec. ``decode_stub=False``: PNG payloads take the REAL
    pipeline — stdlib-only decode, box-average resample, PNG
    re-encode (extensions.png) — and baseline JPEG payloads decode
    via extensions.jpeg, resample the same way, and re-encode as
    JPEG (format-preserving: the thumb column keeps the source
    container). Other formats raise ``NotImplementedError`` (their
    codecs are genuinely absent).
    Either way thumbnails are bounded (*not* payload-sized), which is
    the property that matters at scale: the shuffle after a resize
    moves thumbnails, never source payloads.
    """
    import hashlib as _hl

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("thumb", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    thumb_len = max(1, width * height // 256)

    def _real_thumb(payload: bytes) -> bytes:
        from fugue_warehouses_spark.extensions.png import (
            decode_png,
            encode_png,
            resize_box,
        )

        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return encode_png(resize_box(decode_png(payload), width, height))
        if payload[:2] == b"\xff\xd8":
            import numpy as np

            from fugue_warehouses_spark.extensions.jpeg import (
                decode_jpeg,
                encode_jpeg,
            )

            px = decode_jpeg(payload)
            if px.ndim == 2:  # resize_box expects (h, w, c)
                small = resize_box(px[:, :, None], width, height)[:, :, 0]
            else:
                small = resize_box(px, width, height)
            return encode_jpeg(np.asarray(small, dtype=np.uint8))
        raise NotImplementedError(
            "image decode/resample beyond PNG/JPEG requires PIL/libvips, "
            "absent here"
        )

    def _stub_thumb(payload: bytes) -> bytes:
        seed = _hl.sha256(payload).digest()
        reps = (thumb_len + len(seed) - 1) // len(seed)
        return (seed * reps)[:thumb_len]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = _stub_thumb if decode_stub else _real_thumb
        for pdf in batches:
            ids, thumbs, nbytes = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                thumbs.append(kernel(payload))
                ids.append(int(rid))
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "thumb": thumbs,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                    "n_bytes": nbytes,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)

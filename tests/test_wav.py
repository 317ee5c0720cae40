"""WAV codec (extensions.wav) + audio_features plumbing.

The decoder must be a real RIFF parser, not an inverse of our own
encoder — so beyond round-trips it is checked against a FOREIGN
encoder (stdlib ``wave``), against hand-built containers with
reordered/unknown/odd-sized chunks and WAVE_FORMAT_EXTENSIBLE
headers, and against truncation. Feature math is pinned to a plain
Python reference (hypothesis).
"""

from __future__ import annotations

import io
import struct
import wave as stdwave

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fugue_warehouses_spark.extensions import multimodal as MM
from fugue_warehouses_spark.extensions.wav import (
    decode_wav,
    encode_wav,
    frame_features,
    mixdown,
    resample_linear,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------- codec


@pytest.mark.parametrize("shape", [(0,), (1,), (1000,), (777, 2), (5, 3)])
def test_roundtrip(shape):
    s = _rng(1).integers(-32768, 32768, size=shape, dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, 22050))
    assert rate == 22050
    exp = s[:, None] if s.ndim == 1 else s
    assert np.array_equal(out, exp)


@pytest.mark.parametrize("ch,rate", [(1, 8000), (2, 44100)])
def test_foreign_encoder_stdlib_wave(ch, rate):
    s = _rng(2).integers(-32768, 32768, size=(333, ch), dtype=np.int16)
    buf = io.BytesIO()
    w = stdwave.open(buf, "wb")
    w.setnchannels(ch)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(np.ascontiguousarray(s.astype("<i2")).tobytes())
    w.close()
    out, got_rate = decode_wav(buf.getvalue())
    assert got_rate == rate
    assert np.array_equal(out, s)


def _container(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b"WAVE"
    for tag, payload in chunks:
        body += tag + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _fmt(tag=1, ch=1, rate=16000, bits=16) -> bytes:
    return struct.pack("<HHIIHH", tag, ch, rate, rate * ch * bits // 8,
                       ch * bits // 8, bits)


def test_chunk_order_and_unknown_chunks():
    s = _rng(3).integers(-32768, 32768, size=64, dtype=np.int16)
    data = s.astype("<i2").tobytes()
    # LIST + odd-sized junk chunk BEFORE fmt, fact between fmt and data
    raw = _container(
        [
            (b"LIST", b"INFOISFT" + b"x" * 9),  # odd size -> pad path
            (b"fmt ", _fmt()),
            (b"fact", struct.pack("<I", 64)),
            (b"data", data),
        ]
    )
    out, rate = decode_wav(raw)
    assert rate == 16000
    assert np.array_equal(out[:, 0], s)


def test_wave_format_extensible():
    s = _rng(4).integers(-32768, 32768, size=(50, 2), dtype=np.int16)
    guid_pcm = struct.pack("<H", 1) + bytes(14)
    ext = _fmt(tag=0xFFFE, ch=2) + struct.pack("<HHI", 22, 16, 0x3) + guid_pcm
    raw = _container([(b"fmt ", ext), (b"data", s.astype("<i2").tobytes())])
    out, _ = decode_wav(raw)
    assert np.array_equal(out, s)


def test_truncated_data_chunk_clamps():
    s = np.arange(100, dtype=np.int16)
    raw = encode_wav(s, 16000)
    out, _ = decode_wav(raw[:-11])  # drop 11 bytes: 5 full samples + 1
    assert np.array_equal(out[:, 0], s[:94])


def test_8bit_pcm_upconverts():
    payload = bytes(range(256))
    raw = _container([(b"fmt ", _fmt(bits=8)), (b"data", payload)])
    out, _ = decode_wav(raw)
    exp = (np.arange(256, dtype=np.int16) - 128) << 8
    assert np.array_equal(out[:, 0], exp)


def test_rejections():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    with pytest.raises(ValueError):  # fmt but no data
        decode_wav(_container([(b"fmt ", _fmt())]))
    with pytest.raises(NotImplementedError):  # float32 PCM
        decode_wav(_container([(b"fmt ", _fmt(tag=3, bits=32)),
                               (b"data", b"\x00" * 8)]))
    with pytest.raises(NotImplementedError):  # 24-bit
        decode_wav(_container([(b"fmt ", _fmt(bits=24)),
                               (b"data", b"\x00" * 6)]))
    with pytest.raises(ValueError):  # out-of-range encode input
        encode_wav(np.array([40000], dtype=np.int64))


# ------------------------------------------------------------- features


def _ref_frame_features(x, frame_len):
    n_frames = -(-len(x) // frame_len) if len(x) else 0
    sumsq = [0] * n_frames
    xing = [0] * n_frames
    peak = [0] * n_frames
    for i, v in enumerate(int(v) for v in x):
        f = i // frame_len
        sumsq[f] += v * v
        peak[f] = max(peak[f], abs(v))
        if i > 0 and ((int(x[i - 1]) < 0) != (v < 0)):
            xing[f] += 1
    return sumsq, xing, peak


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
    st.integers(1, 50),
)
def test_frame_features_matches_python_reference(vals, frame_len):
    ff = frame_features(np.array(vals, dtype=np.int16), frame_len)
    sumsq, xing, peak = _ref_frame_features(vals, frame_len)
    assert list(ff["sumsq"]) == sumsq
    assert list(ff["zero_crossings"]) == xing
    assert list(ff["peak"]) == peak


def test_mixdown_floor_mean_exact():
    s = _rng(5).integers(-32768, 32768, size=(100, 3), dtype=np.int16)
    exp = [(int(a) + int(b) + int(c)) // 3 for a, b, c in s]
    assert list(mixdown(s)) == exp
    mono = np.array([-5, 7], dtype=np.int16)
    assert list(mixdown(mono)) == [-5, 7]


def test_resample_linear():
    x = np.arange(0, 1000, dtype=np.int16)
    half = resample_linear(x, 16000, 8000)
    assert len(half) == 500
    assert abs(int(half[250]) - 500) <= 2  # linear ramp stays a ramp
    same = resample_linear(x, 16000, 16000)
    assert np.array_equal(same, x)
    with pytest.raises(ValueError):
        resample_linear(x, 0, 8000)


# ------------------------------------------------------- spark plumbing


def _media_df(spark, payloads):
    rows = [(i, p) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_audio_features_real_path(spark):
    rng = _rng(6)
    payloads, expected = [], []
    for i in range(5):
        n = 100 + 37 * i
        s = rng.integers(-32768, 32768, size=n, dtype=np.int16)
        payloads.append(encode_wav(s, 16000))
        ff = frame_features(s.astype(np.int64), 160)
        expected.append(
            (i, 16000, n, len(ff["sumsq"]), int(ff["sumsq"].sum()),
             int(ff["zero_crossings"].sum()), int(ff["peak"].max()),
             int(ff["sumsq"].max()), len(payloads[-1]))
        )
    out = MM.audio_features(
        _media_df(spark, payloads), "payload", "id", decode_stub=False
    ).orderBy("id")
    assert [tuple(r) for r in out.collect()] == expected


def test_audio_features_stereo_mixdown(spark):
    s = _rng(7).integers(-32768, 32768, size=(321, 2), dtype=np.int16)
    out = MM.audio_features(
        _media_df(spark, [encode_wav(s, 8000)]), "payload", "id",
        decode_stub=False,
    ).collect()[0]
    mono = mixdown(s)
    ff = frame_features(mono, 160)
    assert out.sample_rate == 8000
    assert out.n_samples == 321
    assert out.sumsq == int(ff["sumsq"].sum())
    assert out.zero_crossings == int(ff["zero_crossings"].sum())


def test_audio_features_real_rejects_foreign_container(spark):
    df = _media_df(spark, [b"\xff\xf3fake-mp3-frame" * 4])
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        MM.audio_features(df, "payload", "id", decode_stub=False).collect()


def _ref_segments(sumsq, peak, thr):
    out, k, s = [], 0, None
    nf = len(sumsq)
    for f in range(nf):
        if sumsq[f] > thr and s is None:
            s = f
        if s is not None and (f == nf - 1 or sumsq[f] <= thr):
            e = f if sumsq[f] > thr else f - 1
            out.append(
                (k, s, e, e - s + 1, sum(sumsq[s : e + 1]),
                 max(peak[s : e + 1]))
            )
            k += 1
            s = None
    return out


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-2048, 2047), min_size=1, max_size=900),
    st.integers(1, 8),
)
def test_audio_segments_real_matches_python_reference(spark, vals, gain_period):
    # amplitude-modulate so active/silent islands actually occur
    x = np.array(vals, dtype=np.int64)
    i = np.arange(x.size)
    x = x * np.where((i // 40) % gain_period == 0, 1, 8)
    payload = encode_wav(x.astype(np.int16), 16000)
    thr = 40 * 1024 * 1024  # between quiet and loud frame energies
    out = MM.audio_segments(
        _media_df(spark, [payload]), "payload", "id",
        frame_len=40, sumsq_threshold=thr, decode_stub=False,
    ).orderBy("seg_idx").collect()
    ff = frame_features(x, 40)
    # per-frame peak for the reference (frame_features peak is per-frame)
    exp = _ref_segments(
        [int(v) for v in ff["sumsq"]], [int(v) for v in ff["peak"]], thr
    )
    got = [(r.seg_idx, r.start_frame, r.end_frame, r.n_frames,
            r.seg_sumsq, r.seg_peak) for r in out]
    assert got == exp


def test_audio_segments_all_silent_yields_no_rows(spark):
    payload = encode_wav(np.zeros(500, dtype=np.int16), 16000)
    out = MM.audio_segments(
        _media_df(spark, [payload]), "payload", "id",
        sumsq_threshold=0, decode_stub=False,
    )
    assert out.count() == 0


def test_audio_segments_stub_path_runs(spark):
    df = _media_df(spark, [b"x", b"yz", b""])
    rows = MM.audio_segments(df, "payload", "id",
                             sumsq_threshold=2**39).collect()
    for r in rows:  # islands are well-formed
        assert r.start_frame <= r.end_frame
        assert r.n_frames == r.end_frame - r.start_frame + 1


def test_audio_features_stub_path_deterministic(spark):
    df = _media_df(spark, [b"abc", b"", None])
    a = [tuple(r) for r in
         MM.audio_features(df, "payload", "id").orderBy("id").collect()]
    b = [tuple(r) for r in
         MM.audio_features(df, "payload", "id").orderBy("id").collect()]
    assert a == b
    # stub invariants: frames consistent with samples, n_bytes real
    for row in a:
        _, rate, n, nf, _, zc, peak, _, n_bytes = row
        assert rate == 16000
        assert nf == -(-n // 160) if n else nf == 0
        assert zc <= n and 0 <= peak < 32768
    assert a[0][8] == 3 and a[1][8] == 0 and a[2][8] == 0


def test_audio_features_on_error_skip_drops_bad_payloads(spark):
    good = encode_wav(np.arange(100, dtype=np.int16), 16000)
    df = _media_df(spark, [good, b"\xff\xf3not-a-wav", None, good[:20]])
    out = MM.audio_features(
        df, "payload", "id", decode_stub=False, on_error="skip"
    ).collect()
    assert [r.id for r in out] == [0]  # only the decodable clip
    with pytest.raises(ValueError, match="on_error"):
        MM.audio_features(df, "payload", "id", on_error="quarantine")


def test_streaming_ingest_survives_bad_payload(spark, tmp_path):
    from fugue_warehouses_spark.streaming.audio import (
        run_audio_feature_ingest,
    )

    src, dst, ckpt = (str(tmp_path / n) for n in ("src", "dst", "ckpt"))
    rows = [(0, encode_wav(np.arange(64, dtype=np.int16), 16000)),
            (1, b"\xff\xf3mp3-frame-not-wav"),
            (2, encode_wav(np.arange(96, dtype=np.int16), 16000))]
    spark.createDataFrame(rows, "id long, payload binary").write.parquet(src)
    stream = spark.readStream.schema("id long, payload binary").parquet(src)
    q = run_audio_feature_ingest(stream, dst, ckpt)  # default skip
    q.awaitTermination(120)
    got = sorted(r.id for r in spark.read.parquet(dst).collect())
    assert got == [0, 2]  # the mp3 row skipped, stream not wedged


# ------------------------------------------- batch-vectorized kernels


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
        min_size=1,
        max_size=8,
    ),
    st.integers(1, 64),
)
def test_batch_frame_features_matches_per_payload(payload_vals, frame_len):
    """Round 11: batch_frame_features over concatenated payloads must
    be frame-for-frame identical to frame_features per payload —
    including empty payloads and sub-frame tails."""
    from fugue_warehouses_spark.extensions.wav import batch_frame_features

    arrays = [np.array(v, dtype=np.int64) for v in payload_vals]
    counts = np.array([a.size for a in arrays], dtype=np.int64)
    x = (
        np.concatenate(arrays)
        if any(a.size for a in arrays)
        else np.zeros(0, dtype=np.int64)
    )
    got = batch_frame_features(x, counts, frame_len)
    exp_sumsq, exp_zc, exp_peak, exp_fc = [], [], [], []
    for a in arrays:
        ff = frame_features(a, frame_len)
        exp_sumsq.append(ff["sumsq"])
        exp_zc.append(ff["zero_crossings"])
        exp_peak.append(ff["peak"])
        exp_fc.append(ff["sumsq"].size)
    assert got["fcounts"].tolist() == exp_fc
    assert got["sumsq"].tolist() == np.concatenate(exp_sumsq).tolist()
    assert (
        got["zero_crossings"].tolist()
        == np.concatenate(exp_zc).tolist()
    )
    assert got["peak"].tolist() == np.concatenate(exp_peak).tolist()


def test_audio_features_fast_path_mixed_batch(spark):
    """Round 11: the vectorized mono-16-bit fast path over a batch
    mixing empty, sub-frame and multi-frame payloads must equal the
    per-payload kernel's output exactly."""
    rng = _rng(11)
    payloads, expected = [], []
    sizes = [0, 1, 159, 160, 161, 500, 1024]
    for i, n in enumerate(sizes):
        s = rng.integers(-32768, 32768, size=n, dtype=np.int16)
        payloads.append(encode_wav(s, 16000))
        ff = frame_features(s.astype(np.int64), 160)
        expected.append(
            (
                i, 16000, n, len(ff["sumsq"]),
                int(ff["sumsq"].sum()),
                int(ff["zero_crossings"].sum()),
                int(ff["peak"].max()) if ff["peak"].size else 0,
                int(ff["sumsq"].max()) if ff["sumsq"].size else 0,
                len(payloads[-1]),
            )
        )
    out = MM.audio_features(
        _media_df(spark, payloads), "payload", "id", decode_stub=False
    ).orderBy("id")
    assert [tuple(r) for r in out.collect()] == expected


def test_audio_segments_fast_path_multi_payload_batch(spark):
    """Round 11: vectorized island extraction across a batch must
    match the per-payload reference for every payload, including
    actives touching payload edges (the duplicate-reduceat-index
    case) and all-silent payloads."""
    rng = _rng(12)
    thr = 40 * 1024 * 1024
    payloads, exp = [], []
    patterns = [
        [1] * 80,            # all loud single frame stretch (edges)
        [0] * 200,           # all silent
        [1] * 40 + [0] * 40 + [1] * 40,   # island at both edges
        [0] * 40 + [1] * 40 + [0] * 40,   # interior island
        [1] * 400,           # long active run
        [],                  # empty payload
    ]
    for i, pat in enumerate(patterns):
        base = rng.integers(-2048, 2047, size=len(pat), dtype=np.int64)
        gain = np.where(np.array(pat, dtype=np.int64) > 0, 8, 1)
        x = base * gain
        payloads.append(encode_wav(x.astype(np.int16), 16000))
        ff = frame_features(x, 40)
        for seg in _ref_segments(
            [int(v) for v in ff["sumsq"]],
            [int(v) for v in ff["peak"]], thr,
        ):
            exp.append((i,) + seg)
    out = MM.audio_segments(
        _media_df(spark, payloads), "payload", "id",
        frame_len=40, sumsq_threshold=thr, decode_stub=False,
    ).orderBy("id", "seg_idx").collect()
    got = [
        (r.id, r.seg_idx, r.start_frame, r.end_frame, r.n_frames,
         r.seg_sumsq, r.seg_peak)
        for r in out
    ]
    assert got == exp

"""WAV (RIFF/WAVE PCM) codec + frame-level acoustic features.

stdlib ``struct`` + numpy only — no audio libraries exist in this
environment, so this is a real, self-contained PCM codec in the same
spirit as :mod:`extensions.png` and :mod:`extensions.jpeg`: it makes
the AUDIO leg of the multimodal surface (SURVEY.md §2.E) genuinely
end-to-end (decode -> frame -> featurize) instead of a stub. The
reference repo has no audio handling at all (multimodal is a
north-star extension beyond `/root/reference`); the container format
implemented here is the public RIFF/WAVE spec (fmt tag 1 = integer
PCM, tag 0xFFFE = WAVE_FORMAT_EXTENSIBLE with a PCM sub-format).

Decoder robustness (what makes it a parser, not an inverse of
``encode_wav``): chunks are walked in arbitrary order, unknown chunks
(``LIST``, ``fact``, ``cue ``, ...) are skipped, odd-sized chunks
honor RIFF word alignment (+1 pad byte), a ``data`` chunk whose
declared size overruns the buffer is clamped (truncated downloads),
and WAVE_FORMAT_EXTENSIBLE resolves the real codec from the
sub-format GUID. Non-PCM codecs (float32 = tag 3, ADPCM, mu-law) and
bit depths other than 8/16 raise ``NotImplementedError`` — their
decoders genuinely aren't here; the boundary is honest.

Scale: payload-local kernels only — every function here runs inside
an Arrow batch on one executor (``multimodal.audio_features``), no
driver round-trip, no shuffle. Feature math is vectorized int64
numpy, exact (no floats), so a DuckDB oracle can replay it.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_TAG = 1
_EXTENSIBLE_TAG = 0xFFFE


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 samples ``(n,)`` or ``(n, channels)`` -> WAV bytes.

    Canonical minimal layout (RIFF header, ``fmt `` then ``data``);
    interleaved little-endian PCM16.
    """
    s = np.asarray(samples)
    if s.dtype != np.int16:
        if not np.issubdtype(s.dtype, np.integer):
            raise ValueError("encode_wav takes integer samples (int16 range)")
        if s.size and (s.min() < -32768 or s.max() > 32767):
            raise ValueError("samples exceed int16 range")
        s = s.astype(np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    n, ch = s.shape
    data = np.ascontiguousarray(s.astype("<i2")).tobytes()
    fmt = struct.pack(
        "<HHIIHH", _PCM_TAG, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    if len(data) % 2:  # RIFF word alignment (odd only if ch*2 odd: never
        body += b"\x00"  # for PCM16, but keep the writer spec-correct)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_raw(data: bytes) -> tuple[bytes, int, int, int]:
    """WAV bytes -> ``(raw_pcm_bytes, channels, sample_rate, bits)``
    WITHOUT materializing a sample array — the shared chunk-walking
    parser behind :func:`decode_wav` and the batch kernels
    (round 11, guide §4.2: the per-payload numpy work moved to one
    vectorized pass over the whole Arrow batch, but the RIFF walk is
    cheap pure-Python slicing and stays per payload). Raises exactly
    as ``decode_wav``: ``ValueError`` for malformed RIFF,
    ``NotImplementedError`` for non-integer-PCM codecs / unsupported
    bit depths."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    declared = struct.unpack("<I", data[4:8])[0]
    end = min(len(data), 8 + declared)
    pos = 12
    fmt_body: bytes | None = None
    raw: bytes | None = None
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : min(pos + 8 + size, end)]  # clamp truncation
        if tag == b"fmt ":
            fmt_body = body
        elif tag == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # word alignment pad
    if fmt_body is None or len(fmt_body) < 16:
        raise ValueError("missing or short fmt chunk")
    if raw is None:
        raise ValueError("missing data chunk")
    tag16, ch, rate, _rate_b, _align, bits = struct.unpack(
        "<HHIIHH", fmt_body[:16]
    )
    if tag16 == _EXTENSIBLE_TAG:
        # cbSize(2) + validBits(2) + channelMask(4) + GUID: first two
        # bytes of the sub-format GUID are the real format tag
        if len(fmt_body) < 26:
            raise ValueError("short WAVE_FORMAT_EXTENSIBLE fmt chunk")
        tag16 = struct.unpack("<H", fmt_body[24:26])[0]
    if tag16 != _PCM_TAG:
        raise NotImplementedError(
            f"WAV format tag {tag16} (non-integer-PCM) needs a codec "
            "library absent in this environment"
        )
    if ch < 1:
        raise ValueError("fmt chunk declares zero channels")
    if bits not in (8, 16):
        raise NotImplementedError(f"{bits}-bit PCM unsupported (8/16 only)")
    return raw, ch, rate, bits


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ``(samples int16 (n, channels), sample_rate)``.

    Real chunk-walking parser; see module docstring for the cases it
    covers. 8-bit PCM (unsigned) is up-converted to int16 via the
    standard ``(v - 128) << 8`` mapping.
    """
    raw, ch, rate, bits = parse_wav_raw(data)
    if bits == 16:
        frame = 2 * ch
        usable = len(raw) - len(raw) % frame
        s = np.frombuffer(raw[:usable], dtype="<i2").reshape(-1, ch)
        s = s.astype(np.int16, copy=False)
    else:  # bits == 8 (parse_wav_raw rejected everything else)
        usable = len(raw) - len(raw) % ch
        u = np.frombuffer(raw[:usable], dtype=np.uint8).astype(np.int16)
        s = ((u - 128) << 8).reshape(-1, ch)
    return s, rate


def mixdown(samples: np.ndarray) -> np.ndarray:
    """(n, ch) int16 -> mono int64 by exact floor-mean across channels
    (sum // ch stays integer-exact so oracles can replay it)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        return s
    return s.sum(axis=1) // s.shape[1]


def frame_features(
    samples: np.ndarray, frame_len: int = 160
) -> dict[str, np.ndarray]:
    """Mono samples -> per-frame integer features, vectorized.

    Returns arrays of length ``ceil(n / frame_len)``:
      - ``sumsq``: sum of squared samples in the frame (int64) — the
        integer core of frame RMS energy,
      - ``zero_crossings``: count of sign flips ``(x[i-1]<0) != (x[i]<0)``
        at positions ``i`` inside the frame (the crossing between two
        frames belongs to the later frame),
      - ``peak``: max ``abs(sample)`` in the frame.

    All-integer so a SQL oracle reproduces it exactly; zero-padding of
    the final partial frame affects none of the three (0² = 0, |0| is
    never a new max over a non-empty frame, pad rows produce no sign
    flip because crossings are indexed on real positions only).
    """
    if frame_len < 1:
        raise ValueError("frame_len must be >= 1")
    x = np.asarray(samples, dtype=np.int64).reshape(-1)
    n = x.size
    n_frames = -(-n // frame_len) if n else 0
    if not n_frames:
        z = np.zeros(0, dtype=np.int64)
        return {"sumsq": z, "zero_crossings": z.copy(), "peak": z.copy()}
    pad = n_frames * frame_len - n
    xp = np.pad(x, (0, pad))
    fr = xp.reshape(n_frames, frame_len)
    sumsq = (fr * fr).sum(axis=1)
    peak = np.abs(fr).max(axis=1)
    flips = (x[:-1] < 0) != (x[1:] < 0)  # crossing at position i in [1, n)
    xing = np.bincount(
        (np.nonzero(flips)[0] + 1) // frame_len, minlength=n_frames
    ).astype(np.int64)
    return {"sumsq": sumsq, "zero_crossings": xing, "peak": peak}


def batch_frame_features(
    x: np.ndarray, counts: np.ndarray, frame_len: int = 160
) -> dict[str, np.ndarray]:
    """Vectorized :func:`frame_features` over MANY payloads at once
    (round 11, guide §4.2: per-payload numpy calls on 256–1024-sample
    arrays are dominated by per-call overhead — ~3 ms/payload measured
    on the audio facets; one ``reduceat`` pass over the whole Arrow
    batch amortizes it).

    ``x``: int64 concatenation of every payload's mono samples in
    batch order; ``counts``: per-payload sample counts (zeros allowed
    — empty payloads contribute no frames). Frames never span payload
    boundaries because every payload's frame grid restarts at its own
    offset. Returns per-FRAME arrays ``sumsq`` / ``zero_crossings`` /
    ``peak`` (identical, frame for frame, to running
    ``frame_features`` per payload — pinned by a property test) plus
    per-payload ``fcounts`` and exclusive frame offsets ``foffs``.
    """
    if frame_len < 1:
        raise ValueError("frame_len must be >= 1")
    counts = np.asarray(counts, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
    fcounts = -(-counts // frame_len)
    foffs = np.concatenate(([0], np.cumsum(fcounts)))[:-1]
    tot_f = int(fcounts.sum())
    if not tot_f:
        z = np.zeros(0, dtype=np.int64)
        return {
            "sumsq": z, "zero_crossings": z.copy(), "peak": z.copy(),
            "fcounts": fcounts, "foffs": foffs,
        }
    # global frame-start indices: payload p's k-th frame starts at
    # sample offs[p] + k*frame_len
    k_in_payload = np.arange(tot_f, dtype=np.int64) - np.repeat(
        foffs, fcounts
    )
    fstarts = np.repeat(offs, fcounts) + k_in_payload * frame_len
    sumsq = np.add.reduceat(x * x, fstarts)
    peak = np.maximum.reduceat(np.abs(x), fstarts)
    # sign flips between consecutive samples WITHIN a payload; the
    # flip at position i belongs to i's frame (frame_features: "the
    # crossing between two frames belongs to the later frame" — and
    # reduceat assigns index i to the segment that starts at <= i)
    flips = np.zeros(x.size, dtype=np.int64)
    flips[1:] = ((x[:-1] < 0) != (x[1:] < 0)).astype(np.int64)
    flips[offs[counts > 0]] = 0  # no flip across payload boundaries
    xing = np.add.reduceat(flips, fstarts)
    return {
        "sumsq": sumsq, "zero_crossings": xing, "peak": peak,
        "fcounts": fcounts, "foffs": foffs,
    }


def resample_linear(
    samples: np.ndarray, src_rate: int, dst_rate: int
) -> np.ndarray:
    """Mono int16 linear-interpolation resample (test/utility path;
    feature extraction never needs it). Output length
    ``round(n * dst/src)``; endpoints clamp."""
    if src_rate < 1 or dst_rate < 1:
        raise ValueError("rates must be positive")
    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    if src_rate == dst_rate or x.size <= 1:
        return np.asarray(samples, dtype=np.int16).reshape(-1).copy()
    m = int(round(x.size * dst_rate / src_rate))
    pos = np.arange(m, dtype=np.float64) * src_rate / dst_rate
    pos = np.clip(pos, 0.0, x.size - 1.0)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, x.size - 1)
    frac = pos - lo
    out = x[lo] * (1.0 - frac) + x[hi] * frac
    return np.clip(np.rint(out), -32768, 32767).astype(np.int16)

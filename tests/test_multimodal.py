import pytest
from pyspark.sql import functions as F

from fugue_warehouses_spark.extensions import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, b"\x00" * 1000, "s3://bucket/a.png"),
        (1, b"\xff" * 25000, "s3://bucket/b.png"),
        (2, None, "s3://bucket/c.png"),
    ]
    return spark.createDataFrame(rows, "id long, payload binary, uri string")


def test_attach_metadata_schema(spark, media):
    out = M.attach_media_metadata(media, "payload", "image/png", uri_col="uri")
    meta = out.select("meta.*").columns
    assert meta == ["mime", "uri", "width", "height", "duration_ms"]
    row = out.filter(F.col("id") == 0).collect()[0]
    assert row["meta"]["mime"] == "image/png"
    assert row["meta"]["uri"] == "s3://bucket/a.png"


def test_extract_features_deterministic(spark, media):
    a = M.extract_features(media, "payload", "id", n_features=8).collect()
    b = M.extract_features(media, "payload", "id", n_features=8).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    by_id = {r["id"]: r for r in a}
    assert len(by_id[0]["features"]) == 8
    assert by_id[0]["n_bytes"] == 1000
    assert by_id[2]["n_bytes"] == 0
    assert by_id[0]["features"] != by_id[1]["features"]


def test_extract_features_real_decode_raises(spark, media):
    with pytest.raises(Exception):
        M.extract_features(media, "payload", "id", decode_stub=False).collect()


def test_frame_sample_counts(spark, media):
    out = M.frame_sample(media, "payload", "id").collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id[0]) == 1  # 1000 bytes -> 1 frame
    assert len(by_id[1]) == 2  # 25000 bytes -> 2 frames
    assert by_id[1][1]["ts_ms"] == 1000
    assert all(len(r["frame"]) == 32 for r in out)


def test_resize_images_bounded_output(spark):
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.extensions.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, b"x" * 100_000), (2, b""), (3, None)],
        "id long, payload binary",
    )
    out = resize_images(df, "payload", "id", width=64, height=64).collect()
    rows = {r["id"]: r for r in out}
    assert len(rows) == 3
    for r in rows.values():
        assert len(r["thumb"]) == 64 * 64 // 256  # bounded, not payload-sized
        assert (r["width"], r["height"]) == (64, 64)
    assert rows[1]["n_bytes"] == 100_000
    assert rows[2]["thumb"] == rows[3]["thumb"]  # empty == null payload
    # deterministic
    again = {r["id"]: r["thumb"] for r in resize_images(
        df, "payload", "id", width=64, height=64).collect()}
    assert {k: v["thumb"] for k, v in rows.items()} == again


def test_resize_images_stub_gate(spark):
    import pytest

    from fugue_warehouses_spark.extensions.multimodal import resize_images

    df = spark.createDataFrame([(1, b"abc")], "id long, payload binary")
    with pytest.raises(Exception, match="PIL|libvips|NotImplemented"):
        resize_images(df, "payload", "id", decode_stub=False).collect()


# ---------------- round 6: real PNG kernel --------------------------


def _encode_with_filter(px, f):
    """Test-only PNG writer that uses scanline filter ``f`` on every
    row — exercises the decoder's five unfilter paths (the library
    encoder only emits filter 0)."""
    import struct
    import zlib

    import numpy as np

    from fugue_warehouses_spark.extensions import png as P

    h, w, c = px.shape
    bpp = c
    rows = []
    prior = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int16)
        out = np.zeros(w * c, dtype=np.uint8)
        for x in range(w * c):
            left = int(line[x - bpp]) if x >= bpp else 0
            up = int(prior[x])
            ul = int(prior[x - bpp]) if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                )
            out[x] = (line[x] - pred) % 256
        rows.append(bytes([f]) + out.tobytes())
        prior = px[y].reshape(-1)
    raw = b"".join(rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 6: 6, 4: 6}[c], 0, 0, 0)
    return (
        P._SIGNATURE
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(raw))
        + P._chunk(b"IEND", b"")
    )


def test_png_codec_roundtrip_and_filters():
    """encode->decode is identity for gray/RGB/RGBA, and the decoder
    handles all five scanline filter types (spec-valid inputs built by
    a per-filter test encoder)."""
    import numpy as np
    import pytest

    from fugue_warehouses_spark.extensions import png as P

    rng = np.random.default_rng(42)
    for shape in [(5, 7, 1), (8, 8, 3), (3, 4, 4), (1, 1, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (P.decode_png(P.encode_png(px)) == px).all()
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for f in range(5):
        assert (P.decode_png(_encode_with_filter(px, f)) == px).all()
    # honest edges: garbage and unsupported shapes fail loudly
    with pytest.raises(ValueError, match="signature"):
        P.decode_png(b"not a png")
    with pytest.raises(ValueError):
        P.encode_png(np.zeros((4, 4, 2), dtype=np.uint8))


def test_png_resize_box_exact_mean():
    """Integral-factor box resample equals the exact block mean."""
    import numpy as np

    from fugue_warehouses_spark.extensions.png import resize_box

    px = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    out = resize_box(px, 4, 4)
    expect = np.rint(px.reshape(4, 2, 4, 2, 1).mean(axis=(1, 3)))
    assert (out == expect).all()
    assert resize_box(px.repeat(3, axis=2), 3, 5).shape == (5, 3, 3)


def test_resize_images_real_png_kernel(spark):
    """decode_stub=False on PNG payloads runs the REAL pipeline:
    decode -> box resample -> re-encode; the thumb column holds valid
    PNGs of exactly the requested dims whose pixels equal the
    driver-side resample of the same source."""
    import numpy as np

    from fugue_warehouses_spark.extensions import png as P
    from fugue_warehouses_spark.extensions.multimodal import resize_images

    rng = np.random.default_rng(7)
    sources = {
        i: rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
        for i in range(4)
    }
    df = spark.createDataFrame(
        [(i, P.encode_png(px)) for i, px in sources.items()],
        "id long, payload binary",
    )
    rows = {
        r["id"]: r
        for r in resize_images(
            df, "payload", "id", width=6, height=8, decode_stub=False
        ).collect()
    }
    assert len(rows) == 4
    for i, src in sources.items():
        thumb = P.decode_png(bytes(rows[i]["thumb"]))
        assert thumb.shape == (8, 6, 3)
        assert (thumb == P.resize_box(src, 6, 8)).all()


def test_extract_features_real_png_kernel(spark):
    """decode_stub=False featurizes PNG pixels (dims + per-channel
    mean/std) instead of hashing payload bytes."""
    import numpy as np

    from fugue_warehouses_spark.extensions import png as P
    from fugue_warehouses_spark.extensions.multimodal import extract_features

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:, :, 0] = 200  # constant red channel: mean 200, std 0
    df = spark.createDataFrame(
        [(1, P.encode_png(px))], "id long, payload binary"
    )
    (row,) = extract_features(
        df, "payload", "id", n_features=9, decode_stub=False
    ).collect()
    f = row["features"]
    assert len(f) == 9
    assert abs(f[0] - 4 / 4096) < 1e-9 and abs(f[1] - 4 / 4096) < 1e-9
    assert abs(f[2] - 3 / 4.0) < 1e-9
    assert abs(f[3] - 200 / 255) < 1e-9 and f[4] == 0.0  # red mean/std
    assert f[5] == 0.0 and f[6] == 0.0  # green mean/std


def test_jpeg_codec_roundtrip_and_guards():
    """Baseline JPEG encode->decode: near-lossless on a constant
    image (only quantization error), high-PSNR on smooth gradients,
    shape-exact on noise and odd (non-multiple-of-8) dims, grayscale
    supported; non-baseline and garbage inputs fail loudly."""
    import numpy as np
    import pytest

    from fugue_warehouses_spark.extensions import jpeg as J

    img = np.full((16, 24, 3), [200, 64, 30], dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3

    yy, xx = np.mgrid[0:48, 0:32]
    grad = np.stack(
        [np.clip(yy * 4, 0, 255), np.clip(xx * 6, 0, 255),
         np.clip(255 - yy * 3, 0, 255)], axis=-1,
    ).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(grad))
    err = (dec.astype(float) - grad.astype(float)) ** 2
    psnr = 10 * np.log10(255**2 / err.mean())
    assert psnr > 35.0, psnr

    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, size=(13, 11, 3)).astype(np.uint8)
    assert J.decode_jpeg(J.encode_jpeg(noise)).shape == (13, 11, 3)

    gray = np.clip(yy * 5, 0, 255).astype(np.uint8)
    gdec = J.decode_jpeg(J.encode_jpeg(gray))
    assert gdec.shape == gray.shape and gdec.ndim == 2

    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"not a jpeg")
    # a BASELINE stream whose SOF marker is forged to SOF2 is a corrupt
    # progressive stream (its single SOS claims a full-band DC scan) —
    # must fail loudly, not mis-decode
    prog = bytearray(J.encode_jpeg(img))
    idx = bytes(prog).find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="corrupt"):
        J.decode_jpeg(bytes(prog))


def test_jpeg_progressive_matches_baseline_decode():
    """Progressive (SOF2) entropy-codes the SAME quantized
    coefficients as baseline across its multi-scan script (DC first +
    DC refinement + per-component AC first/refinement), so decoding
    encode_jpeg_progressive(x) must equal decoding encode_jpeg(x)
    BIT-EXACTLY — two independent entropy layers agreeing on the
    coefficient array. Shapes chosen to hit long zero runs (ZRL in the
    refinement walk), EOB-with-correction-bits, saturated DC, odd
    dims, and grayscale."""
    import numpy as np

    from fugue_warehouses_spark.extensions import jpeg as J

    rng = np.random.default_rng(11)
    cases = []
    yy, xx = np.mgrid[0:48, 0:40]
    cases.append(np.stack(
        [np.clip(yy * 4, 0, 255), np.clip(xx * 6, 0, 255),
         np.clip(255 - yy * 3, 0, 255)], axis=-1).astype(np.uint8))
    cases.append(rng.integers(0, 256, size=(29, 31, 3)).astype(np.uint8))
    sat = np.zeros((24, 24, 3), np.uint8)
    sat[:12] = 255
    cases.append(sat)
    cases.append(np.clip(yy * 5, 0, 255).astype(np.uint8))  # grayscale
    # sparse high-frequency content: single hot pixels per block make
    # isolated late-zigzag coefficients -> ZRL + correction-bit paths
    sparse = np.zeros((32, 32, 3), np.uint8)
    sparse[::7, ::5] = 255
    cases.append(sparse)
    for img in cases:
        base = J.decode_jpeg(J.encode_jpeg(img))
        prog_payload = J.encode_jpeg_progressive(img)
        assert J._is_progressive(prog_payload)
        prog = J.decode_jpeg(prog_payload)
        assert np.array_equal(base, prog), img.shape

    # spec-legal 0xFF fill bytes before a marker (T.81 B.1.1.2) must
    # not derail the marker walk (round-8 review: the fill byte used
    # to be read as a marker with a garbage segment length)
    img = cases[0]
    prog_payload = J.encode_jpeg_progressive(img)
    idx = prog_payload.find(b"\xff\xc2")
    padded = prog_payload[:idx] + b"\xff\xff\xff" + prog_payload[idx:]
    assert J._is_progressive(padded)
    assert np.array_equal(J.decode_jpeg(padded), J.decode_jpeg(prog_payload))
    base_payload = J.encode_jpeg(img)
    idx = base_payload.find(b"\xff\xc0")
    bpadded = base_payload[:idx] + b"\xff\xff" + base_payload[idx:]
    assert np.array_equal(J.decode_jpeg(bpadded), J.decode_jpeg(base_payload))


def test_jpeg_dc_only_exactness():
    """Analytic check that FDCT/quant/Huffman agree end-to-end: a
    block-constant image has only DC energy, so the decode must
    reproduce each 8x8 block's value within DC quantization error
    (Q[0,0]=16 -> max error 8 in Y, smaller after RGB round trip)."""
    import numpy as np

    from fugue_warehouses_spark.extensions import jpeg as J

    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8] = 50
    img[:8, 8:] = 100
    img[8:, :8] = 150
    img[8:, 8:] = 250
    dec = J.decode_jpeg(J.encode_jpeg(img)).astype(int)
    for (y0, x0), v in (((0, 0), 50), ((0, 8), 100), ((8, 0), 150), ((8, 8), 250)):
        blk = dec[y0 : y0 + 8, x0 : x0 + 8]
        assert np.abs(blk - v).max() <= 8, (v, blk[0, 0])


def test_resize_and_features_real_jpeg_kernel(spark):
    """decode_stub=False accepts JPEG payloads end-to-end in BOTH
    kernels: resize produces a valid JPEG thumb of the requested dims
    (format-preserving), features come from decoded pixels."""
    import numpy as np

    from fugue_warehouses_spark.extensions import jpeg as J
    from fugue_warehouses_spark.extensions.multimodal import (
        extract_features,
        resize_images,
    )

    yy, xx = np.mgrid[0:16, 0:12]
    src = np.stack(
        [np.clip(yy * 12, 0, 255), np.clip(xx * 16, 0, 255),
         np.full_like(yy, 90)], axis=-1,
    ).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, J.encode_jpeg(src))], "id long, payload binary"
    )
    (row,) = resize_images(
        df, "payload", "id", width=6, height=8, decode_stub=False
    ).collect()
    thumb = bytes(row["thumb"])
    assert thumb[:2] == b"\xff\xd8"  # still a JPEG
    px = J.decode_jpeg(thumb)
    assert px.shape == (8, 6, 3)

    (frow,) = extract_features(
        df, "payload", "id", n_features=9, decode_stub=False
    ).collect()
    f = frow["features"]
    # dims features are exact; channel means within JPEG loss of truth
    assert abs(f[0] - 12 / 4096) < 1e-9 and abs(f[1] - 16 / 4096) < 1e-9
    assert abs(f[2] - 3 / 4.0) < 1e-9
    assert abs(f[7] - 90 / 255) < 0.02  # blue mean survives the codec

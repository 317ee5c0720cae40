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

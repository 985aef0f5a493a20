"""Multimodal column plumbing: metadata extraction (JVM-side), stubbed
decode via mapInPandas (Arrow batches), frame-sample fan-out."""

import pytest
from pyspark.sql import functions as F

from onehouse_demos_spark.operators.multimodal import (
    decode_media,
    frame_sample_plan,
    sniff_format,
    with_media_metadata,
)

PNG_MAGIC = bytes.fromhex("89504E470D0A1A0A") + b"fakepng"
JPEG_MAGIC = bytes.fromhex("FFD8FFE0") + b"fakejpg"


@pytest.fixture()
def media_df(spark):
    return spark.createDataFrame(
        [(1, PNG_MAGIC), (2, JPEG_MAGIC), (3, b"plain bytes"), (4, None)],
        "id int, payload binary",
    )


def test_metadata_and_sniff(media_df):
    out = with_media_metadata(media_df, "payload")
    rows = {r.id: r.payload_meta for r in out.collect()}
    assert rows[1]["format"] == "png"
    assert rows[2]["format"] == "jpeg"
    assert rows[3]["format"] == "unknown"
    assert rows[1]["size_bytes"] == len(PNG_MAGIC)
    assert rows[4]["size_bytes"] is None


def test_fake_decode_batched(media_df):
    decoded = decode_media(media_df, "payload", ["id"], fake=True)
    rows = {r.id: r for r in decoded.collect()}
    assert set(rows) == {1, 2, 3, 4}
    for i in (1, 2, 3):
        assert 1 <= rows[i].width <= 1920
        assert 1 <= rows[i].height <= 1080
        assert rows[i].channels in (1, 2, 3)
        assert rows[i].ok
    assert not rows[4].ok
    # determinism: same content → same fake dimensions
    again = {r.id: r for r in decode_media(media_df, "payload", ["id"], fake=True).collect()}
    assert all(again[i].width == rows[i].width for i in (1, 2, 3))


def test_real_decode_is_stubbed(media_df):
    decoded = decode_media(media_df, "payload", ["id"], fake=False)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decoded.collect()


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, bytes(200_000)), (2, bytes(10))], "id int, payload binary"
    )
    frames = frame_sample_plan(df, "payload", ["id"], every_n_bytes=65536)
    per_id = (
        frames.groupBy("id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    counts = {r.id: r.n for r in per_id}
    assert counts[1] == 3  # 200000 // 65536
    assert counts[2] == 1  # minimum one frame
    offs = [r.byte_offset for r in frames.filter("id = 1").orderBy("frame_idx").collect()]
    assert offs == [0, 65536, 131072]


def test_resize_stub_letterboxes(media_df):
    from onehouse_demos_spark.operators.multimodal import resize_media

    rows = {
        r.id: r
        for r in resize_media(
            media_df, "payload", ["id"], target=(224, 224), fake=True
        ).collect()
    }
    for i in (1, 2, 3):
        assert rows[i].ok
        # letterbox: fits in target, preserves at least one dimension
        assert 1 <= rows[i].out_width <= 224
        assert 1 <= rows[i].out_height <= 224
        assert max(rows[i].out_width, rows[i].out_height) >= 200
    assert not rows[4].ok
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_media(media_df, "payload", ["id"], fake=False).collect()


def test_feature_extract_deterministic(media_df):
    from onehouse_demos_spark.operators.multimodal import extract_features

    feats = extract_features(media_df, "payload", ["id"], dims=4)
    rows = {r.id: r for r in feats.collect()}
    assert set(feats.columns) == {"id", "f0", "f1", "f2", "f3"}
    for i in (1, 2, 3):
        assert all(0.0 <= rows[i][f"f{d}"] <= 1.0 for d in range(4))
    assert rows[4].f0 is None
    again = {r.id: r for r in extract_features(media_df, "payload", ["id"]).collect()}
    assert all(again[i].f0 == rows[i].f0 for i in (1, 2, 3))

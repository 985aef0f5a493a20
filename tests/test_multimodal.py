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


def test_bmp_codec_roundtrip():
    """Pure-numpy BMP encode/decode round-trips pixels exactly."""
    import numpy as np

    from onehouse_demos_spark.functions.media_codecs import decode_bmp, encode_bmp

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_wav_codec_roundtrip():
    import numpy as np

    from onehouse_demos_spark.functions.media_codecs import decode_wav, encode_wav

    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32767, size=(480, 2), dtype=np.int16)
    rate, ch, got = decode_wav(encode_wav(samples, sample_rate=8000))
    assert (rate, ch) == (8000, 2)
    assert np.array_equal(got, samples)


def test_real_decode_bmp_and_wav(spark):
    """decode_media(fake=False) REALLY decodes uncompressed formats:
    BMP dimensions from the pixel grid, WAV sample/channel counts from
    the RIFF chunks."""
    import numpy as np

    from onehouse_demos_spark.functions.media_codecs import encode_bmp, encode_wav
    from onehouse_demos_spark.operators.multimodal import decode_media, sniff_format
    from pyspark.sql import functions as F

    bmp = encode_bmp(np.zeros((48, 64, 3), dtype=np.uint8))
    wav = encode_wav(np.zeros((1600, 2), dtype=np.int16))
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(wav))], "id int, payload binary"
    )
    fmts = {r.id: r.f for r in df.select("id", sniff_format(F.col("payload")).alias("f")).collect()}
    assert fmts == {1: "bmp", 2: "riff"}
    rows = {r.id: r for r in decode_media(df, "payload", ["id"], fake=False).collect()}
    assert (rows[1].width, rows[1].height, rows[1].channels, rows[1].ok) == (64, 48, 3, True)
    assert (rows[2].width, rows[2].height, rows[2].channels, rows[2].ok) == (1600, 1, 2, True)


def test_real_resize_bmp(spark):
    """resize_media(fake=False) performs an actual nearest-neighbor
    resample of BMP pixels to the letterboxed target."""
    import numpy as np

    from onehouse_demos_spark.functions.media_codecs import (
        encode_bmp,
        letterbox_dims,
        resize_nearest,
    )
    from onehouse_demos_spark.operators.multimodal import resize_media

    px = np.arange(120 * 160 * 3, dtype=np.uint64).reshape(120, 160, 3)
    px = (px % 256).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(px)))], "id int, payload binary"
    )
    row = resize_media(df, "payload", ["id"], target=(80, 80), fake=False).collect()[0]
    ow, oh = letterbox_dims(160, 120, 80, 80)
    assert (row.out_width, row.out_height, row.ok) == (ow, oh, True)
    # the numpy resample itself is exact nearest-neighbor
    small = resize_nearest(px, oh, ow)
    assert small.shape == (oh, ow, 3)
    assert np.array_equal(small[0, 0], px[0, 0])


def test_audio_spectral_features_pin_sine(spark):
    """Real DSP path: a synthetic 440 Hz sine must come back with
    dominant frequency at 440 Hz (± bin resolution), centroid near it,
    and the sine's RMS (1/sqrt(2) of amplitude); non-WAV rows NULL."""
    import numpy as np

    from onehouse_demos_spark.functions.media_codecs import encode_wav
    from onehouse_demos_spark.operators.multimodal import (
        audio_spectral_features,
    )

    rate, secs, freq, amp = 8000, 1.0, 440.0, 0.5
    t = np.arange(int(rate * secs)) / rate
    pcm = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    wav = encode_wav(pcm.reshape(-1, 1), sample_rate=rate)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not-a-wav"))],
        "media_id int, payload binary",
    )
    rows = {r.media_id: r for r in
            audio_spectral_features(df, "payload", ["media_id"]).collect()}
    sine = rows[1]
    assert sine.sample_rate == rate and sine.n_samples == rate
    assert abs(sine.dominant_hz - freq) <= rate / sine.n_samples + 1e-6
    assert abs(sine.spectral_centroid_hz - freq) < 25.0  # leakage tolerance
    assert abs(sine.rms - amp / np.sqrt(2)) < 0.01
    assert rows[2].dominant_hz is None and rows[2].sample_rate is None

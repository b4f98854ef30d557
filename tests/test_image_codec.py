"""Image codec tests: PNG/PPM decode from specification, committed golden
fixtures, and the real_decode path through the Arrow-batched multimodal
stage."""

import os

import numpy as np
import pytest

from buildkite_logs_parquet_spark.functions.image_codec import (
    decode_image,
    decode_png,
    decode_ppm,
    encode_png,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _fixture(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


# ------------------------------------------------------------- round trips


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter_type(ftype):
    rng = np.random.default_rng(7 + ftype)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    data = encode_png(img, row_filters=[ftype] * 6)
    assert (decode_png(data) == img).all()


def test_png_roundtrip_mixed_filters_and_channel_counts():
    rng = np.random.default_rng(99)
    for channels in (1, 3, 4):
        shape = (5, 4) if channels == 1 else (5, 4, channels)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        data = encode_png(img, row_filters=[0, 1, 2, 3, 4])
        out = decode_png(data)
        want = img[:, :, None] if channels == 1 else img
        assert (out == want).all(), channels


def test_png_rejects_corruption():
    img = np.zeros((2, 2, 3), np.uint8)
    data = bytearray(encode_png(img))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + bytes(data[4:]))
    data[20] ^= 0xFF  # flip a byte inside IHDR → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


# --------------------------------------------------- committed golden files


def test_golden_rgb_png_fixture():
    """The committed 5x4 RGB fixture uses one scanline per filter type —
    decoding it drives every unfilter path against bytes on disk."""
    img = decode_png(_fixture("rgb_5x4.png"))
    assert img.shape == (5, 4, 3)
    rng = np.random.default_rng(42)
    want = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    assert (img == want).all()


def test_golden_gray_and_palette_png_fixtures():
    gray = decode_png(_fixture("gray_3x3.png"))
    assert (gray[:, :, 0] == np.array(
        [[0, 128, 255], [10, 20, 30], [200, 100, 50]], np.uint8
    )).all()
    pal = decode_png(_fixture("palette_2x2.png"))
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]], np.uint8
    )
    assert (pal == want).all()


def test_golden_netpbm_fixtures():
    ppm = decode_ppm(_fixture("rgb_3x2.ppm"))
    assert ppm.shape == (2, 3, 3)
    assert (ppm.ravel() == np.arange(18, dtype=np.uint8)).all()
    pgm = decode_image(_fixture("gray_2x2.pgm"))
    assert (pgm.ravel() == np.array([0, 64, 128, 255], np.uint8)).all()


def test_unknown_format_keeps_the_honest_seam():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\xff\xd8\xff\xe0 JFIF jpeg bytes")


# ------------------------------------------- real_decode through the stage


def test_real_decode_features_from_actual_pixels():
    from buildkite_logs_parquet_spark.operators.multimodal import real_decode

    red = np.zeros((4, 8, 3), np.uint8)
    red[:, :, 0] = 200
    feats = real_decode(encode_png(red))
    assert (feats["width"], feats["height"], feats["n_frames"]) == (8, 4, 1)
    r, g, b = feats["feature"][2:5]
    assert r == pytest.approx(200 / 255, abs=1e-6)
    assert g == 0.0 and b == 0.0
    assert feats["feature"][5] == pytest.approx(8 / 12, abs=1e-6)  # aspect
    assert real_decode(None)["width"] is None


def test_extract_features_with_real_decoder_on_spark(spark):
    """Integration: PNG payloads through the Arrow-batched mapInPandas
    stage with the REAL decoder — identical images get identical features,
    different images differ, and dimensions come from true pixel data."""
    from buildkite_logs_parquet_spark.operators import multimodal as M

    rng = np.random.default_rng(3)
    img_a = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    img_b = rng.integers(0, 256, (3, 2, 3), dtype=np.uint8)
    rows = [
        (0, bytearray(encode_png(img_a))),
        (1, bytearray(encode_png(img_a, row_filters=[4] * 6))),  # same pixels
        (2, bytearray(encode_png(img_b))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = M.attach_media_meta(df, media_type="image", fmt="png")
    out = {
        r["media_id"]: r
        for r in M.extract_features(media, decode=M.real_decode).collect()
    }
    assert (out[0]["width"], out[0]["height"]) == (9, 6)
    assert list(out[0]["feature"]) == list(out[1]["feature"])  # pixel-equal
    assert list(out[0]["feature"]) != list(out[2]["feature"])
    assert (out[2]["width"], out[2]["height"]) == (2, 3)

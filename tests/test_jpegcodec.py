"""Baseline JPEG codec (operators/jpegcodec.py): exactness anchors,
round-trip error bounds, subsampling, restart markers, the honest
NotImplementedError envelope, and the Spark decode_image_stats path.

The exactness anchors are the load-bearing tests: with an all-ones
quantization table, an image of flat 8x8 blocks has integer DC-only
DCT coefficients, so encode→decode must reproduce every pixel EXACTLY
— any error in marker layout, Huffman tables, zigzag order,
dequantize, or IDCT shows up as a pixel diff, and the encoder and
decoder cannot cancel each other's mistakes because the expected
output is the analytic input, not a decoded reference.
"""

from __future__ import annotations

import numpy as np
import pytest

from mfdb_hafro_etl_spark.operators import imagecodec as ic
from mfdb_hafro_etl_spark.operators import jpegcodec as jc
from mfdb_hafro_etl_spark.operators import multimodal as mm

ONES = (np.ones(64, dtype=np.int64), np.ones(64, dtype=np.int64))


def tiled(h: int, w: int, f) -> np.ndarray:
    """Grayscale image of flat 8x8 blocks; block (by,bx) = f(by,bx)."""
    img = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = f(by, bx) % 256
    return img


def test_flat_gray_roundtrip_exact():
    img = np.full((24, 40), 77, dtype=np.uint8)
    dec = jc.decode_jpeg(jc.encode_jpeg(img, quant_tables=ONES))
    assert dec.shape == (24, 40, 1)
    assert np.array_equal(dec[:, :, 0], img)


def test_tiled_blocks_roundtrip_exact():
    """Multi-MCU grayscale: exercises DC differential coding and EOB
    across 24 blocks with analytically exact expected pixels."""
    img = tiled(32, 48, lambda by, bx: by * 13 + bx * 31)
    dec = jc.decode_jpeg(jc.encode_jpeg(img, quant_tables=ONES))
    assert np.array_equal(dec[:, :, 0], img)


def test_restart_markers_roundtrip_exact():
    """RST markers reset both the bit reader and the DC predictors;
    every interval length must still reproduce the exact pixels."""
    img = tiled(40, 64, lambda by, bx: by * 37 + bx * 11)
    for ri in (1, 2, 3, 5):
        data = jc.encode_jpeg(img, quant_tables=ONES, restart_interval=ri)
        assert np.array_equal(jc.decode_jpeg(data)[:, :, 0], img), ri


def test_header_parse_agrees_with_decode():
    img = tiled(16, 24, lambda by, bx: 50 + by + bx)
    for sub in ((1, 1), (2, 2)):
        data = jc.encode_jpeg(
            np.repeat(img[:, :, None], 3, axis=2), subsampling=sub
        )
        hdr = ic.parse_header(data)
        dec = jc.decode_jpeg(data)
        assert hdr["format"] == "jpeg"
        assert (hdr["height"], hdr["width"], hdr["channels"]) == dec.shape


def test_rgb_flat_near_exact_all_subsamplings():
    """Flat color: only the YCbCr<->RGB float transform rounds, so
    every subsampling must land within ±1 of the input everywhere."""
    img = np.zeros((17, 23, 3), dtype=np.uint8)
    img[:] = (200, 30, 90)
    for sub in ((1, 1), (2, 2), (2, 1), (1, 2)):
        dec = jc.decode_jpeg(
            jc.encode_jpeg(img, quant_tables=ONES, subsampling=sub)
        )
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1, sub


def test_smooth_quality95_bounded_error():
    rng = np.random.default_rng(7)
    base = rng.integers(60, 190, (6, 8))
    img = np.kron(base, np.ones((8, 8))).astype(np.uint8)
    img = (
        (img.astype(np.int64) + rng.integers(-3, 4, img.shape))
        .clip(0, 255)
        .astype(np.uint8)
    )
    dec = jc.decode_jpeg(jc.encode_jpeg(img, quality=95))
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 8


def test_odd_dimensions_cropped():
    """Non-multiple-of-MCU sizes decode to the SOF dimensions, with
    the edge-padded blocks cropped away."""
    rng = np.random.default_rng(3)
    img = np.kron(rng.integers(0, 256, (3, 4)), np.ones((8, 8))).astype(
        np.uint8
    )[:19, :27]
    assert jc.decode_jpeg(jc.encode_jpeg(img, quality=90)).shape == (19, 27, 1)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    data = jc.encode_jpeg(rgb, quality=90, subsampling=(2, 2))
    assert jc.decode_jpeg(data).shape == (19, 27, 3)


def test_unsupported_modes_raise_honestly():
    img = np.full((8, 8), 10, dtype=np.uint8)
    data = bytearray(jc.encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    for sof, words in ((0xC2, "progressive"), (0xC9, "arithmetic")):
        bad = bytearray(data)
        bad[i + 1] = sof
        with pytest.raises(NotImplementedError, match=words):
            jc.decode_jpeg(bytes(bad))
    with pytest.raises(ValueError):
        jc.decode_jpeg(b"\x00\x01not a jpeg")


def test_decode_pixels_dispatch():
    """imagecodec.decode_pixels routes PNG and JPEG to real decoders
    and refuses formats that need an external codec."""
    img = tiled(16, 16, lambda by, bx: 40 + 10 * (by * 2 + bx))
    jpg = jc.encode_jpeg(img, quant_tables=ONES)
    png = ic.encode_png(img)
    assert np.array_equal(ic.decode_pixels(jpg)[:, :, 0], img)
    assert np.array_equal(ic.decode_pixels(png)[:, :, 0], img)
    gif = b"GIF89a" + bytes([4, 0, 4, 0]) + b"\x00" * 20
    with pytest.raises(NotImplementedError, match="gif"):
        ic.decode_pixels(gif)


def test_decode_image_stats_spark(spark):
    """The Spark-side Arrow kernel: decoded dims + floor-quantized
    mean for a mixed PNG/JPEG media frame."""
    imgs = {
        1: tiled(16, 24, lambda by, bx: by * 13 + bx * 31),
        2: tiled(8, 8, lambda by, bx: 200),
    }
    rows = [
        (1, bytearray(jc.encode_jpeg(imgs[1], quant_tables=ONES))),
        (2, bytearray(ic.encode_png(imgs[2]))),
    ]
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY")
    got = {
        r.media_id: (r.width, r.height, r.channels, r.mean_px)
        for r in mm.decode_image_stats(df).collect()
    }
    import math

    for mid, img in imgs.items():
        want = math.floor(float(img.mean()) * 1e6 + 0.5) / 1e6
        assert got[mid] == (img.shape[1], img.shape[0], 1, want)


def test_real_features_and_resize_accept_jpeg(spark):
    """The round-3 environment-blocked paths are now real for
    baseline JPEG: features come from decoded pixels, resize output
    is the exact nearest-neighbor buffer."""
    img = tiled(16, 16, lambda by, bx: 60 + 50 * by + 20 * bx)
    data = jc.encode_jpeg(img, quant_tables=ONES)
    df = spark.createDataFrame(
        [(5, bytearray(data))], "media_id LONG, content BINARY"
    )
    feats = mm.extract_features(df, mode="real").collect()[0].features
    assert feats[0] == 16 / 4096.0 and feats[1] == 16 / 4096.0
    assert abs(feats[3] - float(img.mean()) / 255.0) < 1e-12
    out = mm.resize_media(df, 4, 4, channels=1, mode="real").collect()[0]
    want = ic.resize_nearest(img[:, :, None], 4, 4).tobytes()
    assert bytes(out.content) == want

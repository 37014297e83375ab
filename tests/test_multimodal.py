"""Multimodal plumbing contracts: schema, batch shape, determinism,
the REAL PNG decode path (pure-Python imagecodec — header parse,
pixel decode, features, resize), and the NotImplementedError gate for
formats that genuinely need an external codec."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.catalog import load_table
from mfdb_hafro_etl_spark.operators import imagecodec as ic
from mfdb_hafro_etl_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return mm.attach_binary(docs, "doc_id", "text")


def test_resize_buffer_invariant(media):
    out = mm.resize_media(media, width=16, height=16, mode="fake")
    rows = out.collect()
    assert rows
    for r in rows:
        assert r.n_bytes == 16 * 16 * 3
        assert len(bytes(r.content)) == 16 * 16 * 3


def test_resize_deterministic(media):
    a = sorted((r.media_id, bytes(r.content)) for r in mm.resize_media(media, 8, 8).collect())
    b = sorted(
        (r.media_id, bytes(r.content))
        for r in mm.resize_media(media.repartition(7), 8, 8).collect()
    )
    assert a == b


def test_decode_meta_matches_jvm_hash(media):
    """The fake decode's width must equal the JVM-side sha2 hex
    arithmetic — proves Python kernel and Column algebra agree on
    the same bytes."""
    jvm = media.select(
        "media_id",
        (
            F.conv(F.substring(F.sha2(F.col("content"), 256), 1, 4), 16, 10).cast("int")
            % 1024
            + 16
        ).alias("width_jvm"),
    )
    py = mm.decode_media_meta(media, mode="fake")
    joined = py.join(jvm, "media_id")
    assert joined.filter(F.col("width") != F.col("width_jvm")).count() == 0


def test_real_mode_raises_for_non_decodable(media):
    """Text payloads are not images: the real pixel path must refuse
    them loudly (only PNG decodes with stdlib zlib)."""
    with pytest.raises(Exception) as ei:
        mm.resize_media(media, 4, 4, mode="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
    with pytest.raises(ValueError):
        mm.resize_media(media, 4, 4, mode="nope")


@pytest.fixture(scope="module")
def png_media(spark):
    """Three real (decodable) PNGs with known pixels."""
    rng = np.random.RandomState(42)
    imgs = {
        1: rng.randint(0, 256, (6, 9, 3), dtype=np.uint8),
        2: rng.randint(0, 256, (12, 5, 1), dtype=np.uint8),
        3: rng.randint(0, 256, (7, 7, 4), dtype=np.uint8),
    }
    rows = [(mid, bytearray(ic.encode_png(img))) for mid, img in imgs.items()]
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY")
    return df, imgs


def test_real_header_decode_png(png_media):
    df, imgs = png_media
    got = {r.media_id: (r.width, r.height, r.channels)
           for r in mm.decode_media_meta(df, mode="real").collect()}
    assert got == {m: (i.shape[1], i.shape[0], i.shape[2]) for m, i in imgs.items()}


def test_real_meta_null_for_unrecognized(spark):
    df = spark.createDataFrame(
        [(9, bytearray(b"definitely not an image"))], "media_id LONG, content BINARY"
    )
    r = mm.decode_media_meta(df, mode="real").collect()[0]
    assert (r.width, r.height, r.channels) == (None, None, None)


def test_real_features_from_decoded_pixels(png_media):
    df, imgs = png_media
    feats = {r.media_id: r.features for r in mm.extract_features(df, mode="real").collect()}
    for mid, img in imgs.items():
        f = feats[mid]
        h, w, c = img.shape
        assert f[0] == pytest.approx(w / 4096.0)
        assert f[1] == pytest.approx(h / 4096.0)
        assert f[2] == pytest.approx(c / 4.0)
        assert f[3] == pytest.approx(img.astype(np.float64).mean() / 255.0)


def test_to_channels_semantics():
    """Alpha planes are masks, not intensity: gray+alpha → RGB must
    replicate the GRAY plane (never leak alpha into a color slot);
    RGB → RGBA gains an opaque alpha; color truncates for gray."""
    rng = np.random.RandomState(3)
    ga = rng.randint(0, 256, (4, 5, 2), dtype=np.uint8)
    rgb3 = ic.to_channels(ga, 3)
    assert rgb3.shape == (4, 5, 3)
    for c in range(3):
        assert np.array_equal(rgb3[:, :, c], ga[:, :, 0]), "alpha leaked into color"
    rgb = rng.randint(0, 256, (4, 5, 3), dtype=np.uint8)
    rgba = ic.to_channels(rgb, 4)
    assert np.array_equal(rgba[:, :, :3], rgb) and (rgba[:, :, 3] == 255).all()
    assert np.array_equal(ic.to_channels(rgb, 1), rgb[:, :, :1])


def test_jpeg_header_with_fill_bytes_and_eoi():
    """Spec-valid JPEGs pad markers with 0xFF fill bytes; EOI is a
    terminator, not a length-bearing segment."""
    import struct

    sof = b"\xff\xff\xff\xc0\x00\x11\x08\x00\x40\x00\x30\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    jpeg = b"\xff\xd8" + sof + b"\xff\xd9"
    h = ic.parse_header(jpeg)
    assert h == {"format": "jpeg", "width": 48, "height": 64, "channels": 3}, h
    assert ic.parse_header(b"\xff\xd8\xff\xd9") is None  # EOI before any SOF


def test_truncated_png_raises_valueerror():
    img = np.zeros((3, 3, 1), dtype=np.uint8)
    data = ic.encode_png(img)
    with pytest.raises(ValueError):
        ic.decode_png(data[: len(data) - 20])


def test_wav_roundtrip_and_features(spark):
    """Real audio path: encode PCM16 WAVs with known signals, parse
    headers through the streaming decode_audio_meta(mode='real'),
    and check decoded-signal features against closed forms (a full-
    scale sine has RMS 1/sqrt(2) and ZCR ~2f/rate)."""
    from mfdb_hafro_etl_spark.operators import audiocodec as ac

    rate = 16000
    t = np.arange(rate) / rate  # 1 second
    sine = np.sin(2 * np.pi * 440 * t)
    stereo = np.stack([sine, 0.5 * sine], axis=1)
    payloads = {1: ac.encode_wav(sine, rate), 2: ac.encode_wav(stereo, rate)}

    h1 = ac.parse_wav_header(payloads[1])
    assert (h1["channels"], h1["sample_rate"], h1["bits"], h1["n_frames"]) == (1, rate, 16, rate)
    assert h1["duration_s"] == pytest.approx(1.0)

    sig, r = ac.decode_wav(payloads[2])
    assert r == rate and sig.shape == (rate, 2)
    assert np.abs(sig[:, 0] - sine).max() < 1e-3  # PCM16 quantization

    f = ac.audio_features(payloads[1])
    assert f[0] == pytest.approx(1.0)
    assert f[3] == pytest.approx(1 / np.sqrt(2), abs=1e-3)  # RMS
    assert f[5] == pytest.approx(2 * 440 / rate, rel=0.01)  # ZCR

    df = spark.createDataFrame(
        [(mid, bytearray(p)) for mid, p in payloads.items()],
        "media_id LONG, content BINARY",
    )
    got = {r_.media_id: (r_.channels, r_.sample_rate, r_.n_frames)
           for r_ in mm.decode_audio_meta(df, mode="real").collect()}
    assert got == {1: (1, rate, rate), 2: (2, rate, rate)}
    bad = spark.createDataFrame([(9, bytearray(b"mp3???"))], "media_id LONG, content BINARY")
    r9 = mm.decode_audio_meta(bad, mode="real").collect()[0]
    assert (r9.channels, r9.sample_rate, r9.duration_s) == (None, None, None)


def test_mp4_header_parse(spark):
    """Real MP4 metadata: a hand-built box tree (ftyp + moov with
    mvhd v0 and a trak/tkhd) parses to the expected timescale,
    duration and 16.16 fixed-point dimensions; v1 (64-bit times) and
    non-MP4 payloads are handled."""
    import struct as s

    def box(btype, body):
        return s.pack(">I", 8 + len(body)) + btype + body

    mvhd = box(b"mvhd", b"\x00\x00\x00\x00" + b"\x00" * 8
               + s.pack(">II", 25000, 50000)
               + b"\x00" * 80)
    tkhd = box(b"tkhd", b"\x00\x00\x00\x07" + b"\x00" * 72
               + s.pack(">II", 640 << 16, 480 << 16))
    data = box(b"ftyp", b"isom\x00\x00\x00\x00") + box(b"moov", mvhd + box(b"trak", tkhd))
    h = ic.parse_mp4_header(data)
    assert h["timescale"] == 25000 and h["duration"] == 50000
    assert h["duration_s"] == pytest.approx(2.0)
    assert (h["width"], h["height"]) == (640, 480)
    # mvhd version 1: 64-bit ctime/mtime/duration
    mvhd1 = box(b"mvhd", b"\x01\x00\x00\x00" + b"\x00" * 16
                + s.pack(">I", 1000) + s.pack(">Q", 3000) + b"\x00" * 80)
    h1 = ic.parse_mp4_header(box(b"ftyp", b"isom\x00\x00\x00\x00") + box(b"moov", mvhd1))
    assert h1["timescale"] == 1000 and h1["duration"] == 3000
    assert ic.parse_mp4_header(b"not an mp4 at all..") is None
    df = spark.createDataFrame([(5, bytearray(data))], "media_id LONG, content BINARY")
    r = mm.decode_video_meta(df, mode="real").collect()[0]
    assert (r.width, r.height, r.timescale, r.duration) == (640, 480, 25000, 50000)


def test_tar_enumeration_matches_stdlib_tarfile(spark):
    """The ustar header walk must agree with Python's tarfile on a
    REAL archive (names, data offsets, sizes), and member_bytes must
    slice the exact payloads — the range-read contract WebDataset
    loaders rely on."""
    import io
    import tarfile

    from mfdb_hafro_etl_spark.operators import archive as ar

    buf = io.BytesIO()
    payloads = {"a.txt": b"hello world", "sub/b.json": b"{}" * 300, "c.bin": b"\x01" * 513}
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, body in payloads.items():
            info = tarfile.TarInfo(name)
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
    data = buf.getvalue()

    members = ar.parse_tar_members(data)
    assert [m["name"] for m in members] == list(payloads)
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        expect = {m.name: (m.offset_data, m.size) for m in tf.getmembers()}
    for m in members:
        assert (m["offset"], m["size"]) == expect[m["name"]]
        assert ar.member_bytes(data, m) == payloads[m["name"]]

    df = spark.createDataFrame([(7, bytearray(data))], "media_id LONG, content BINARY")
    rows = mm.enumerate_tar_members(df).orderBy("offset").collect()
    assert [(r.name, r.size) for r in rows] == [(n, len(b)) for n, b in payloads.items()]


def test_real_resize_is_nearest_neighbor(png_media):
    df, imgs = png_media
    out = {r.media_id: bytes(r.content)
           for r in mm.resize_media(df, 4, 3, channels=3, mode="real").collect()}
    for mid, img in imgs.items():
        expect = ic.resize_nearest(ic.to_channels(img, 3), 4, 3).tobytes()
        assert out[mid] == expect, f"media {mid} resize mismatch"


def test_phash64_invariants():
    """phash64's integer-exactness contract (operators/imagehash.py):
    - POOLING EXACTNESS: pixel-doubling an image (each px -> 2x2) is
      invisible to the hash (box pool of flat cells == original);
    - GRAYSCALE: equal-channel RGB == its grayscale plane;
    - DC/brightness: adding a constant leaves every AC coefficient
      unchanged, so the hash moves at most a few bits;
    - SENSITIVITY: independent random images land far apart (the
      arm's linear pair count depends on this).
    """
    import numpy as np

    from mfdb_hafro_etl_spark.operators.imagehash import phash64

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)

    doubled = np.kron(img, np.ones((2, 2), dtype=np.uint8))
    assert phash64(doubled) == phash64(img)

    rgb = np.repeat(img[:, :, None], 3, axis=2)
    assert phash64(rgb) == phash64(img)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    brighter = np.clip(img.astype(np.int64) + 40, 0, 255).astype(np.uint8)
    assert ham(phash64(brighter), phash64(img)) <= 8

    other = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    assert ham(phash64(other), phash64(img)) > 16


def test_image_phash_through_real_codecs(png_media):
    """image_phash decodes REAL payloads (PNG here; the suite arm
    covers JPEG) and must equal phash64 of the known pixels."""
    from mfdb_hafro_etl_spark.operators import imagehash as ih
    from mfdb_hafro_etl_spark.operators.imagehash import phash64

    df, imgs = png_media
    got = {r.media_id: r.phash for r in ih.image_phash(df).collect()}
    for mid, img in imgs.items():
        assert got[mid] == phash64(img), f"media {mid} phash mismatch"

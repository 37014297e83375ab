"""Multimodal column plumbing (driver extension scope).

Images/audio/video are carried as opaque ``binary`` columns with a
typed metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` generators so each task processes columnar batches —
the 100 TB path is: binary payloads stay in executor memory, the
Python worker sees pyarrow-backed pandas batches, and partitioning is
by content hash so hot keys spread.

Codec availability: the container ships no image libraries, but PNG
needs only stdlib ``zlib`` and baseline JPEG needs only integer
Huffman + an 8x8 IDCT — so ``mode='real'`` is genuinely implemented
via :mod:`.imagecodec` / :mod:`.jpegcodec` (pure-Python/numpy):
header metadata for PNG/JPEG/GIF/BMP, full pixel decode + feature
extraction + nearest-neighbor resize for non-interlaced 8-bit PNGs
AND baseline-sequential JPEGs (ITU-T T.81 SOF0/SOF1, any h/v
sampling, restart markers). Formats that genuinely require an
external codec (progressive JPEG, GIF/BMP pixels, compressed
audio/video) raise NotImplementedError at the decode call.
``mode='fake'`` remains the
deterministic sha256-derived stub whose math is reproducible in ANSI
SQL — the mode the DuckDB oracles replicate exactly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mfdb_hafro_etl_spark.session import spread_for_kernel

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.StructType(
            [
                T.StructField("mime", T.StringType()),
                T.StructField("n_bytes", T.LongType()),
                T.StructField("sha256", T.StringType()),
            ]
        )),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        # double, not float32: feature values must survive a
        # round-to-6 comparison against a double-precision SQL oracle
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_binary(df: DataFrame, id_col: str, payload_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Wrap a column as an opaque media payload with typed metadata
    (content hash computed JVM-side)."""
    content = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(content).cast("long").alias("n_bytes"),
            F.sha2(content, 256).alias("sha256"),
        ).alias("meta"),
    )


def _fake_features(data: bytes) -> list[float]:
    """Deterministic pseudo-features: 8 floats from the sha256 of the
    payload, each mapped into [0,1). Stands in for a real
    decode→embed kernel."""
    h = hashlib.sha256(data).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(FEATURE_DIM)]


def _real_features(data: bytes) -> list[float]:
    """Decoded-pixel features (PNG via stdlib zlib, baseline JPEG via
    the pure-numpy jpegcodec): dimensions, channel count, and global
    intensity statistics, each scaled into [0,1]-ish ranges.
    Deterministic integer→float math, no RNG."""
    from mfdb_hafro_etl_spark.operators import imagecodec as ic

    hdr = ic.parse_header(data)
    if hdr is None:
        raise NotImplementedError("payload is not a recognized image format")
    img = ic.decode_pixels(data).astype(np.float64)
    return [
        hdr["width"] / 4096.0,
        hdr["height"] / 4096.0,
        hdr["channels"] / 4.0,
        float(img.mean()) / 255.0,
        float(img.std()) / 255.0,
        float(img.min()) / 255.0,
        float(img.max()) / 255.0,
        float(img[..., 0].mean()) / 255.0,
    ]


def extract_features(media: DataFrame, mode: str = "fake", batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas.

    mode='fake' → deterministic sha256-derived stub features
    (see _fake_features; SQL-reproducible, oracle-verified);
    mode='real' → decoded-pixel statistics for PNG payloads
    (NotImplementedError for formats needing an external codec).
    """
    if mode not in ("fake", "real"):
        raise ValueError(f"mode={mode!r}")

    from mfdb_hafro_etl_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = _real_features if mode == "real" else _fake_features
        for pdf in batches:
            feats = [kernel(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(bytes(b)) for b in pdf["content"]],
                    "features": feats,
                }
            )

    return spread_for_kernel(media).mapInPandas(gen, schema=FEATURES_SCHEMA)


DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def decode_media_meta(media: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode image header metadata (width/height/channels) via
    Arrow-batched mapInPandas.

    mode='fake': dimensions derived deterministically from the
    payload's sha256 (width = hex[0:4] % 1024 + 16, height =
    hex[4:8] % 1024 + 16, channels = 3) — reproducible in ANSI SQL,
    so this kernel IS oracle-verifiable despite being a Python path.
    mode='real': parse the actual container header (PNG IHDR, JPEG
    SOF, GIF screen descriptor, BMP info header) via
    :func:`imagecodec.parse_header`; unrecognized payloads yield NULL
    dimensions instead of failing the batch — the filter-after-decode
    pattern a real ingest uses."""
    if mode not in ("fake", "real"):
        raise ValueError(f"mode={mode!r}")

    from mfdb_hafro_etl_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mfdb_hafro_etl_spark.operators import imagecodec as ic

        for pdf in batches:
            if mode == "real":
                hdrs = [ic.parse_header(bytes(b)) for b in pdf["content"]]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": pd.Series(
                            [h["width"] if h else None for h in hdrs], dtype="object"
                        ),
                        "height": pd.Series(
                            [h["height"] if h else None for h in hdrs], dtype="object"
                        ),
                        "channels": pd.Series(
                            [h["channels"] if h else None for h in hdrs], dtype="object"
                        ),
                    }
                )
                continue
            hexes = [hashlib.sha256(bytes(b)).hexdigest() for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [int(h[0:4], 16) % 1024 + 16 for h in hexes],
                    "height": [int(h[4:8], 16) % 1024 + 16 for h in hexes],
                    "channels": [3] * len(hexes),
                }
            )

    return spread_for_kernel(media.select("media_id", "content")).mapInPandas(gen, schema=DECODED_META_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
    ]
)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """REAL pixel decode → per-image statistics, Arrow-batched: every
    payload runs through :func:`imagecodec.decode_pixels` (PNG via
    stdlib zlib, baseline JPEG via the pure-numpy Huffman+IDCT
    jpegcodec) and reports decoded dimensions + global mean
    intensity. The mean quantizes floor(x*1e6+0.5)/1e6 so an oracle
    recomputing it from known pixel values lands on the identical
    double (uint8 sums are exact in float64; scaling num/denom by a
    power of two preserves IEEE quotients, so block-mean == pixel-
    mean bit-for-bit). Undecodable payloads raise — decode filters
    that need tolerance should header-screen with decode_media_meta
    first."""
    import math

    from mfdb_hafro_etl_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mfdb_hafro_etl_spark.operators import imagecodec as ic

        for pdf in batches:
            w_, h_, ch_, mean_ = [], [], [], []
            for b in pdf["content"]:
                img = ic.decode_pixels(bytes(b))
                h_.append(img.shape[0])
                w_.append(img.shape[1])
                ch_.append(img.shape[2])
                mean_.append(math.floor(float(img.mean()) * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w_,
                    "height": h_,
                    "channels": ch_,
                    "mean_px": mean_,
                }
            )

    return spread_for_kernel(media.select("media_id", "content")).mapInPandas(
        gen, schema=IMAGE_STATS_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_media(
    media: DataFrame, width: int, height: int, channels: int = 3, mode: str = "fake"
) -> DataFrame:
    """Resize kernel plumbing: every payload becomes a
    width×height×channels buffer via Arrow-batched mapInPandas.

    mode='fake': truncate-or-zero-pad the source bytes to the target
    buffer size — a deterministic stand-in with the exact memory
    profile of a real resize (output rows are fixed-size buffers).
    mode='real': decode PNG pixels (imagecodec.decode_png), adapt the
    channel count, nearest-neighbor resample, emit the raw buffer —
    NotImplementedError only for formats that need an external codec.
    The output byte length is an invariant (= width·height·channels)
    that tests assert."""
    if mode not in ("fake", "real"):
        raise ValueError(f"mode={mode!r}")
    n_out = width * height * channels

    from mfdb_hafro_etl_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def _real_resize(data: bytes) -> bytes:
        from mfdb_hafro_etl_spark.operators import imagecodec as ic

        img = ic.to_channels(ic.decode_pixels(data), channels)
        return ic.resize_nearest(img, width, height).tobytes()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                bufs = [_real_resize(bytes(b)) for b in pdf["content"]]
            else:
                bufs = [
                    (bytes(b)[:n_out]).ljust(n_out, b"\0") for b in pdf["content"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [width] * len(bufs),
                    "height": [height] * len(bufs),
                    "content": bufs,
                    "n_bytes": [len(b) for b in bufs],
                }
            )

    return spread_for_kernel(media.select("media_id", "content")).mapInPandas(gen, schema=RESIZED_SCHEMA)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def decode_audio_meta(media: DataFrame, mode: str = "fake") -> DataFrame:
    """Audio container metadata via Arrow-batched mapInPandas.

    mode='real': parse the actual RIFF/WAVE header
    (audiocodec.parse_wav_header — stdlib struct, no codec library);
    non-WAV payloads yield NULLs, the filter-after-decode pattern.
    mode='fake': sha256-derived fields reproducible in ANSI SQL for
    oracle verification of the plumbing."""
    if mode not in ("fake", "real"):
        raise ValueError(f"mode={mode!r}")

    from mfdb_hafro_etl_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mfdb_hafro_etl_spark.operators import audiocodec as ac

        for pdf in batches:
            if mode == "real":
                hdrs = [ac.parse_wav_header(bytes(b)) for b in pdf["content"]]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "channels": pd.Series(
                            [h["channels"] if h else None for h in hdrs], dtype="object"
                        ),
                        "sample_rate": pd.Series(
                            [h["sample_rate"] if h else None for h in hdrs],
                            dtype="object",
                        ),
                        "bits": pd.Series(
                            [h["bits"] if h else None for h in hdrs], dtype="object"
                        ),
                        "n_frames": pd.Series(
                            [h["n_frames"] if h else None for h in hdrs], dtype="object"
                        ),
                        "duration_s": pd.Series(
                            [h["duration_s"] if h else None for h in hdrs],
                            dtype="object",
                        ),
                    }
                )
                continue
            hexes = [hashlib.sha256(bytes(b)).hexdigest() for b in pdf["content"]]
            rates = [8000 * (1 + int(h[8:10], 16) % 6) for h in hexes]
            frames = [int(h[10:14], 16) for h in hexes]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "channels": [1 + int(h[0], 16) % 2 for h in hexes],
                    "sample_rate": rates,
                    "bits": [16] * len(hexes),
                    "n_frames": frames,
                    "duration_s": [round(f / r, 6) for f, r in zip(frames, rates)],
                }
            )

    return spread_for_kernel(media.select("media_id", "content")).mapInPandas(gen, schema=AUDIO_META_SCHEMA)


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("timescale", T.IntegerType()),
        T.StructField("duration", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def decode_video_meta(media: DataFrame, mode: str = "real") -> DataFrame:
    """Video container metadata via Arrow-batched mapInPandas:
    mode='real' walks the ISO BMFF box tree
    (imagecodec.parse_mp4_header — stdlib struct, no codec); non-MP4
    payloads yield NULLs. Frame decode is the part that genuinely
    needs a codec — see frame_sample_plan for the sampling side."""
    if mode != "real":
        raise ValueError(f"mode={mode!r} (video metadata has only a real path)")

    from mfdb_hafro_etl_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mfdb_hafro_etl_spark.operators import imagecodec as ic

        for pdf in batches:
            hdrs = [ic.parse_mp4_header(bytes(b)) for b in pdf["content"]]

            def col(k):
                return pd.Series(
                    [h.get(k) if h else None for h in hdrs], dtype="object"
                )

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": col("width"),
                    "height": col("height"),
                    "timescale": col("timescale"),
                    "duration": col("duration"),
                    "duration_s": col("duration_s"),
                }
            )

    return spread_for_kernel(media.select("media_id", "content")).mapInPandas(gen, schema=VIDEO_META_SCHEMA)


TAR_MEMBERS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("size", T.LongType()),
    ]
)


def enumerate_tar_members(media: DataFrame) -> DataFrame:
    """WebDataset-style shard indexing: one row per tar member with
    its name and the (offset, size) needed to range-read exactly that
    member later — Arrow-batched mapInPandas over the ustar header
    walk (archive.parse_tar_members). Non-tar payloads contribute
    zero rows (a corrupt shard yields its valid prefix)."""
    from mfdb_hafro_etl_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mfdb_hafro_etl_spark.operators import archive as ar

        for pdf in batches:
            rows = {"media_id": [], "name": [], "offset": [], "size": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                for m in ar.parse_tar_members(bytes(blob)):
                    rows["media_id"].append(mid)
                    rows["name"].append(m["name"])
                    rows["offset"].append(m["offset"])
                    rows["size"].append(m["size"])
            yield pd.DataFrame(rows)

    return spread_for_kernel(media.select("media_id", "content")).mapInPandas(
        gen, schema=TAR_MEMBERS_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video frame-sampling plumbing: emit (media_id, offset) rows for
    each sample point — the Spark-side planning of a frame extraction
    job (the decode itself is stubbed). Pure Column algebra."""
    n = F.col("meta.n_bytes")
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return media.select(
        "media_id", F.explode(offsets).alias("byte_offset")
    )

"""Pure-Python/numpy image codec for the multimodal operators.

The container has no image libraries (no PIL/opencv), but PNG needs
only ``zlib`` — which is Python stdlib — so "real" decode does not
have to be environment-blocked:

- :func:`parse_header` reads width/height/bit-depth/channels straight
  from the container format's fixed header layout (PNG IHDR, JPEG SOF
  marker walk, GIF logical screen descriptor, BMP info header). No
  codec involved — this is the fast header path real pipelines use
  for metadata extraction and size filtering.
- :func:`decode_png` is a complete decoder for non-interlaced 8-bit
  PNGs (color types 0/2/3/4/6, all five filters, PLTE lookup):
  concatenate IDAT, ``zlib.decompress``, unfilter scanline-by-scanline
  with numpy row ops.
- :func:`resize_nearest` is a numpy nearest-neighbor resample.

Deterministic by construction (no RNG, no platform-dependent float
paths — everything integer/uint8 until the caller derives features).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\x0a"

#: PNG color type → sample channels
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_header(data: bytes) -> dict | None:
    """Best-effort image header parse → dict(width, height, channels,
    format) or None when the payload is not a recognized image."""
    if len(data) >= 26 and data[:8] == PNG_SIG and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        bit_depth, color_type = data[24], data[25]
        ch = _PNG_CHANNELS.get(color_type)
        if ch is None or w == 0 or h == 0:
            return None
        return {
            "format": "png",
            "width": int(w),
            "height": int(h),
            "bit_depth": int(bit_depth),
            "color_type": int(color_type),
            "channels": ch,
        }
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        return _parse_jpeg(data)
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        if w == 0 or h == 0:
            return None
        return {"format": "gif", "width": int(w), "height": int(h), "channels": 3}
    if len(data) >= 30 and data[:2] == b"BM":
        w, h = struct.unpack("<ii", data[18:26])
        bits = struct.unpack("<H", data[28:30])[0]
        if w == 0 or h == 0 or bits == 0:
            return None
        return {
            "format": "bmp",
            "width": int(abs(w)),
            "height": int(abs(h)),
            "channels": max(1, bits // 8),
        }
    return None


def _parse_jpeg(data: bytes) -> dict | None:
    """Walk JPEG markers to the first SOF frame header."""
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        # 0xFF fill bytes may pad before any marker (spec B.1.1.2)
        while i + 1 < n and data[i + 1] == 0xFF:
            i += 1
        if i + 1 >= n:
            return None
        marker = data[i + 1]
        if marker == 0xD9:  # EOI — no frame header found
            return None
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOF
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            ch = data[i + 9] if i + 9 < n else 0
            if w == 0 or h == 0 or ch == 0:
                return None
            return {
                "format": "jpeg",
                "width": int(w),
                "height": int(h),
                "channels": int(ch),
            }
        i += 2 + seg_len
    return None


def parse_mp4_header(data: bytes) -> dict | None:
    """ISO BMFF (MP4/MOV) container metadata without a codec: walk
    the big-endian box tree to moov/mvhd (timescale, duration) and
    the first video trak/tkhd (16.16 fixed-point width/height).
    Returns dict(width, height, timescale, duration, duration_s,
    format) or None when the payload is not an MP4 container. Frame
    DECODE genuinely needs a codec and stays out of scope — this is
    the metadata fast path an ingest uses for filtering."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None

    def boxes(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            (size,) = struct.unpack(">I", data[i : i + 4])
            btype = data[i + 4 : i + 8]
            if size < 8:
                return
            yield btype, i + 8, min(i + size, hi)
            i += size

    moov = next((b for b in boxes(0, len(data)) if b[0] == b"moov"), None)
    if moov is None:
        return None
    out: dict = {"format": "mp4"}
    for btype, lo, hi in boxes(moov[1], moov[2]):
        if btype == b"mvhd" and hi - lo >= 20:
            version = data[lo]
            if version == 0:
                timescale, duration = struct.unpack(">II", data[lo + 12 : lo + 20])
            else:  # version 1: 64-bit times
                timescale = struct.unpack(">I", data[lo + 20 : lo + 24])[0]
                duration = struct.unpack(">Q", data[lo + 24 : lo + 32])[0]
            if timescale == 0:
                return None
            out["timescale"] = int(timescale)
            out["duration"] = int(duration)
            out["duration_s"] = round(duration / timescale, 6)
        elif btype == b"trak" and "width" not in out:
            tkhd = next(
                (b for b in boxes(lo, hi) if b[0] == b"tkhd"), None
            )
            if tkhd is not None and tkhd[2] - tkhd[1] >= 84:
                w_fp, h_fp = struct.unpack(
                    ">II", data[tkhd[2] - 8 : tkhd[2]]
                )
                if w_fp and h_fp:
                    out["width"] = w_fp >> 16
                    out["height"] = h_fp >> 16
    if "timescale" not in out:
        return None
    return out


def _iter_chunks(data: bytes):
    i = 8
    n = len(data)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        yield ctype, body
        i += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            break


def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG → uint8 array (h, w, channels).
    Palette images are expanded through PLTE to RGB. Raises ValueError
    on anything outside that envelope (16-bit, interlaced, truncated)."""
    hdr = parse_header(data)
    if hdr is None or hdr["format"] != "png":
        raise ValueError("not a PNG payload")
    if hdr["bit_depth"] != 8:
        raise ValueError(f"unsupported PNG bit depth {hdr['bit_depth']}")
    if len(data) > 28 and data[28] != 0:
        raise ValueError("interlaced PNG unsupported")
    w, h, ch = hdr["width"], hdr["height"], hdr["channels"]
    plte = None
    idat = bytearray()
    for ctype, body in _iter_chunks(data):
        if ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # keep the documented contract: everything outside the decode
        # envelope (incl. truncated/corrupt IDAT) raises ValueError
        raise ValueError(f"corrupt or truncated PNG pixel stream: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = filters[y]
        line = lines[y].copy()
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f == 1:  # Sub — addition mod 256 is associative, so the
            # left-to-right recurrence is a per-channel prefix sum
            rec = (
                line.reshape(w, ch).astype(np.int64).cumsum(axis=0) & 0xFF
            ).reshape(stride)
        elif f in (3, 4):  # Average / Paeth are genuinely sequential
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 3:
                    v = line[x] + ((a + b) >> 1)
                else:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                rec[x] = v & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec.astype(np.uint8)
    img = out.reshape(h, w, ch)
    if hdr["color_type"] == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        img = plte[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0 rows) for test payloads."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_pixels(data: bytes) -> np.ndarray:
    """Dispatching pixel decode → uint8 (h, w, channels) for every
    format this environment can decode without an external library:
    PNG (stdlib zlib, :func:`decode_png`) and baseline-sequential
    JPEG (pure-numpy Huffman+IDCT, :func:`jpegcodec.decode_jpeg`).
    GIF/BMP and progressive JPEG raise NotImplementedError with the
    reason; unrecognized payloads too."""
    hdr = parse_header(data)
    if hdr is None:
        raise NotImplementedError("payload is not a recognized image format")
    if hdr["format"] == "png":
        return decode_png(data)
    if hdr["format"] == "jpeg":
        from mfdb_hafro_etl_spark.operators import jpegcodec as jc

        return jc.decode_jpeg(data)
    raise NotImplementedError(
        f"{hdr['format']} pixel decode needs an external codec "
        "(PNG and baseline JPEG decode in pure Python/numpy)"
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, channels)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return img[ys][:, xs]


def to_channels(img: np.ndarray, channels: int) -> np.ndarray:
    """Adapt channel count with image semantics: alpha planes
    (gray+alpha / RGBA layouts) are coverage masks, not intensity —
    strip them before adapting color and re-add an opaque alpha when
    the target layout has one (2 or 4 channels); gray replicates to
    color; color truncates to its leading planes for narrower
    targets."""
    if img.shape[2] == channels:
        return img
    cur = img.shape[2]
    color = img[:, :, : cur - 1] if cur in (2, 4) else img
    n_color = channels - 1 if channels in (2, 4) else channels
    c = color.shape[2]
    if c < n_color:
        if c == 1:
            color = np.repeat(color, n_color, axis=2)
        else:
            pad = np.repeat(color[:, :, -1:], n_color - c, axis=2)
            color = np.concatenate([color, pad], axis=2)
    elif c > n_color:
        color = color[:, :, :n_color]
    if channels in (2, 4):
        alpha = np.full(color.shape[:2] + (1,), 255, dtype=color.dtype)
        color = np.concatenate([color, alpha], axis=2)
    return color

"""Pure-Python/numpy audio codec for the multimodal operators.

Like :mod:`.imagecodec` for images, the "real" audio path needs no
external library: RIFF/WAVE containers carry their layout in fixed
little-endian headers, and PCM payloads decode with a numpy
frombuffer. Compressed formats (MP3/AAC/OGG) genuinely need codec
libraries and stay behind NotImplementedError.

- :func:`parse_wav_header` — walk RIFF chunks to fmt/data:
  channels, sample rate, bit depth, frame count, duration.
- :func:`decode_wav` — PCM 8/16/32-bit int and 32-bit float →
  float64 array (frames, channels) in [-1, 1].
- :func:`audio_features` — deterministic summary features off the
  decoded signal (duration, rate, channels, RMS, peak,
  zero-crossing rate).
- :func:`encode_wav` — minimal PCM16 writer for test payloads.
"""

from __future__ import annotations

import struct

import numpy as np


def parse_wav_header(data: bytes) -> dict | None:
    """Best-effort RIFF/WAVE header parse → dict(channels,
    sample_rate, bits, n_frames, duration_s, format) or None when the
    payload is not a WAV container."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i, n = 12, len(data)
    fmt = None
    data_size = None
    while i + 8 <= n:
        cid = data[i : i + 4]
        (csize,) = struct.unpack("<I", data[i + 4 : i + 8])
        body_start = i + 8
        if cid == b"fmt " and body_start + 16 <= n:
            audio_fmt, channels, rate = struct.unpack(
                "<HHI", data[body_start : body_start + 8]
            )
            bits = struct.unpack("<H", data[body_start + 14 : body_start + 16])[0]
            fmt = (audio_fmt, channels, rate, bits)
        elif cid == b"data":
            data_size = csize
        # chunks are word-aligned: odd sizes carry a pad byte
        i = body_start + csize + (csize & 1)
        if fmt is not None and data_size is not None:
            break
    if fmt is None:
        return None
    audio_fmt, channels, rate, bits = fmt
    if channels == 0 or rate == 0 or bits == 0:
        return None
    if data_size is None:
        data_size = 0
    frame_bytes = channels * (bits // 8) or 1
    n_frames = data_size // frame_bytes
    return {
        "format": "wav",
        "audio_format": audio_fmt,  # 1 = PCM, 3 = IEEE float
        "channels": int(channels),
        "sample_rate": int(rate),
        "bits": int(bits),
        "n_frames": int(n_frames),
        "duration_s": round(n_frames / rate, 6),
    }


def _data_chunk(data: bytes) -> bytes:
    i, n = 12, len(data)
    while i + 8 <= n:
        cid = data[i : i + 4]
        (csize,) = struct.unpack("<I", data[i + 4 : i + 8])
        if cid == b"data":
            return data[i + 8 : i + 8 + csize]
        i = i + 8 + csize + (csize & 1)
    raise ValueError("WAV container has no data chunk")


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM/float WAV → (float64 array (frames, channels) in
    [-1, 1], sample_rate). Raises ValueError outside the PCM/float
    envelope (compressed WAV needs a codec)."""
    hdr = parse_wav_header(data)
    if hdr is None:
        raise ValueError("not a WAV payload")
    raw = _data_chunk(data)
    bits, fmt = hdr["bits"], hdr["audio_format"]
    if fmt == 1 and bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif fmt == 1 and bits == 8:  # unsigned in WAV
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif fmt == 1 and bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    elif fmt == 3 and bits == 32:
        x = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV encoding fmt={fmt} bits={bits}")
    ch = hdr["channels"]
    usable = (len(x) // ch) * ch
    return x[:usable].reshape(-1, ch), hdr["sample_rate"]


AUDIO_FEATURE_DIM = 6


def audio_features(data: bytes) -> list[float]:
    """Deterministic summary features from the decoded signal:
    [duration_s, sample_rate/48k, channels/8, rms, peak, zcr]."""
    hdr = parse_wav_header(data)
    if hdr is None:
        raise ValueError("not a WAV payload")
    sig, rate = decode_wav(data)
    mono = sig.mean(axis=1) if sig.size else np.zeros(1)
    rms = float(np.sqrt((mono * mono).mean())) if mono.size else 0.0
    peak = float(np.abs(mono).max()) if mono.size else 0.0
    zc = (
        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        if mono.size > 1
        else 0.0
    )
    return [
        hdr["duration_s"],
        rate / 48000.0,
        hdr["channels"] / 8.0,
        round(rms, 6),
        round(peak, 6),
        round(zc, 6),
    ]


def encode_wav(sig: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal PCM16 WAV writer for test payloads; sig is float in
    [-1, 1], shape (frames,) or (frames, channels)."""
    if sig.ndim == 1:
        sig = sig[:, None]
    ch = sig.shape[1]
    pcm = np.clip(np.round(sig * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

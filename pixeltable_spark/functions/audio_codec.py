"""Pure-stdlib WAV codec: REAL audio kernels without ffmpeg/PyAV.

PCM WAV (RIFF) parse/synthesize via the stdlib ``wave`` module + numpy
sample math — the subset of audio handling the engine needs from the
public RIFF/WAVE spec:

* ``probe(payload)`` — channels / sample rate / sample width / n_frames /
  duration from the WAV header.
* ``decode(payload)`` — samples as an (n_frames, channels) int numpy
  array (8/16/32-bit PCM).
* ``encode(arr, rate, width)`` — WAV writer.
* kernels: multiply_volume, fade_in/fade_out (linear ramps), normalize
  (peak to a dBFS target), clip (time range), to_mono, concat.

Compressed codecs (mp3/aac/ogg) still need ffmpeg — those paths keep
their md5 stubs in functions/audio.py.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Optional

import numpy as np

_DTYPES = {1: np.int8, 2: np.int16, 4: np.int32}


def probe(payload: bytes) -> Optional[dict]:
    """WAV header metadata, or None if not a RIFF/WAVE payload."""
    if payload is None or len(payload) < 12:
        return None
    if bytes(payload[:4]) != b"RIFF" or bytes(payload[8:12]) != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(bytes(payload))) as w:
            rate = w.getframerate()
            n = w.getnframes()
            return {
                "format": "WAV",
                "channels": w.getnchannels(),
                "sample_rate": rate,
                "sample_width": w.getsampwidth(),
                "n_frames": n,
                "duration_s": round(n / rate, 6) if rate else 0.0,
            }
    except (wave.Error, EOFError):
        return None


def decode(payload: bytes) -> tuple:
    """(samples (n_frames, channels) int array, rate, width) — raises
    ValueError outside the PCM subset."""
    info = probe(payload)
    if info is None:
        raise ValueError("not a PCM WAV payload")
    width = info["sample_width"]
    if width not in _DTYPES:
        raise ValueError(f"unsupported sample width {width}")
    with wave.open(io.BytesIO(bytes(payload))) as w:
        raw = w.readframes(w.getnframes())
    arr = np.frombuffer(raw, dtype=_DTYPES[width]).reshape(
        -1, info["channels"])
    if width == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
               ).reshape(-1, info["channels"])
    return arr.copy(), info["sample_rate"], width


def encode(arr: np.ndarray, rate: int, width: int = 2) -> bytes:
    """PCM WAV writer."""
    if arr.ndim == 1:
        arr = arr[:, None]
    if width == 1:
        data = (arr.astype(np.int16) + 128).clip(0, 255).astype(np.uint8)
    else:
        lim = 2 ** (8 * width - 1)
        data = arr.clip(-lim, lim - 1).astype(_DTYPES[width])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(data.tobytes())
    return buf.getvalue()


def _transform(payload: bytes, fn) -> bytes:
    arr, rate, width = decode(payload)
    out = fn(arr.astype(np.float64), rate, width)
    return encode(np.round(out), rate, width)


def multiply_volume(payload: bytes, factor: float) -> bytes:
    return _transform(payload, lambda a, r, w: a * factor)


def fade_in(payload: bytes, duration: float) -> bytes:
    def fn(a, rate, width):
        n = min(len(a), max(1, int(duration * rate)))
        ramp = np.linspace(0.0, 1.0, n)[:, None]
        a[:n] *= ramp
        return a
    return _transform(payload, fn)


def fade_out(payload: bytes, duration: float) -> bytes:
    def fn(a, rate, width):
        n = min(len(a), max(1, int(duration * rate)))
        a[-n:] *= np.linspace(1.0, 0.0, n)[:, None]
        return a
    return _transform(payload, fn)


def normalize(payload: bytes, target_db: float = -1.0) -> bytes:
    """Peak-normalize to target dBFS (width arrives from the single
    decode in _transform — no second parse of the payload)."""
    def fn(a, rate, width):
        full = float(2 ** (8 * width - 1) - 1)
        peak = np.abs(a).max()
        if peak == 0:
            return a
        return a * (full * (10 ** (target_db / 20.0)) / peak)
    return _transform(payload, fn)


def clip(payload: bytes, start_s: float, end_s: Optional[float] = None) -> bytes:
    arr, rate, width = decode(payload)
    i0 = max(0, int(start_s * rate))
    i1 = len(arr) if end_s is None else min(len(arr), int(end_s * rate))
    return encode(arr[i0:i1], rate, width)


def to_mono(payload: bytes) -> bytes:
    arr, rate, width = decode(payload)
    return encode(np.round(arr.mean(axis=1)), rate, width)


def concat(payloads: list) -> bytes:
    parts = [decode(p) for p in payloads]
    rate, width = parts[0][1], parts[0][2]
    if any(r != rate or w != width for _a, r, w in parts):
        raise ValueError("concat requires matching rate/width")
    return encode(np.concatenate([a for a, _r, _w in parts]), rate, width)

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
    """WAV/FLAC header metadata, or None if not recognized."""
    if payload is None or len(payload) < 12:
        return None
    if bytes(payload[:4]) == b"fLaC":
        from .flac_codec import probe_flac
        info = probe_flac(payload)
        if info is not None:
            info["sample_width"] = (info["bits_per_sample"] + 7) // 8
        return info
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
        # stdlib wave only reads PCM; fall back to the manual RIFF walk
        # for G.711 u-law/A-law (format codes 7/6)
        info = _parse_riff(payload)
        if info is None or info.get("audio_format") not in (6, 7):
            return None
        ch, rate = info["channels"], info["sample_rate"]
        n = len(info["data"]) // max(ch, 1)
        return {
            "format": "WAV",
            "encoding": "ulaw" if info["audio_format"] == 7 else "alaw",
            "channels": ch,
            "sample_rate": rate,
            "sample_width": 1,
            "n_frames": n,
            "duration_s": round(n / rate, 6) if rate else 0.0,
        }


def decode(payload: bytes) -> tuple:
    """(samples (n_frames, channels) int array, rate, width) — raises
    ValueError outside the supported subset (PCM/G.711 WAV, FLAC)."""
    info = probe(payload)
    if info is None:
        raise ValueError("not a recognized audio payload")
    if info.get("format") == "FLAC":
        from .flac_codec import decode_flac
        samples, rate, bits = decode_flac(payload)
        return samples, rate, (bits + 7) // 8
    if info.get("encoding") in ("ulaw", "alaw"):
        samples, rate = decode_g711(payload)
        return samples, rate, 2  # decoded to int16
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


# ---------------------------------------------------------------------------
# G.711 µ-law / A-law (ITU-T G.711, public) — the telephony WAV variants
# (format codes 7 / 6) the stdlib `wave` module refuses to read.
# ---------------------------------------------------------------------------

def _ulaw_table() -> np.ndarray:
    """256-entry µ-law code -> int16 sample decode table (G.711 exact)."""
    codes = np.arange(256, dtype=np.int32) ^ 0xFF
    sign = codes & 0x80
    exponent = (codes >> 4) & 0x07
    mantissa = codes & 0x0F
    sample = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return np.where(sign != 0, -sample, sample).astype(np.int16)


def _alaw_table() -> np.ndarray:
    """256-entry A-law code -> int16 sample decode table (G.711 exact)."""
    codes = np.arange(256, dtype=np.int32) ^ 0x55
    sign = codes & 0x80
    exponent = (codes >> 4) & 0x07
    mantissa = codes & 0x0F
    sample = np.where(exponent > 0,
                      ((mantissa << 4) + 0x108) << np.maximum(exponent - 1, 0),
                      (mantissa << 4) + 8)
    return np.where(sign != 0, -sample, sample).astype(np.int16)


_G711_TABLES = {7: _ulaw_table(), 6: _alaw_table()}


def _parse_riff(payload: bytes) -> Optional[dict]:
    """Minimal RIFF/WAVE chunk walk for formats `wave` cannot read:
    returns fmt fields + raw data bytes."""
    if payload is None or len(payload) < 12:
        return None
    p = bytes(payload)
    if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    pos, out = 12, {}
    while pos + 8 <= len(p):
        cid = p[pos:pos + 4]
        size = struct.unpack("<I", p[pos + 4:pos + 8])[0]
        body = p[pos + 8:pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            (fmt, ch, rate, _bps, _align, bits) = struct.unpack(
                "<HHIIHH", body[:16])
            out.update(audio_format=fmt, channels=ch, sample_rate=rate,
                       bits=bits)
        elif cid == b"data":
            out["data"] = body
        pos += 8 + size + (size & 1)
    return out if "audio_format" in out and "data" in out else None


def decode_g711(payload: bytes) -> tuple:
    """Decode a µ-law (fmt 7) or A-law (fmt 6) WAV to int16 samples:
    (samples (n, channels), rate)."""
    info = _parse_riff(payload)
    if info is None or info["audio_format"] not in _G711_TABLES:
        raise ValueError("not a G.711 (u-law/A-law) WAV payload")
    table = _G711_TABLES[info["audio_format"]]
    codes = np.frombuffer(info["data"], dtype=np.uint8)
    ch = info["channels"]
    samples = table[codes][: (len(codes) // ch) * ch].reshape(-1, ch)
    return samples.copy(), info["sample_rate"]


def encode_g711(arr: np.ndarray, rate: int, law: str = "ulaw") -> bytes:
    """Encode int16 samples as a µ-law/A-law WAV. Quantizes each sample
    to the nearest representable G.711 level (the spec's segment
    quantizer up to tie handling), so decode(encode(x)) is exact for any
    x already on the G.711 grid."""
    fmt = 7 if law == "ulaw" else 6
    table = _G711_TABLES[fmt].astype(np.int32)
    order = np.argsort(table, kind="stable")
    sorted_vals = table[order]
    if arr.ndim == 1:
        arr = arr[:, None]
    flat = arr.astype(np.int32).clip(-32768, 32767).flatten()
    idx = np.searchsorted(sorted_vals, flat)
    idx = idx.clip(1, 255)
    left, right = sorted_vals[idx - 1], sorted_vals[idx.clip(0, 255)]
    pick = np.where(np.abs(flat - left) <= np.abs(right - flat),
                    idx - 1, idx)
    codes = order[pick].astype(np.uint8)
    ch = arr.shape[1]
    data = codes.tobytes()
    hdr = b"WAVE" + b"fmt " + struct.pack("<I", 18) + struct.pack(
        "<HHIIHHH", fmt, ch, rate, rate * ch, ch, 8, 0)
    hdr += b"fact" + struct.pack("<II", 4, len(flat) // ch)
    hdr += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(hdr)) + hdr

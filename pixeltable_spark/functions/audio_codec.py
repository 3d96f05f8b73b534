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
    if bytes(payload[:3]) == b"ID3" or (
            payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0):
        # ADTS AAC shares the 0xFFEx sync; its layer bits are the
        # MPEG-audio reserved value, so probe_mp3 cleanly rejects it
        return probe_mp3(payload) or probe_adts(payload)
    if bytes(payload[4:8]) == b"ftyp":     # M4A/MP4 audio container
        from .video_codec import probe_mp4
        return probe_mp4(payload)
    if bytes(payload[:4]) == b"OggS":
        return probe_ogg(payload)
    if bytes(payload[:4]) == b"fLaC":
        from .flac_codec import probe_flac
        info = probe_flac(payload)
        if info is not None:
            info["sample_width"] = (info["bits_per_sample"] + 7) // 8
        return info
    if bytes(payload[:4]) == b"FORM" and bytes(payload[8:12]) in (b"AIFF",
                                                                  b"AIFC"):
        return probe_aiff(payload)
    if bytes(payload[:4]) == b".snd":
        info = probe_au(payload)
        if info is not None:
            info = {k: v for k, v in info.items() if not k.startswith("_")}
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
        # for G.711 u-law/A-law (codes 7/6) and IMA ADPCM (0x11)
        info = _parse_riff(payload)
        if info is None or info.get("audio_format") not in (6, 7, 0x11):
            return None
        ch, rate = info["channels"], info["sample_rate"]
        if info["audio_format"] == 0x11:
            align = info.get("block_align") or 4 * ch
            spb = (align - 4 * ch) * 2 // max(ch, 1) + 1
            n = info.get("fact_frames",
                         (len(info["data"]) // max(align, 1)) * spb)
            enc = "ima_adpcm"
        else:
            n = len(info["data"]) // max(ch, 1)
            enc = "ulaw" if info["audio_format"] == 7 else "alaw"
        return {
            "format": "WAV",
            "encoding": enc,
            "channels": ch,
            "sample_rate": rate,
            "sample_width": 1 if info["audio_format"] != 0x11 else 2,
            "n_frames": n,
            "duration_s": round(n / rate, 6) if rate else 0.0,
        }


def decode(payload: bytes) -> tuple:
    """(samples (n_frames, channels) int array, rate, width) — raises
    ValueError outside the supported subset (PCM/G.711/IMA-ADPCM WAV,
    FLAC)."""
    info = probe(payload)
    if info is None:
        raise ValueError("not a recognized audio payload")
    if info.get("format") == "MP3":
        raise ValueError(
            "MP3 decode requires a DSP codec (ffmpeg/PyAV); header "
            "metadata is available via probe()")
    if info.get("format") == "FLAC":
        from .flac_codec import decode_flac
        samples, rate, bits = decode_flac(payload)
        return samples, rate, (bits + 7) // 8
    if info.get("format") == "AIFF":
        return decode_aiff(payload)
    if info.get("format") == "AU":
        return decode_au(payload)
    if info.get("encoding") in ("ulaw", "alaw"):
        samples, rate = decode_g711(payload)
        return samples, rate, 2  # decoded to int16
    if info.get("encoding") == "ima_adpcm":
        samples, rate = decode_ima_adpcm(payload)
        n = info.get("n_frames")
        if n:
            samples = samples[:n]   # drop block padding
        return samples, rate, 2
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
            (fmt, ch, rate, _bps, align, bits) = struct.unpack(
                "<HHIIHH", body[:16])
            out.update(audio_format=fmt, channels=ch, sample_rate=rate,
                       bits=bits, block_align=align)
        elif cid == b"fact" and size >= 4:
            out["fact_frames"] = struct.unpack("<I", body[:4])[0]
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


# ---------------------------------------------------------------------------
# IMA ADPCM (WAV format tag 0x11, the DVI/IMA 4-bit coder from the public
# IMA Digital Audio compatibility spec). Block layout per the MS multimedia
# standards update: per-channel 4-byte header (int16 predictor, uint8 step
# index, reserved), then 4-byte nibble groups interleaved per channel,
# low nibble first.
# ---------------------------------------------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8,
                       -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_nibbles(codes, predictor: int, index: int):
    """Sequential IMA decode of a nibble sequence; returns int16 list."""
    out = []
    for code in codes:
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if code & 1:
            diff += step >> 2
        if code & 2:
            diff += step >> 1
        if code & 4:
            diff += step
        predictor = predictor - diff if code & 8 else predictor + diff
        predictor = max(-32768, min(32767, predictor))
        out.append(predictor)
        index = max(0, min(88, index + int(_IMA_INDEX[code])))
    return out, predictor, index


def decode_ima_adpcm(payload: bytes) -> tuple:
    """Decode an IMA ADPCM WAV (fmt 0x11) to int16: (samples (n, ch), rate)."""
    info = _parse_riff(payload)
    if info is None or info["audio_format"] != 0x11:
        raise ValueError("not an IMA ADPCM WAV payload")
    ch = info["channels"]
    align = info.get("block_align") or (4 * ch)
    data = info["data"]
    chans: list = [[] for _ in range(ch)]
    for boff in range(0, len(data) - (4 * ch) + 1, align):
        block = data[boff:boff + align]
        preds, idxs = [], []
        for c in range(ch):
            pred, idx = struct.unpack("<hBx", block[4 * c:4 * c + 4])
            chans[c].append(pred)
            preds.append(pred)
            idxs.append(max(0, min(88, idx)))
        body = block[4 * ch:]
        # nibbles come in 4-byte groups per channel, round-robin
        per_ch = [bytearray() for _ in range(ch)]
        for g in range(0, len(body) - 3, 4):
            per_ch[(g // 4) % ch] += body[g:g + 4]
        for c in range(ch):
            raw = np.frombuffer(bytes(per_ch[c]), dtype=np.uint8)
            nibbles = np.empty(raw.size * 2, dtype=np.uint8)
            nibbles[0::2] = raw & 0x0F
            nibbles[1::2] = raw >> 4
            vals, _, _ = _ima_decode_nibbles(
                nibbles.tolist(), preds[c], idxs[c])
            chans[c].extend(vals)
    n = min(len(c) for c in chans)
    samples = np.stack([np.array(c[:n], dtype=np.int16) for c in chans],
                       axis=1)
    return samples, info["sample_rate"]


def encode_ima_adpcm(arr: np.ndarray, rate: int,
                     block_align: int = 1024) -> bytes:
    """Encode int16 samples as an IMA ADPCM WAV (fmt 0x11)."""
    if arr.ndim == 1:
        arr = arr[:, None]
    arr = arr.astype(np.int32).clip(-32768, 32767)
    n, ch = arr.shape
    align = max(4 * ch + 4 * ch, block_align - block_align % (4 * ch))
    spb = (align - 4 * ch) * 2 // ch + 1   # samples per block
    blocks = bytearray()
    index = [0] * ch
    for s0 in range(0, n, spb):
        chunk = arr[s0:s0 + spb]
        hdr = bytearray()
        nibs: list = [[] for _ in range(ch)]
        for c in range(ch):
            pred = int(chunk[0, c])
            hdr += struct.pack("<hBx", pred, index[c])
            for s in chunk[1:, c].tolist():
                step = int(_IMA_STEPS[index[c]])
                diff = s - pred
                code = 0
                if diff < 0:
                    code = 8
                    diff = -diff
                if diff >= step:
                    code |= 4
                    diff -= step
                if diff >= step >> 1:
                    code |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    code |= 1
                # reconstruct exactly as the decoder will
                delta = step >> 3
                if code & 1:
                    delta += step >> 2
                if code & 2:
                    delta += step >> 1
                if code & 4:
                    delta += step
                pred = pred - delta if code & 8 else pred + delta
                pred = max(-32768, min(32767, pred))
                index[c] = max(0, min(88, index[c] + int(_IMA_INDEX[code])))
                nibs[c].append(code)
        # pad nibble streams to fill the block, round-robin 4-byte groups
        body_nibs = (align - 4 * ch) * 2
        per_ch_nibs = body_nibs // ch
        body = bytearray()
        packed = []
        for c in range(ch):
            cn = nibs[c] + [0] * (per_ch_nibs - len(nibs[c]))
            by = bytearray()
            for i in range(0, len(cn), 2):
                by.append((cn[i] & 0x0F) | ((cn[i + 1] & 0x0F) << 4))
            packed.append(by)
        for g in range(0, per_ch_nibs // 2, 4):
            for c in range(ch):
                body += packed[c][g:g + 4]
        blocks += hdr + body
    data = bytes(blocks)
    byte_rate = (rate * align + spb - 1) // spb
    hdr = b"WAVE" + b"fmt " + struct.pack("<I", 20) + struct.pack(
        "<HHIIHHHH", 0x11, ch, rate, byte_rate, align, 4, 2, spb)
    hdr += b"fact" + struct.pack("<II", 4, n)
    hdr += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(hdr)) + hdr


# ---------------------------------------------------------------------------
# Ogg container probing (public RFC 3533 page layout + the Vorbis I and
# RFC 7845 Opus identification headers). Duration comes from the last
# page's granule position; sample decode needs a DSP codec and stays
# gated.
# ---------------------------------------------------------------------------

def probe_ogg(payload: bytes) -> Optional[dict]:
    p = bytes(payload)
    if p[:4] != b"OggS" or len(p) < 28:
        return None
    meta: dict = {"format": "OGG"}
    # identification header lives in the first page's segment data
    nseg = p[26]
    body = 27 + nseg
    first = p[body:body + 64]
    pre_skip = 0
    if first.startswith(b"OpusHead") and len(first) >= 19:
        meta["encoding"] = "opus"
        meta["channels"] = first[9]
        pre_skip = struct.unpack("<H", first[10:12])[0]
        meta["input_sample_rate"] = struct.unpack("<I", first[12:16])[0]
        meta["sample_rate"] = 48000         # Opus granules run at 48 kHz
    elif first.startswith(b"\x01vorbis") and len(first) >= 16:
        meta["encoding"] = "vorbis"
        meta["channels"] = first[11]
        meta["sample_rate"] = struct.unpack("<I", first[12:16])[0]
    elif first.startswith(b"\x7fFLAC"):
        meta["encoding"] = "flac"
    else:
        meta["encoding"] = "unknown"
    # duration: granule position of the LAST page
    last = p.rfind(b"OggS")
    if last >= 0 and last + 14 <= len(p):
        granule = struct.unpack("<q", p[last + 6:last + 14])[0]
        rate = meta.get("sample_rate")
        if granule > 0 and rate:
            n = max(granule - pre_skip, 0)
            meta["n_frames"] = n
            meta["duration_s"] = round(n / rate, 6)
    return meta


# ---------------------------------------------------------------------------
# MP3: header/metadata probing (public ISO 11172-3 frame header layout +
# the Xing/Info VBR tag). Full decode genuinely needs a DSP codec and
# stays gated; duration/rate/channel metadata is real.
# ---------------------------------------------------------------------------

_MP3_BITRATES = {  # kbps by (version_group, layer): index 1..14
    ("1", 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("1", 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("2", 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
}
_MP3_RATES = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000],
              "2.5": [11025, 12000, 8000]}


def probe_mp3(payload: bytes) -> Optional[dict]:
    """MPEG audio metadata from the first frame header (+ Xing/Info VBR
    tag when present): sample rate, channels, bitrate, duration."""
    if payload is None or len(payload) < 4:
        return None
    p = bytes(payload)
    pos = 0
    tags = None
    if p[:3] == b"ID3" and len(p) > 10:  # ID3v2: parse tags, then skip
        size = ((p[6] & 0x7F) << 21) | ((p[7] & 0x7F) << 14) | \
               ((p[8] & 0x7F) << 7) | (p[9] & 0x7F)
        tags = _id3v2_tags(p[:10 + size])
        pos = 10 + size
    # find frame sync
    end = min(len(p) - 4, pos + 65536)
    while pos < end:
        if p[pos] == 0xFF and (p[pos + 1] & 0xE0) == 0xE0:
            break
        pos += 1
    else:
        return None
    h = p[pos:pos + 4]
    ver_bits = (h[1] >> 3) & 3
    version = {0: "2.5", 2: "2", 3: "1"}.get(ver_bits)
    layer = {1: 3, 2: 2, 3: 1}.get((h[1] >> 1) & 3)
    if version is None or layer is None:
        return None
    br_idx = (h[2] >> 4) & 0xF
    sr_idx = (h[2] >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    vgroup = "1" if version == "1" else "2"
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx - 1]
    rate = _MP3_RATES[version][sr_idx]
    mode = (h[3] >> 6) & 3
    channels = 1 if mode == 3 else 2
    spf = 384 if layer == 1 else (
        1152 if layer == 2 or version == "1" else 576)
    # Xing/Info VBR tag: exact frame count when present
    if version == "1":
        side = 17 if channels == 1 else 32
    else:
        side = 9 if channels == 1 else 17
    tag_off = pos + 4 + side
    n_frames = None
    if p[tag_off:tag_off + 4] in (b"Xing", b"Info") and \
            len(p) >= tag_off + 12:
        flags = int.from_bytes(p[tag_off + 4:tag_off + 8], "big")
        if flags & 1:
            n_frames = int.from_bytes(p[tag_off + 8:tag_off + 12], "big")
    if n_frames is not None:
        duration = n_frames * spf / rate
    else:  # CBR estimate from payload size
        duration = (len(p) - pos) * 8 / (bitrate * 1000)
    out = {"format": "MP3", "version": version, "layer": layer,
           "channels": channels, "sample_rate": rate,
           "bitrate_kbps": bitrate,
           "vbr": n_frames is not None,
           "n_frames": (n_frames if n_frames is not None
                        else int(duration * rate / spf)),
           "duration_s": round(duration, 3)}
    if tags:
        out["tags"] = tags
    return out


_ID3_TEXT_FRAMES = {"TIT2": "title", "TPE1": "artist", "TALB": "album",
                    "TDRC": "date", "TYER": "date", "TCON": "genre",
                    "TRCK": "track"}
_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def _id3v2_tags(tag: bytes) -> Optional[dict]:
    """Text frames from an ID3v2.3/2.4 tag (public id3.org layout)."""
    if len(tag) < 10 or tag[:3] != b"ID3":
        return None
    major = tag[3]
    pos = 10
    if tag[5] & 0x40:                      # extended header: skip it
        if len(tag) < 14:
            return None
        ext = int.from_bytes(tag[10:14], "big")
        if major == 4:                     # v2.4 ext size is syncsafe
            ext = ((tag[10] & 0x7F) << 21) | ((tag[11] & 0x7F) << 14) | \
                  ((tag[12] & 0x7F) << 7) | (tag[13] & 0x7F)
        pos += ext
    out: dict = {}
    while pos + 10 <= len(tag):
        fid = tag[pos:pos + 4]
        if not fid.strip(b"\x00"):
            break                          # padding
        raw_size = tag[pos + 4:pos + 8]
        if major == 4:                     # v2.4 frame sizes are syncsafe
            size = ((raw_size[0] & 0x7F) << 21) | \
                   ((raw_size[1] & 0x7F) << 14) | \
                   ((raw_size[2] & 0x7F) << 7) | (raw_size[3] & 0x7F)
        else:
            size = int.from_bytes(raw_size, "big")
        body = tag[pos + 10:pos + 10 + size]
        key = _ID3_TEXT_FRAMES.get(fid.decode("latin-1", "replace"))
        if key and body:
            enc = _ID3_ENCODINGS.get(body[0], "latin-1")
            try:
                text = body[1:].decode(enc, "replace").strip("\x00").strip()
            except LookupError:
                text = ""
            if text and key not in out:
                out[key] = text
        pos += 10 + size
    return out or None


# ---------------------------------------------------------------------------
# AIFF / AIFF-C (EA IFF 85 / Apple) — big-endian PCM
# ---------------------------------------------------------------------------

def _ext80_to_float(b: bytes) -> float:
    """80-bit IEEE 754 extended (the AIFF sample-rate field) -> float:
    1 sign + 15 exponent (bias 16383) + 64-bit explicit-integer mantissa."""
    sign = -1.0 if b[0] & 0x80 else 1.0
    exp = ((b[0] & 0x7F) << 8) | b[1]
    mant = int.from_bytes(b[2:10], "big")
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _float_to_ext80(x: float) -> bytes:
    if x == 0:
        return b"\x00" * 10
    sign = 0x8000 if x < 0 else 0
    x = abs(x)
    exp = 16383 + 63
    while x >= (1 << 64):
        x /= 2.0
        exp += 1
    while x < (1 << 63):
        x *= 2.0
        exp -= 1
    return struct.pack(">H", sign | exp) + int(x).to_bytes(8, "big")


def probe_aiff(payload: bytes) -> Optional[dict]:
    """AIFF/AIFC COMM metadata (no decode)."""
    p = bytes(payload)
    if len(p) < 12 or p[:4] != b"FORM" or p[8:12] not in (b"AIFF", b"AIFC"):
        return None
    pos = 12
    out = {"format": "AIFF", "compression": "NONE"}
    while pos + 8 <= len(p):
        cid = p[pos:pos + 4]
        size = struct.unpack(">I", p[pos + 4:pos + 8])[0]
        body = p[pos + 8:pos + 8 + size]
        if cid == b"COMM" and size >= 18:
            ch, nframes, bits = struct.unpack(">HIH", body[:8])
            rate = _ext80_to_float(body[8:18])
            out.update(channels=ch, n_frames=nframes,
                       sample_width=(bits + 7) // 8,
                       sample_rate=int(round(rate)),
                       duration_s=round(nframes / rate, 6) if rate else 0.0)
            if size >= 22:   # AIFC: compression fourcc
                out["compression"] = body[18:22].decode("latin-1")
        pos += 8 + size + (size & 1)
    return out if "channels" in out else None


def decode_aiff(payload: bytes) -> tuple:
    """(samples (n, ch) int16/int8, rate, width). PCM only ('NONE'/'sowt';
    compressed AIFC variants raise)."""
    info = probe_aiff(payload)
    if info is None:
        raise ValueError("not an AIFF payload")
    comp = info.get("compression", "NONE")
    if comp not in ("NONE", "sowt"):
        raise ValueError(f"compressed AIFC ({comp!r}) needs a DSP codec")
    p = bytes(payload)
    pos, data = 12, None
    while pos + 8 <= len(p):
        cid = p[pos:pos + 4]
        size = struct.unpack(">I", p[pos + 4:pos + 8])[0]
        if cid == b"SSND":
            off, _blk = struct.unpack(">II", p[pos + 8:pos + 16])
            data = p[pos + 16 + off:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if data is None:
        raise ValueError("AIFF without SSND chunk")
    width = info["sample_width"]
    ch = info["channels"]
    if width == 2:
        dt = "<i2" if comp == "sowt" else ">i2"
        arr = np.frombuffer(data, dtype=dt).astype(np.int16)
    elif width == 1:
        arr = np.frombuffer(data, dtype=np.int8).astype(np.int16)
    else:
        raise ValueError(f"unsupported AIFF sample width {width}")
    n = (len(arr) // ch) * ch
    out = arr[:n].reshape(-1, ch)
    return out[:info["n_frames"]].copy(), info["sample_rate"], width


def encode_aiff(arr: "np.ndarray", rate: int) -> bytes:
    """int16 (n, ch) -> AIFF (big-endian PCM)."""
    arr = np.asarray(arr, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    comm = struct.pack(">HIH", ch, n, 16) + _float_to_ext80(float(rate))
    ssnd = struct.pack(">II", 0, 0) + arr.astype(">i2").tobytes()
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd \
        + (b"\x00" if len(ssnd) & 1 else b"")
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks


# ---------------------------------------------------------------------------
# Sun AU / .snd — PCM / G.711 (reuses the ITU LUTs above)
# ---------------------------------------------------------------------------

_AU_ENCODINGS = {1: ("ulaw", 1), 2: ("pcm8", 1), 3: ("pcm16", 2),
                 27: ("alaw", 1)}


def probe_au(payload: bytes) -> Optional[dict]:
    p = bytes(payload)
    if len(p) < 24 or p[:4] != b".snd":
        return None
    off, size, enc, rate, ch = struct.unpack(">IIIII", p[4:24])
    if enc not in _AU_ENCODINGS or ch == 0:
        return None
    name, width = _AU_ENCODINGS[enc]
    if size == 0xFFFFFFFF:
        size = max(len(p) - off, 0)
    n = size // (width * ch)
    return {"format": "AU", "encoding": name, "channels": ch,
            "sample_rate": rate, "sample_width": width, "n_frames": n,
            "duration_s": round(n / rate, 6) if rate else 0.0,
            "_data_off": off, "_data_size": size}


def decode_au(payload: bytes) -> tuple:
    """(samples (n, ch) int16, rate, width)."""
    info = probe_au(payload)
    if info is None:
        raise ValueError("not a Sun AU payload")
    p = bytes(payload)
    data = p[info["_data_off"]:info["_data_off"] + info["_data_size"]]
    ch = info["channels"]
    enc = info["encoding"]
    if enc == "pcm16":
        arr = np.frombuffer(data, dtype=">i2").astype(np.int16)
    elif enc == "pcm8":
        arr = (np.frombuffer(data, dtype=np.int8).astype(np.int16)) << 8
    else:  # G.711: same ITU LUTs as the WAV path
        table = _G711_TABLES[7 if enc == "ulaw" else 6]
        arr = table[np.frombuffer(data, dtype=np.uint8)]
    n = (len(arr) // ch) * ch
    return arr[:n].reshape(-1, ch).copy(), info["sample_rate"], \
        info["sample_width"] if enc.startswith("pcm") else 2


def encode_au(arr: "np.ndarray", rate: int, encoding: str = "pcm16") -> bytes:
    """int16 (n, ch) -> AU. encoding: pcm16 | ulaw | alaw (G.711 nearest-
    level quantization, same mapping as encode_g711)."""
    arr = np.asarray(arr, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if encoding == "pcm16":
        enc_code, body = 3, arr.astype(">i2").tobytes()
    elif encoding in ("ulaw", "alaw"):
        fmt = 7 if encoding == "ulaw" else 6
        table = _G711_TABLES[fmt]
        idx = np.abs(arr.reshape(-1, 1).astype(np.int32)
                     - table.astype(np.int32)[None, :]).argmin(axis=1)
        enc_code = 1 if encoding == "ulaw" else 27
        body = idx.astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported AU encoding {encoding!r}")
    hdr = b".snd" + struct.pack(">IIIII", 24, len(body), enc_code,
                                int(rate), ch)
    return hdr + body


# ---------------------------------------------------------------------------
# MP3 frame toolkit: frame-accurate indexing, exact duration, and
# stream-copy segmentation (public ISO 11172-3 / 13818-3 frame layout).
#
# Full Layer III DECODE is deliberately absent: it requires the spec's
# numeric Huffman code tables and the 512-tap synthesis window, which are
# arbitrary published constants, not derivable from first principles —
# approximating them would produce silently wrong PCM, which is worse
# than the honest probe + PyAV escalation (functions/audio.py). What a
# large-scale pipeline needs BEFORE any DSP, though, is all structural:
# exact durations (VBR included, no Xing required), valid frame-boundary
# segmentation for downstream ASR chunking, and per-frame bitrate stats.
# All of that is fully spec-constructible and tested here.
# ---------------------------------------------------------------------------

def _mp3_header_at(p: bytes, pos: int) -> Optional[dict]:
    """Parse the 4-byte MPEG audio frame header at `pos`; None if it is
    not a valid header. Returns size/samples/rate/bitrate/etc."""
    if pos + 4 > len(p):
        return None
    h = p[pos:pos + 4]
    if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        return None
    version = {0: "2.5", 2: "2", 3: "1"}.get((h[1] >> 3) & 3)
    layer = {1: 3, 2: 2, 3: 1}.get((h[1] >> 1) & 3)
    if version is None or layer is None:
        return None
    br_idx = (h[2] >> 4) & 0xF
    sr_idx = (h[2] >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:  # free-format/bad: unsupported
        return None
    vgroup = "1" if version == "1" else "2"
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx - 1] * 1000
    rate = _MP3_RATES[version][sr_idx]
    padding = (h[2] >> 1) & 1
    protected = not (h[1] & 1)  # protection bit 0 -> 16-bit CRC follows
    mode = (h[3] >> 6) & 3
    channels = 1 if mode == 3 else 2
    if layer == 1:
        spf = 384
        size = (12 * bitrate // rate + padding) * 4
    elif layer == 2:
        spf = 1152
        size = 144 * bitrate // rate + padding
    else:  # layer 3
        spf = 1152 if version == "1" else 576
        size = (144 if version == "1" else 72) * bitrate // rate + padding
    return {"offset": pos, "size": size, "samples": spf, "rate": rate,
            "bitrate": bitrate, "version": version, "layer": layer,
            "channels": channels, "padding": padding,
            "protected": protected}


def _mp3_side_info_size(version: str, channels: int) -> int:
    if version == "1":
        return 17 if channels == 1 else 32
    return 9 if channels == 1 else 17


def mp3_main_data_begin(p: bytes, fr: dict) -> Optional[int]:
    """Layer III side-info `main_data_begin`: how many bytes of this
    frame's audio payload live in PREVIOUS frames' bit reservoir
    (9 bits MPEG1, 8 bits MPEG2/2.5, straight after header+optional
    CRC). 0 = the frame is self-contained — a clean split point."""
    if fr["layer"] != 3:
        return 0
    pos = fr["offset"] + 4 + (2 if fr["protected"] else 0)
    if pos + 2 > len(p):
        return None
    two = (p[pos] << 8) | p[pos + 1]
    return two >> 7 if fr["version"] == "1" else two >> 8


def mp3_frame_index(payload: bytes, max_frames: Optional[int] = None
                    ) -> list:
    """Walk every frame: [{offset, size, samples, rate, bitrate, ...}].
    Skips a leading ID3v2 tag and a trailing ID3v1 ('TAG', 128 bytes);
    false syncs are rejected by requiring the NEXT header (when in
    bounds) to parse too. Handles VBR (per-frame bitrate) exactly."""
    if payload is None or len(payload) < 4:
        return []
    p = bytes(payload)
    pos = 0
    if p[:3] == b"ID3" and len(p) > 10:
        size = ((p[6] & 0x7F) << 21) | ((p[7] & 0x7F) << 14) | \
               ((p[8] & 0x7F) << 7) | (p[9] & 0x7F)
        pos = 10 + size
    end = len(p)
    if end >= 128 and p[end - 128:end - 125] == b"TAG":
        end -= 128
    frames = []
    while pos + 4 <= end:
        fr = _mp3_header_at(p, pos)
        if fr is None:
            pos += 1  # resync byte-by-byte
            continue
        nxt = pos + fr["size"]
        if nxt + 4 <= end and _mp3_header_at(p, nxt) is None:
            pos += 1  # false sync (random 0xFFEx bytes)
            continue
        frames.append(fr)
        if max_frames is not None and len(frames) >= max_frames:
            break
        pos = nxt
    return frames


def _is_info_frame(p: bytes, fr: dict) -> bool:
    """Xing/Info/VBRI tag frame (silent metadata frame written by
    encoders) — excluded from audio duration and segmentation."""
    # the tag sits after header + optional 2-byte CRC + side info
    # (mirrors mp3_main_data_begin: a CRC-protected Xing frame would
    # otherwise go unrecognized and skew duration/VBR stats by a frame)
    off = fr["offset"] + 4 + (2 if fr["protected"] else 0) \
        + _mp3_side_info_size(fr["version"], fr["channels"])
    tag = bytes(p[off:off + 4])
    return tag in (b"Xing", b"Info") or \
        bytes(p[fr["offset"] + 36:fr["offset"] + 40]) == b"VBRI"


def mp3_duration(payload: bytes) -> float:
    """EXACT duration: sum samples/rate over indexed frames (VBR needs
    no Xing header), excluding a leading Xing/Info/VBRI tag frame."""
    p = bytes(payload)
    frames = mp3_frame_index(p)
    if frames and _is_info_frame(p, frames[0]):
        frames = frames[1:]
    return round(sum(f["samples"] / f["rate"] for f in frames), 6)


def mp3_bitrate_stats(payload: bytes) -> Optional[dict]:
    """Per-frame bitrate distribution: {n_frames, min/max/mean_kbps,
    vbr} — the CBR-vs-VBR evidence a curation pipeline filters on."""
    p = bytes(payload)
    frames = mp3_frame_index(p)
    if frames and _is_info_frame(p, frames[0]):
        frames = frames[1:]
    if not frames:
        return None
    rates = [f["bitrate"] // 1000 for f in frames]
    return {"n_frames": len(frames), "min_kbps": min(rates),
            "max_kbps": max(rates),
            "mean_kbps": round(sum(rates) / len(rates), 3),
            "vbr": len(set(rates)) > 1}


def mp3_split(payload: bytes, duration: float,
              reservoir_safe: bool = True) -> list:
    """Stream-copy segmentation at frame boundaries: returns
    [(start_time, end_time, mp3_bytes)] with each segment a valid
    standalone frame sequence of ~`duration` seconds. With
    `reservoir_safe` (Layer III), cuts only where the next frame's
    main_data_begin == 0 — frames never back-reference bytes that were
    cut away, so every segment decodes cleanly from its first frame
    (the bit-reservoir caveat that naive frame splitting ignores).
    Bytes are COPIED, never re-encoded: concatenating the segments
    reproduces the original frame stream exactly."""
    if duration <= 0:
        raise ValueError("duration must be > 0")
    p = bytes(payload)
    frames = mp3_frame_index(p)
    if frames and _is_info_frame(p, frames[0]):
        frames = frames[1:]
    if not frames:
        return []
    segs = []
    seg_start_i = 0
    t = 0.0
    seg_t0 = 0.0
    for i, f in enumerate(frames):
        t += f["samples"] / f["rate"]
        boundary_ok = (i + 1 == len(frames)
                       or not reservoir_safe
                       or frames[i + 1]["layer"] != 3
                       or mp3_main_data_begin(p, frames[i + 1]) == 0)
        if (t - seg_t0 >= duration and boundary_ok) or i + 1 == len(frames):
            lo = frames[seg_start_i]["offset"]
            hi = f["offset"] + f["size"]
            segs.append((round(seg_t0, 6), round(t, 6), p[lo:hi]))
            seg_start_i = i + 1
            seg_t0 = t
    return segs


# ---------------------------------------------------------------------------
# Ogg page toolkit (public RFC 3533): page-accurate indexing with CRC
# verification, granule-exact duration, and packet-aligned stream-copy
# segmentation. Pages are the container's seek/recovery unit, so all of
# this is structural — no Vorbis/Opus DSP required (those stay with the
# PyAV escalation, same policy as MP3/H.264).
# ---------------------------------------------------------------------------

_OGG_CRC_TABLE = None


def _ogg_crc_table():
    """CRC-32 table for the Ogg page checksum (poly 0x04c11db7,
    non-reflected, init 0, xorout 0 — RFC 3533 appendix A)."""
    global _OGG_CRC_TABLE
    if _OGG_CRC_TABLE is None:
        tab = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if (r & 0x80000000) else (r << 1)
                r &= 0xFFFFFFFF
            tab.append(r)
        _OGG_CRC_TABLE = tab
    return _OGG_CRC_TABLE


def ogg_page_crc(page: bytes) -> int:
    """Checksum of a full page with its CRC field zeroed."""
    tab = _ogg_crc_table()
    data = page[:22] + b"\x00\x00\x00\x00" + page[26:]
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ tab[((crc >> 24) & 0xFF) ^ b]
    return crc


def ogg_page_index(payload: bytes, verify_crc: bool = False) -> list:
    """Walk every page: [{offset, size, serial, seq, granule, bos, eos,
    continued, n_segments, packet_ends, crc_ok?}]. `packet_ends` is True
    when the page's last lacing value < 255 (a packet boundary ends
    here — the next non-continued page is a clean cut point). Resyncs
    byte-by-byte on garbage between pages."""
    p = bytes(payload)
    pages = []
    pos = 0
    n = len(p)
    while pos + 27 <= n:
        if p[pos:pos + 4] != b"OggS" or p[pos + 4] != 0:
            pos += 1
            continue
        hdr_type = p[pos + 5]
        granule = struct.unpack("<q", p[pos + 6:pos + 14])[0]
        serial, seq, crc = struct.unpack("<III", p[pos + 14:pos + 26])
        nseg = p[pos + 26]
        if pos + 27 + nseg > n:
            break
        lacing = p[pos + 27:pos + 27 + nseg]
        body = sum(lacing)
        size = 27 + nseg + body
        if pos + size > n:
            break
        entry = {"offset": pos, "size": size, "serial": serial,
                 "seq": seq, "granule": granule,
                 "continued": bool(hdr_type & 1),
                 "bos": bool(hdr_type & 2), "eos": bool(hdr_type & 4),
                 "n_segments": nseg,
                 "packet_ends": nseg > 0 and lacing[-1] < 255}
        if verify_crc:
            entry["crc_ok"] = ogg_page_crc(p[pos:pos + size]) == crc
        pages.append(entry)
        pos += size
    return pages


def ogg_duration(payload: bytes) -> Optional[float]:
    """Granule-exact duration from the page index (not just the last
    rfind): max granulepos of the stream, minus Opus pre-skip, over the
    codec's granule rate (Opus granules always run at 48 kHz)."""
    info = probe_ogg(payload)
    if info is None:
        return None
    return info.get("duration_s")


def ogg_split(payload: bytes, duration: float) -> list:
    """Packet-aligned stream-copy segmentation: [(t0, t1, ogg_bytes)].
    Each segment = the stream's header pages (every BOS-serial page up
    to the first audio-data page: id + comment/setup packets) + a run
    of whole data pages starting at a non-continued page, so packets
    are never torn. Page bytes are copied verbatim (CRCs stay valid);
    page sequence numbers jump across cuts, which decoders treat as a
    recoverable hole (the same contract as chained-stream tools)."""
    if duration <= 0:
        raise ValueError("duration must be > 0")
    p = bytes(payload)
    info = probe_ogg(p)
    pages = ogg_page_index(p)
    if not info or not pages:
        return []
    rate = info.get("sample_rate")
    pre_skip = 0
    if info.get("encoding") == "opus":
        body = pages[0]["offset"] + 27 + pages[0]["n_segments"]
        if p[body:body + 8] == b"OpusHead":
            pre_skip = struct.unpack("<H", p[body + 10:body + 12])[0]
    # header pages: granule 0 (id/comment/setup) before any audio data
    n_hdr = 0
    for pg in pages:
        if pg["granule"] not in (0, -1) and not pg["bos"]:
            break
        n_hdr += 1
    header = p[pages[0]["offset"]:
               pages[n_hdr - 1]["offset"] + pages[n_hdr - 1]["size"]] \
        if n_hdr else b""
    data = pages[n_hdr:]
    if not data or not rate:
        return []

    def t_of(granule):
        return max(granule - pre_skip, 0) / rate

    segs = []
    start_i = 0
    t0 = 0.0
    for i, pg in enumerate(data):
        end_t = t_of(pg["granule"]) if pg["granule"] >= 0 else t0
        next_clean = (i + 1 == len(data)
                      or not data[i + 1]["continued"])
        if ((end_t - t0 >= duration and pg["packet_ends"] and next_clean)
                or i + 1 == len(data)):
            lo = data[start_i]["offset"]
            hi = pg["offset"] + pg["size"]
            segs.append((round(t0, 6), round(end_t, 6), header + p[lo:hi]))
            start_i = i + 1
            t0 = end_t
    return segs


# ---------------------------------------------------------------------------
# ADTS (AAC) frame toolkit (public ISO/IEC 13818-7 / 14496-3 ADTS
# header layout): frame-exact indexing, duration, and stream-copy
# segmentation. Every field needed is structural — syncword, profile,
# sampling-frequency index, channel config, the 13-bit frame length,
# and raw-blocks-per-frame; AAC frames are independent (no reservoir),
# so any frame boundary is a clean cut. AAC DSP decode stays with the
# PyAV escalation (same policy as MP3/H.264/Opus).
# ---------------------------------------------------------------------------

_ADTS_RATES = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350]


def _adts_header_at(p: bytes, pos: int) -> Optional[dict]:
    if pos + 7 > len(p):
        return None
    if p[pos] != 0xFF or (p[pos + 1] & 0xF6) != 0xF0:  # sync + layer 00
        return None
    protection_absent = p[pos + 1] & 1
    sr_idx = (p[pos + 2] >> 2) & 0xF
    if sr_idx >= len(_ADTS_RATES):
        return None
    profile = ((p[pos + 2] >> 6) & 3) + 1
    channels = ((p[pos + 2] & 1) << 2) | ((p[pos + 3] >> 6) & 3)
    size = ((p[pos + 3] & 3) << 11) | (p[pos + 4] << 3) | (p[pos + 5] >> 5)
    if size < 7:
        return None
    n_blocks = (p[pos + 6] & 3) + 1   # raw data blocks, 1024 samples each
    return {"offset": pos, "size": size,
            "samples": 1024 * n_blocks,
            "rate": _ADTS_RATES[sr_idx],
            "profile": profile,        # 1=Main 2=LC 3=SSR 4=LTP
            "channels": channels,
            "crc": not protection_absent}


def adts_frame_index(payload: bytes) -> list:
    """Every ADTS frame: [{offset, size, samples, rate, profile,
    channels, crc}] — false syncs rejected by requiring the next
    header (when in bounds) to parse; skips a leading ID3v2 tag."""
    if payload is None or len(payload) < 7:
        return []
    p = bytes(payload)
    pos = 0
    if p[:3] == b"ID3" and len(p) > 10:
        size = ((p[6] & 0x7F) << 21) | ((p[7] & 0x7F) << 14) | \
               ((p[8] & 0x7F) << 7) | (p[9] & 0x7F)
        pos = 10 + size
    frames = []
    n = len(p)
    while pos + 7 <= n:
        fr = _adts_header_at(p, pos)
        if fr is None:
            pos += 1
            continue
        nxt = pos + fr["size"]
        if nxt + 7 <= n and _adts_header_at(p, nxt) is None:
            pos += 1
            continue
        frames.append(fr)
        pos = nxt
    return frames


def adts_duration(payload: bytes) -> float:
    """EXACT duration: sum samples/rate over indexed frames."""
    return round(sum(f["samples"] / f["rate"]
                     for f in adts_frame_index(payload)), 6)


def probe_adts(payload: bytes) -> Optional[dict]:
    """AAC/ADTS metadata (get_metadata surface)."""
    frames = adts_frame_index(payload)
    if not frames:
        return None
    f0 = frames[0]
    return {"format": "AAC", "container": "ADTS",
            "profile": {1: "Main", 2: "LC", 3: "SSR", 4: "LTP"}.get(
                f0["profile"], str(f0["profile"])),
            "sample_rate": f0["rate"], "channels": f0["channels"],
            "n_frames": len(frames),
            "duration_s": adts_duration(payload)}


def adts_split(payload: bytes, duration: float) -> list:
    """Stream-copy segmentation at frame boundaries:
    [(t0, t1, adts_bytes)] — every AAC frame is self-contained, so any
    boundary is clean; bytes are copied, never re-encoded."""
    if duration <= 0:
        raise ValueError("duration must be > 0")
    p = bytes(payload)
    frames = adts_frame_index(p)
    if not frames:
        return []
    segs = []
    start_i = 0
    t = 0.0
    t0 = 0.0
    for i, f in enumerate(frames):
        t += f["samples"] / f["rate"]
        if t - t0 >= duration or i + 1 == len(frames):
            lo = frames[start_i]["offset"]
            hi = f["offset"] + f["size"]
            segs.append((round(t0, 6), round(t, 6), p[lo:hi]))
            start_i = i + 1
            t0 = t
    return segs


def sinc_resample(samples: np.ndarray, sr_in: int, sr_out: int,
                  lobes: int = 3) -> np.ndarray:
    """Sample-rate conversion by windowed-sinc interpolation (Lanczos
    window, `lobes` sinc lobes) — the textbook bandlimited-resampling
    construction (Smith's resample algorithm), derivable from first
    principles with no codec tables. Downsampling widens the kernel by
    the rate ratio so content above the NEW Nyquist is attenuated
    (anti-aliasing); weights per output sample are normalized so DC is
    reproduced exactly. Edges clamp-extend. O(n_out x taps) with
    taps ~ 2*lobes*max(ratio,1)."""
    if sr_in == sr_out:
        return samples
    if sr_in <= 0 or sr_out <= 0:
        raise ValueError("sample rates must be positive")
    x = np.asarray(samples, dtype=np.float64)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n_in = x.shape[0]
    if n_in == 0:
        return samples
    scale = sr_in / sr_out
    fscale = max(scale, 1.0)
    sup = lobes * fscale
    n_out = max(1, int(round(n_in * sr_out / sr_in)))
    centers = np.arange(n_out) * scale
    k0 = np.ceil(centers - sup).astype(np.int64)
    n_taps = int(np.floor(2 * sup)) + 2
    idx = k0[:, None] + np.arange(n_taps)
    t = (centers[:, None] - idx) / fscale
    w = np.sinc(t) * np.sinc(t / lobes)
    w[np.abs(t) >= lobes] = 0.0
    norm = w.sum(axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    w /= norm
    gathered = x[idx.clip(0, n_in - 1)]          # (n_out, taps, ch)
    out = np.einsum("ot,otc->oc", w, gathered)
    if samples.dtype.kind in "iu":
        lim = np.iinfo(samples.dtype)
        out = np.rint(out).clip(lim.min, lim.max).astype(samples.dtype)
    else:
        out = out.astype(samples.dtype)
    return out[:, 0] if squeeze else out


def resample_payload(payload: bytes, target_rate: int,
                     lobes: int = 3) -> bytes:
    """Decode -> windowed-sinc rate conversion -> PCM WAV at the new
    rate (any decodable input: PCM/G.711/ADPCM WAV, FLAC, AIFF, AU)."""
    samples, rate, width = decode(payload)
    out = sinc_resample(samples, rate, int(target_rate), lobes=lobes)
    return encode(out, int(target_rate), width=max(2, width))


def spectral_features(samples: np.ndarray, rate: int,
                      rolloff_pct: float = 0.85) -> dict:
    """Magnitude-spectrum summary of a mono signal (textbook MIR
    definitions, all derivable): spectral centroid (amplitude-weighted
    mean frequency), rolloff (smallest frequency below which
    `rolloff_pct` of spectral energy lies), bandwidth (amplitude-
    weighted std around the centroid), flatness (geometric/arithmetic
    mean ratio of the power spectrum: 1 = white noise, ->0 = pure
    tone), zero-crossing rate, and rms."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = x.shape[0]
    out = {"centroid_hz": 0.0, "rolloff_hz": 0.0, "bandwidth_hz": 0.0,
           "flatness": 0.0, "zcr": 0.0, "rms": 0.0}
    if n == 0:
        return out
    out["rms"] = float(np.sqrt(np.mean(x ** 2)))
    if n > 1:
        out["zcr"] = float(np.mean(np.signbit(x[1:]) !=
                                   np.signbit(x[:-1])))
    x = x - x.mean()
    spec = np.abs(np.fft.rfft(x))
    tot = spec.sum()
    if tot <= 0:
        return out
    freqs = np.fft.rfftfreq(n, 1.0 / rate)
    c = float((freqs * spec).sum() / tot)
    out["centroid_hz"] = c
    out["rolloff_hz"] = float(
        freqs[int(np.searchsorted(np.cumsum(spec), rolloff_pct * tot))])
    out["bandwidth_hz"] = float(
        np.sqrt(((freqs - c) ** 2 * spec).sum() / tot))
    p = spec ** 2
    out["flatness"] = float(np.exp(np.mean(np.log(p + 1e-12)))
                            / (p.mean() + 1e-12))
    return out


def mel_filterbank_energies(samples: np.ndarray, rate: int,
                            n_mels: int = 20, fmin: float = 0.0,
                            fmax: Optional[float] = None) -> np.ndarray:
    """Log-energies of a triangular mel filterbank over the full-signal
    power spectrum (the standard Slaney-style construction from the
    public mel formula mel = 2595 log10(1 + f/700)); the front half of
    an MFCC pipeline, derivable end to end."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = x.shape[0]
    if n == 0:
        return np.zeros(n_mels)
    fmax = fmax or rate / 2.0
    p = np.abs(np.fft.rfft(x - x.mean())) ** 2
    freqs = np.fft.rfftfreq(n, 1.0 / rate)

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1)

    pts = from_mel(np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2))
    out = np.zeros(n_mels)
    for i in range(n_mels):
        lo, mid, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (freqs - lo) / max(mid - lo, 1e-9)
        dn = (hi - freqs) / max(hi - mid, 1e-9)
        w = np.clip(np.minimum(up, dn), 0.0, None)
        out[i] = np.log(np.dot(w, p) + 1e-10)
    return out

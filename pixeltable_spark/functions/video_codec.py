"""Pure-stdlib video codec: REAL frame kernels without ffmpeg/PyAV.

Uncompressed AVI (RIFF 'AVI ' container with 'DIB ' raw-BGR frames — the
public Microsoft RIFF/AVI layout, the same variant OpenCV writes with
fourcc 0) parsed and written with struct + numpy:

* ``probe(payload)`` — width/height/fps/n_frames/duration from avih/strf.
* ``decode(payload)`` — frames as an (n, h, w, 3) RGB uint8 array + fps.
* ``encode(frames, fps)`` — AVI writer (24-bit DIB, bottom-up, padded).
* frame kernels (compose with functions/image_codec.MiniImage for
  per-frame ops): clip, crop, resize, reverse, speed, fade in/out,
  extract_frame (PNG via image_codec), scene cut detection by mean
  absolute frame difference.

Compressed codecs (h264/vp9/mjpeg) still need ffmpeg — those payloads
fall back to the deterministic stubs in functions/video.py.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from .image_codec import MiniImage, encode_png


def probe(payload: bytes) -> Optional[dict]:
    if payload is None or len(payload) < 12:
        return None
    if bytes(payload[4:8]) == b"ftyp":
        return probe_mp4(payload)
    if bytes(payload[:4]) == b"\x1a\x45\xdf\xa3":
        return probe_ebml(payload)
    if bytes(payload[:4]) != b"RIFF" or bytes(payload[8:12]) != b"AVI ":
        return None
    meta: dict = {"format": "AVI"}

    def walk(start: int, end: int) -> None:
        pos = start
        end = min(end, len(payload))
        while pos + 8 <= end:
            fourcc = bytes(payload[pos:pos + 4])
            size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
            body = pos + 8
            # truncated chunk bodies (partial download) end the walk —
            # probe degrades to "not recognizable", never raises
            if fourcc == b"LIST":
                walk(body + 4, body + size)
            elif fourcc == b"avih" and body + 40 <= len(payload):
                (us_per_frame, _mbps, _pad, _flags, total, _init,
                 _streams, _buf, w, h) = struct.unpack(
                    "<10I", payload[body:body + 40])
                meta.update(width=w, height=h, n_frames=total,
                            fps=round(1e6 / us_per_frame, 6)
                            if us_per_frame else 0.0)
            elif fourcc == b"strh" and body + 28 <= len(payload):
                fcc_type = bytes(payload[body:body + 4])
                if fcc_type == b"vids":
                    scale, rate = struct.unpack(
                        "<II", payload[body + 20:body + 28])
                    if scale:
                        meta["fps"] = round(rate / scale, 6)
            elif (fourcc == b"strf" and "bit_count" not in meta
                  and body + 20 <= len(payload)):
                (_sz, bw, bh, _planes, bits, comp) = struct.unpack(
                    "<IiiHHI", payload[body:body + 20])
                meta.update(bit_count=bits, compression=comp)
            pos = body + size + (size & 1)

    walk(12, len(payload))
    if "width" not in meta:
        return None
    if meta.get("fps"):
        meta["duration_s"] = round(meta["n_frames"] / meta["fps"], 6)
    return meta


# ---------------------------------------------------------------------------
# ISO BMFF (MP4/M4A/MOV) metadata probing — public ISO/IEC 14496-12 box
# layout. Full frame decode genuinely needs an H.264/HEVC/AAC codec and
# stays gated; duration/dims/codec/track metadata is real.
# ---------------------------------------------------------------------------

_BMFF_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _bmff_boxes(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end)."""
    pos = start
    n = min(end, len(payload))
    while pos + 8 <= n:
        size = struct.unpack(">I", payload[pos:pos + 4])[0]
        fourcc = bytes(payload[pos + 4:pos + 8])
        body = pos + 8
        if size == 1:                      # 64-bit largesize
            if pos + 16 > n:
                return
            size = struct.unpack(">Q", payload[pos + 8:pos + 16])[0]
            body = pos + 16
        elif size == 0:                    # box extends to end of file
            size = n - pos
        if size < 8 or pos + size > n:
            return                         # truncated: degrade gracefully
        yield fourcc, body, pos + size
        pos += size


def probe_mp4(payload: bytes) -> Optional[dict]:
    """MP4/M4A/MOV metadata: brand, duration, video dims/codec, audio
    codec/rate/channels, track count. None when not ISO BMFF."""
    payload = bytes(payload)
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    meta: dict = {"format": "MP4", "n_tracks": 0,
                  "brand": payload[8:12].decode("latin-1").strip()}
    track: dict = {}

    def close_track():
        if not track:
            return
        meta["n_tracks"] += 1
        kind = track.get("handler")
        if kind == b"vide" and "video_codec" not in meta:
            for k in ("width", "height"):
                if k in track:
                    meta[k] = track[k]
            if "codec" in track:
                meta["video_codec"] = track["codec"]
            if track.get("timescale") and "duration" in track:
                meta.setdefault("duration_s", round(
                    track["duration"] / track["timescale"], 6))
        elif kind == b"soun" and "audio_codec" not in meta:
            if "codec" in track:
                meta["audio_codec"] = track["codec"]
            if track.get("timescale"):
                meta["sample_rate"] = track["timescale"]
            if "channels" in track:
                meta["channels"] = track["channels"]

    def walk(start: int, end: int) -> None:
        for fourcc, body, bend in _bmff_boxes(payload, start, end):
            if fourcc == b"trak":
                track.clear()
                walk(body, bend)
                close_track()
                track.clear()
            elif fourcc in _BMFF_CONTAINERS:
                walk(body, bend)
            elif fourcc == b"mvhd" and body + 4 <= len(payload):
                ver = payload[body]
                if ver == 1 and body + 32 <= len(payload):
                    ts, dur = struct.unpack(
                        ">IQ", payload[body + 20:body + 32])
                else:
                    ts, dur = struct.unpack(
                        ">II", payload[body + 12:body + 20])
                if ts:
                    meta["duration_s"] = round(dur / ts, 6)
            elif fourcc == b"tkhd":
                ver = payload[body]
                # width/height are the last two 16.16 values of the box
                if bend - 8 >= body and bend <= len(payload):
                    w, h = struct.unpack(">II", payload[bend - 8:bend])
                    if w and h:
                        track["width"] = w >> 16
                        track["height"] = h >> 16
                _ = ver
            elif fourcc == b"mdhd" and body + 4 <= len(payload):
                ver = payload[body]
                if ver == 1 and body + 32 <= len(payload):
                    ts, dur = struct.unpack(
                        ">IQ", payload[body + 20:body + 32])
                else:
                    ts, dur = struct.unpack(
                        ">II", payload[body + 12:body + 20])
                track["timescale"] = ts
                track["duration"] = dur
            elif fourcc == b"hdlr" and body + 12 <= len(payload):
                track["handler"] = payload[body + 8:body + 12]
            elif fourcc == b"stsd" and body + 16 <= len(payload):
                # first sample entry: u32 size + 4cc codec
                track["codec"] = payload[body + 12:body + 16].decode(
                    "latin-1").strip()
                if track.get("handler") == b"soun" and body + 34 <= len(
                        payload):
                    # AudioSampleEntry: channelcount at entry offset 16+8
                    track["channels"] = struct.unpack(
                        ">H", payload[body + 32:body + 34])[0]

    walk(0, len(payload))
    if meta["brand"].lower() in ("avif", "avis", "heic", "heix", "mif1"):
        meta["format"] = "AVIF" if meta["brand"].lower().startswith(
            "avi") else "HEIC"
        dims = _bmff_ispe_dims(payload)
        if dims:
            meta["width"], meta["height"] = dims
    return meta


def _bmff_ispe_dims(payload: bytes) -> Optional[tuple]:
    """AVIF/HEIC pixel dims from meta > iprp > ipco > ispe (14496-12 §12;
    meta is a FullBox — 4 version/flags bytes precede its children)."""
    def find(start, end, path):
        for fourcc, body, bend in _bmff_boxes(payload, start, end):
            if fourcc != path[0]:
                continue
            if fourcc == b"meta":
                body += 4                      # FullBox version/flags
            if len(path) == 1:
                return body, bend
            r = find(body, bend, path[1:])
            if r:
                return r
        return None

    loc = find(0, len(payload), [b"meta", b"iprp", b"ipco", b"ispe"])
    if loc is None:
        return None
    body, bend = loc
    if bend - body < 12:
        return None
    w, h = struct.unpack(">II", payload[body + 4:body + 12])
    return (w, h) if w and h else None


# ---------------------------------------------------------------------------
# EBML (Matroska/WebM) metadata probing — public Matroska specification.
# Frame decode needs VP8/VP9/AV1/Opus codecs and stays gated.
# ---------------------------------------------------------------------------

_EBML_CONTAINERS = {0x18538067, 0x1549A966, 0x1654AE6B, 0xAE, 0xE0, 0xE1}


def _ebml_vint(payload: bytes, pos: int, keep_marker: bool):
    """Read one EBML variable-length integer; returns (value, next_pos)."""
    if pos >= len(payload):
        return None, pos
    first = payload[pos]
    if first == 0:
        return None, pos
    length = 8 - first.bit_length() + 1
    if pos + length > len(payload):
        return None, pos
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | payload[pos + i]
    # all-ones data bits = "unknown size"
    if not keep_marker and val == (1 << (7 * length)) - 1:
        val = -1
    return val, pos + length


def probe_ebml(payload: bytes) -> Optional[dict]:
    """Matroska/WebM metadata: doctype, duration, video dims/codec, audio
    codec/rate/channels, track count."""
    payload = bytes(payload)
    if payload[:4] != b"\x1a\x45\xdf\xa3":
        return None
    meta: dict = {"format": "MKV", "n_tracks": 0}
    state = {"tscale": 1_000_000, "dur_units": None, "track": {}}

    def close_track():
        tr = state["track"]
        if not tr:
            return
        meta["n_tracks"] += 1
        if tr.get("type") == 1 and "video_codec" not in meta:
            meta.update({k: tr[k] for k in ("width", "height") if k in tr})
            if "codec" in tr:
                meta["video_codec"] = tr["codec"]
        elif tr.get("type") == 2 and "audio_codec" not in meta:
            if "codec" in tr:
                meta["audio_codec"] = tr["codec"]
            if "rate" in tr:
                meta["sample_rate"] = tr["rate"]
            if "channels" in tr:
                meta["channels"] = tr["channels"]
        state["track"] = {}

    def walk(start: int, end: int) -> None:
        pos = start
        end = min(end, len(payload))
        while pos < end:
            eid, p1 = _ebml_vint(payload, pos, keep_marker=True)
            if eid is None:
                return
            size, p2 = _ebml_vint(payload, p1, keep_marker=False)
            if size is None:
                return
            bend = end if size == -1 else min(p2 + size, end)
            body = payload[p2:bend]
            if eid == 0x1A45DFA3:              # EBML header
                walk(p2, bend)
            elif eid == 0x4282:                # DocType
                meta["doctype"] = body.rstrip(b"\x00").decode(
                    "latin-1", "replace")
                if meta["doctype"] == "webm":
                    meta["format"] = "WEBM"
            elif eid in _EBML_CONTAINERS:
                if eid == 0xAE:
                    state["track"] = {}
                walk(p2, bend)
                if eid == 0xAE:
                    close_track()
            elif eid == 0x2AD7B1:              # TimestampScale (ns)
                state["tscale"] = int.from_bytes(body, "big") or 1_000_000
            elif eid == 0x4489:                # Duration (float, scale units)
                if len(body) == 4:
                    state["dur_units"] = struct.unpack(">f", body)[0]
                elif len(body) == 8:
                    state["dur_units"] = struct.unpack(">d", body)[0]
            elif eid == 0x83:                  # TrackType
                state["track"]["type"] = int.from_bytes(body, "big")
            elif eid == 0x86:                  # CodecID
                state["track"]["codec"] = body.rstrip(b"\x00").decode(
                    "latin-1", "replace")
            elif eid == 0xB0:
                state["track"]["width"] = int.from_bytes(body, "big")
            elif eid == 0xBA:
                state["track"]["height"] = int.from_bytes(body, "big")
            elif eid == 0xB5:                  # SamplingFrequency (float)
                if len(body) == 4:
                    state["track"]["rate"] = int(struct.unpack(">f", body)[0])
                elif len(body) == 8:
                    state["track"]["rate"] = int(struct.unpack(">d", body)[0])
            elif eid == 0x9F:                  # Channels
                state["track"]["channels"] = int.from_bytes(body, "big")
            if size == -1:
                return                         # unknown-size: walked children
            pos = bend

    walk(0, len(payload))
    if state["dur_units"] is not None:
        meta["duration_s"] = round(
            state["dur_units"] * state["tscale"] / 1e9, 6)
    return meta


_MJPG = struct.unpack("<I", b"MJPG")[0]


def decode(payload: bytes) -> tuple:
    """(frames (n, h, w, 3) RGB uint8, fps) — raises ValueError outside
    the uncompressed-24-bit-DIB / MJPEG subset."""
    info = probe(payload)
    if info is None:
        raise ValueError("not an AVI payload")
    comp = info.get("compression", 0)
    is_mjpeg = comp == _MJPG
    if not is_mjpeg and (comp != 0 or info.get("bit_count", 24) != 24):
        raise ValueError(
            f"compressed AVI (fourcc {comp}) needs a real codec; "
            "uncompressed 24-bit DIB and MJPEG decode here")
    w, h = info["width"], info["height"]
    row = (w * 3 + 3) & ~3
    frames = []

    def walk(start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            fourcc = bytes(payload[pos:pos + 4])
            size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
            body = pos + 8
            if fourcc == b"LIST":
                walk(body + 4, body + size)
            elif is_mjpeg and fourcc == b"00dc" and size > 2:
                from .jpeg_codec import decode_jpeg
                arr, mode = decode_jpeg(bytes(payload[body:body + size]))
                if mode == "L":
                    arr = np.repeat(arr, 3, axis=2)
                frames.append(arr[:h, :w])
            elif not is_mjpeg and fourcc in (b"00db", b"00dc") and size >= row * h:
                raw = np.frombuffer(payload, dtype=np.uint8, count=row * h,
                                    offset=body).reshape(h, row)
                # bottom-up BGR → top-down RGB
                arr = raw[::-1, :w * 3].reshape(h, w, 3)[:, :, ::-1]
                frames.append(arr)
            pos = body + size + (size & 1)

    walk(12, len(payload))
    if not frames:
        raise ValueError("AVI contains no decodable frames")
    return np.stack(frames), info.get("fps", 30.0) or 30.0


def encode(frames: np.ndarray, fps: float = 30.0) -> bytes:
    """Write (n, h, w, 3) RGB frames as an uncompressed 24-bit AVI."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _c = frames.shape
    row = (w * 3 + 3) & ~3
    frame_size = row * h

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    us_per_frame = int(1e6 / fps) if fps else 33333
    avih = struct.pack("<10I16x", us_per_frame, frame_size * int(fps or 30),
                       0, 0x10, n, 0, 1, frame_size, w, h)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0,
                                            1000, int((fps or 30) * 1000),
                                            0, n, frame_size,
                                            0,  # dwQuality (driver default)
                                            0, 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size,
                       2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"movi"
    for f in frames:
        # top-down RGB → bottom-up BGR with padded rows
        bgr = f[::-1, :, ::-1]
        if row != w * 3:
            padded = np.zeros((h, row), dtype=np.uint8)
            padded[:, :w * 3] = bgr.reshape(h, w * 3)
            body = padded.tobytes()
        else:
            body = bgr.tobytes()
        movi_body += chunk(b"00db", body)
    riff_body = b"AVI " + hdrl + chunk(b"LIST", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def encode_mjpeg(frames: np.ndarray, fps: float = 30.0,
                 quality: int = 85) -> bytes:
    """Write (n, h, w, 3) RGB frames as an MJPEG AVI — every '00dc' chunk
    is a standalone baseline JPEG (jpeg_codec.py). ~10x smaller than DIB
    for natural content, and the variant OpenCV/ffmpeg write with fourcc
    'MJPG'."""
    from .jpeg_codec import encode_jpeg

    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _c = frames.shape

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    jpegs = [encode_jpeg(f, "RGB", quality) for f in frames]
    buf_size = max(len(j) for j in jpegs) if jpegs else 0
    us_per_frame = int(1e6 / fps) if fps else 33333
    avih = struct.pack("<10I16x", us_per_frame, buf_size * int(fps or 30),
                       0, 0x10, n, 0, 1, buf_size, w, h)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0,
                                            1000, int((fps or 30) * 1000),
                                            0, n, buf_size, 0, 0, 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, _MJPG,
                       buf_size, 2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"movi"
    for j in jpegs:
        movi_body += chunk(b"00dc", j)
    riff_body = b"AVI " + hdrl + chunk(b"LIST", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# ---------------------------------------------------------------------------
# frame kernels
# ---------------------------------------------------------------------------

def _transform(payload: bytes, fn) -> bytes:
    frames, fps = decode(payload)
    return encode(fn(frames), fps)


def clip_frames(payload: bytes, start: int, end: Optional[int] = None) -> bytes:
    frames, fps = decode(payload)
    return encode(frames[start:end if end is not None else len(frames)], fps)


def crop(payload: bytes, box: tuple) -> bytes:
    x1, y1, x2, y2 = (int(v) for v in box)
    return _transform(payload, lambda f: f[:, y1:y2, x1:x2])


def resize(payload: bytes, w: int, h: int) -> bytes:
    def fn(frames):
        return np.stack([MiniImage(f, "RGB").resize((w, h)).arr
                         for f in frames])
    return _transform(payload, fn)


def reverse(payload: bytes) -> bytes:
    return _transform(payload, lambda f: f[::-1])


def speed(payload: bytes, factor: float) -> bytes:
    """Keep every `factor`-th frame (fps unchanged → shorter video)."""
    frames, fps = decode(payload)
    idx = np.arange(0, len(frames), factor).astype(int)
    return encode(frames[idx.clip(0, len(frames) - 1)], fps)


def fade(payload: bytes, seconds: float, out: bool) -> bytes:
    frames, fps = decode(payload)
    n = min(len(frames), max(1, int(seconds * fps)))
    ramp = np.linspace(0.0, 1.0, n)
    f = frames.astype(np.float32)
    if out:
        f[-n:] *= ramp[::-1, None, None, None]
    else:
        f[:n] *= ramp[:, None, None, None]
    return encode(f.astype(np.uint8), fps)


def extract_frame(payload: bytes, frame_idx: int = 0) -> bytes:
    """One frame as PNG (composes with the image kernel surface)."""
    frames, _fps = decode(payload)
    return encode_png(frames[min(frame_idx, len(frames) - 1)], "RGB")


def scene_cuts(payload: bytes, threshold: float = 27.0) -> list:
    """Frame indices where mean absolute difference to the previous frame
    exceeds `threshold` (the content-detector rule scene-detection tools
    publish)."""
    frames, _fps = decode(payload)
    if len(frames) < 2:
        return []
    diffs = np.abs(frames[1:].astype(np.int16)
                   - frames[:-1].astype(np.int16)).mean(axis=(1, 2, 3))
    return [int(i) + 1 for i in np.nonzero(diffs > threshold)[0]]


# ---------------------------------------------------------------------------
# MP4 sample-table toolkit (public ISO/IEC 14496-12 stbl layout): the
# frame-accurate structural layer under any decode — exact per-sample
# timestamps/sizes/offsets from stts/stsz/stsc/stco(co64), keyframes
# from stss, composition offsets from ctts. This is what distributed
# video pipelines need BEFORE a codec: exact durations and fps that
# don't trust the header, keyframe-aligned segmentation for parallel
# clip extraction, and direct access-unit byte ranges for handing to a
# decoder elsewhere. (H.264/VP9 pixel decode itself stays with the PyAV
# escalation path — the entropy-coding layer is not re-derivable here.)
# ---------------------------------------------------------------------------

def _u32s(payload: bytes, pos: int, n: int) -> list:
    return list(struct.unpack(f">{n}I", payload[pos:pos + 4 * n]))


def mp4_sample_tables(payload: bytes) -> list:
    """Per-track raw sample tables: [{handler, codec, timescale,
    deltas, ctts, sizes, chunk_offsets, stsc, sync}] — every stbl box
    parsed exactly; [] when not ISO BMFF."""
    p = bytes(payload)
    if len(p) < 12 or p[4:8] != b"ftyp":
        return []
    tracks: list = []
    cur: dict = {}

    def walk(start: int, end: int) -> None:
        for fourcc, body, bend in _bmff_boxes(p, start, end):
            if fourcc == b"trak":
                cur.clear()
                walk(body, bend)
                if cur.get("sizes") is not None:
                    tracks.append(dict(cur))
                cur.clear()
            elif fourcc in _BMFF_CONTAINERS:
                walk(body, bend)
            elif fourcc == b"mdhd":
                ver = p[body]
                if ver == 1:
                    cur["timescale"] = struct.unpack(
                        ">I", p[body + 20:body + 24])[0]
                else:
                    cur["timescale"] = struct.unpack(
                        ">I", p[body + 12:body + 16])[0]
            elif fourcc == b"hdlr" and body + 12 <= len(p):
                cur["handler"] = p[body + 8:body + 12].decode("latin-1")
            elif fourcc == b"stsd" and body + 16 <= len(p):
                cur["codec"] = p[body + 12:body + 16].decode(
                    "latin-1").strip()
            elif fourcc == b"stts":
                n = struct.unpack(">I", p[body + 4:body + 8])[0]
                v = _u32s(p, body + 8, 2 * n)
                cur["deltas"] = [(v[2 * i], v[2 * i + 1])
                                 for i in range(n)]  # (count, delta)
            elif fourcc == b"ctts":
                n = struct.unpack(">I", p[body + 4:body + 8])[0]
                ver = p[body]
                raw = p[body + 8:body + 8 + 8 * n]
                fmt = ">" + ("Ii" if ver == 1 else "II") * n
                v = list(struct.unpack(fmt, raw))
                cur["ctts"] = [(v[2 * i], v[2 * i + 1]) for i in range(n)]
            elif fourcc == b"stsz":
                const, n = struct.unpack(">II", p[body + 4:body + 12])
                cur["sizes"] = ([const] * n if const
                                else _u32s(p, body + 12, n))
            elif fourcc == b"stsc":
                n = struct.unpack(">I", p[body + 4:body + 8])[0]
                v = _u32s(p, body + 8, 3 * n)
                cur["stsc"] = [(v[3 * i], v[3 * i + 1], v[3 * i + 2])
                               for i in range(n)]  # (first_chunk,
                #                      samples_per_chunk, desc_index)
            elif fourcc == b"stco":
                n = struct.unpack(">I", p[body + 4:body + 8])[0]
                cur["chunk_offsets"] = _u32s(p, body + 8, n)
            elif fourcc == b"co64":
                n = struct.unpack(">I", p[body + 4:body + 8])[0]
                cur["chunk_offsets"] = list(struct.unpack(
                    f">{n}Q", p[body + 8:body + 8 + 8 * n]))
            elif fourcc == b"stss":
                n = struct.unpack(">I", p[body + 4:body + 8])[0]
                cur["sync"] = _u32s(p, body + 8, n)  # 1-based indices

    walk(0, len(p))
    return tracks


def mp4_sample_index(payload: bytes, handler: str = "vide") -> list:
    """Flat per-sample index for the first track with `handler`:
    [{idx, dts, pts, t (dts seconds), size, offset, keyframe}].
    Offsets come from the stsc chunk map + cumulative sizes inside each
    chunk — byte-exact access-unit ranges. Without an stss box EVERY
    sample is a sync sample (spec default)."""
    for tr in mp4_sample_tables(payload):
        if tr.get("handler") != handler:
            continue
        ts = tr.get("timescale") or 1
        sizes = tr["sizes"]
        n = len(sizes)
        # expand stts -> per-sample dts
        dts, t = [], 0
        for count, delta in tr.get("deltas", []):
            for _ in range(count):
                dts.append(t)
                t += delta
        dts += [t] * (n - len(dts))
        # expand ctts -> per-sample pts offset (0 when absent)
        cto = []
        for count, off in tr.get("ctts", []):
            cto += [off] * count
        cto += [0] * (n - len(cto))
        # expand stsc chunk map -> per-sample (chunk, index-in-chunk)
        offsets = []
        chunks = tr.get("chunk_offsets", [])
        stsc = tr.get("stsc", [(1, n or 1, 1)])
        si = 0
        for ci in range(len(chunks)):
            spc = 0
            for first, per, _desc in stsc:
                if ci + 1 >= first:
                    spc = per
            pos = chunks[ci]
            for _ in range(spc):
                if si >= n:
                    break
                offsets.append(pos)
                pos += sizes[si]
                si += 1
        offsets += [None] * (n - len(offsets))
        sync = set(tr.get("sync", [])) or None
        return [{"idx": i, "dts": dts[i], "pts": dts[i] + cto[i],
                 "t": round(dts[i] / ts, 6), "size": sizes[i],
                 "offset": offsets[i],
                 "keyframe": (sync is None or (i + 1) in sync)}
                for i in range(n)]
    return []


def mp4_exact_duration(payload: bytes, handler: str = "vide") -> Optional[float]:
    """Media duration = sum of stts deltas / timescale — the
    sample-table truth, independent of the (editable) mvhd header."""
    for tr in mp4_sample_tables(payload):
        if tr.get("handler") == handler and tr.get("timescale"):
            total = sum(c * d for c, d in tr.get("deltas", []))
            return round(total / tr["timescale"], 6)
    return None


def mp4_keyframe_times(payload: bytes) -> list:
    """Seconds of every sync sample of the video track."""
    return [s["t"] for s in mp4_sample_index(payload) if s["keyframe"]]


def mp4_sample_bytes(payload: bytes, idx: int,
                     handler: str = "vide") -> Optional[bytes]:
    """The raw access-unit bytes of one sample (for handing to an
    external decoder) — None when the index is out of range or offsets
    are unresolvable."""
    samples = mp4_sample_index(payload, handler)
    if not 0 <= idx < len(samples):
        return None
    s = samples[idx]
    if s["offset"] is None:
        return None
    return bytes(payload[s["offset"]:s["offset"] + s["size"]])


def mp4_gop_segments(payload: bytes, duration: float) -> list:
    """Keyframe-aligned segmentation: [(t0, t1, first_idx, n_samples)]
    with each segment starting ON a sync sample and lasting ~duration
    seconds — the unit of parallel clip extraction (a worker can decode
    its segment independently because it starts at a keyframe)."""
    if duration <= 0:
        raise ValueError("duration must be > 0")
    samples = mp4_sample_index(payload)
    if not samples:
        return []
    total = mp4_exact_duration(payload) or (samples[-1]["t"] or 0.0)
    segs = []
    start_i = 0
    for i, s in enumerate(samples[1:], 1):
        if s["keyframe"] and s["t"] - samples[start_i]["t"] >= duration:
            segs.append((samples[start_i]["t"], s["t"],
                         start_i, i - start_i))
            start_i = i
    segs.append((samples[start_i]["t"], round(total, 6),
                 start_i, len(samples) - start_i))
    return segs


# ---------------------------------------------------------------------------
# Matroska/WebM block toolkit (public RFC 8794 EBML + the Matroska
# element registry): per-block timestamps/keyframes from Cluster/
# SimpleBlock/BlockGroup, and cluster-aligned stream-copy segmentation
# (each output re-prefixed with the EBML header + Segment Info/Tracks,
# Segment rewritten as unknown-size — the standard live-stream form).
# Same policy as MP4/MP3/Ogg: the structural layer is exact and tested;
# VP9/AV1/H.264 pixel decode stays with the PyAV escalation.
# ---------------------------------------------------------------------------

_MKV_CLUSTER = 0x1F43B675
_MKV_SEGMENT = 0x18538067
# valid Cluster children (Matroska element registry): Timestamp,
# SilentTracks, Position, PrevSize, SimpleBlock, BlockGroup, plus the
# EBML global elements CRC-32 / Void
_MKV_CLUSTER_CHILDREN = {0xE7, 0x5854, 0xA7, 0xAB, 0xA3, 0xA0, 0xBF, 0xEC}


def _mkv_cluster_end(p: bytes, child_start: int, seg_end: int) -> int:
    """True end of an UNKNOWN-size Cluster: RFC 8794 §6.2 — an
    unknown-size element ends at the first element that is not a valid
    child (in a live-captured WebM, the next Cluster's ID). Without this
    a parse of unknown-size clusters swallows every following Cluster as
    a child and silently drops their blocks."""
    q = child_start
    while q < seg_end:
        i2, q1 = _ebml_vint(p, q, keep_marker=True)
        s2, q2 = _ebml_vint(p, q1, keep_marker=False)
        if i2 is None or s2 is None:
            return seg_end
        if i2 not in _MKV_CLUSTER_CHILDREN:
            return q  # e.g. the next (possibly unknown-size) Cluster
        if s2 == -1:  # unknown-size CHILD: undefined layout, bail
            return seg_end
        q = min(q2 + s2, seg_end)
    return seg_end


def _mkv_segment_bounds(p: bytes):
    """(segment_body_start, segment_body_end, ebml_header_end) or None."""
    pos = 0
    eid, p1 = _ebml_vint(p, pos, keep_marker=True)
    if eid != 0x1A45DFA3:
        return None
    size, p2 = _ebml_vint(p, p1, keep_marker=False)
    hdr_end = p2 + size if size >= 0 else p2
    eid, p1 = _ebml_vint(p, hdr_end, keep_marker=True)
    if eid != _MKV_SEGMENT:
        return None
    size, body = _ebml_vint(p, p1, keep_marker=False)
    end = len(p) if size == -1 else min(body + size, len(p))
    return body, end, hdr_end


def _lace_frame_count(body: bytes, pos: int, flags: int) -> int:
    lacing = (flags >> 1) & 3
    if lacing == 0:
        return 1
    if pos < len(body):
        return body[pos] + 1
    return 1


def mkv_block_index(payload: bytes) -> list:
    """Every SimpleBlock/BlockGroup in every Cluster:
    [{offset, size, track, t, keyframe, n_frames}] with `t` in seconds
    (cluster timestamp + block relative, x TimestampScale). SimpleBlock
    keyframe = its flag bit; Block keyframe = BlockGroup has NO
    ReferenceBlock (spec semantics)."""
    p = bytes(payload)
    bounds = _mkv_segment_bounds(p)
    if bounds is None:
        return []
    seg_start, seg_end, _ = bounds
    tscale = 1_000_000
    blocks = []

    def block_fields(body_start: int, body_end: int):
        track, q = _ebml_vint(p, body_start, keep_marker=False)
        if track is None or q + 3 > body_end:
            return None
        rel = struct.unpack(">h", p[q:q + 2])[0]
        flags = p[q + 2]
        nf = _lace_frame_count(p, q + 3, flags)
        return track, rel, flags, nf

    pos = seg_start
    while pos < seg_end:
        eid, p1 = _ebml_vint(p, pos, keep_marker=True)
        if eid is None:
            return blocks
        size, p2 = _ebml_vint(p, p1, keep_marker=False)
        if size is None:
            return blocks
        bend = seg_end if size == -1 else min(p2 + size, seg_end)
        if eid == 0x2AD7B1 or eid == 0x1549A966:   # TimestampScale / Info
            if eid == 0x2AD7B1:
                tscale = int.from_bytes(p[p2:bend], "big") or 1_000_000
            else:
                q = p2
                while q < bend:
                    i2, q1 = _ebml_vint(p, q, keep_marker=True)
                    s2, q2 = _ebml_vint(p, q1, keep_marker=False)
                    if i2 is None or s2 is None or s2 < 0:
                        break
                    if i2 == 0x2AD7B1:
                        tscale = int.from_bytes(p[q2:q2 + s2],
                                                "big") or 1_000_000
                    q = q2 + s2
        elif eid == _MKV_CLUSTER:
            if size == -1:
                # unknown-size cluster: resolve its true end so following
                # top-level Clusters are walked as siblings, not children
                bend = _mkv_cluster_end(p, p2, seg_end)
            ctime = 0
            q = p2
            while q < bend:
                i2, q1 = _ebml_vint(p, q, keep_marker=True)
                s2, q2 = _ebml_vint(p, q1, keep_marker=False)
                if i2 is None or s2 is None:
                    break
                e2 = bend if s2 == -1 else min(q2 + s2, bend)
                if i2 == 0xE7:                     # cluster Timestamp
                    ctime = int.from_bytes(p[q2:e2], "big")
                elif i2 == 0xA3:                   # SimpleBlock
                    bf = block_fields(q2, e2)
                    if bf:
                        track, rel, flags, nf = bf
                        blocks.append({
                            "offset": q, "size": e2 - q, "track": track,
                            "t": round((ctime + rel) * tscale / 1e9, 6),
                            "keyframe": bool(flags & 0x80),
                            "n_frames": nf})
                elif i2 == 0xA0:                   # BlockGroup
                    entry = None
                    has_ref = False
                    r = q2
                    while r < e2:
                        i3, r1 = _ebml_vint(p, r, keep_marker=True)
                        s3, r2 = _ebml_vint(p, r1, keep_marker=False)
                        if i3 is None or s3 is None or s3 < 0:
                            break
                        e3 = min(r2 + s3, e2)
                        if i3 == 0xA1:             # Block
                            bf = block_fields(r2, e3)
                            if bf:
                                track, rel, flags, nf = bf
                                entry = {
                                    "offset": q, "size": e2 - q,
                                    "track": track,
                                    "t": round((ctime + rel) * tscale / 1e9,
                                               6),
                                    "n_frames": nf}
                        elif i3 == 0xFB:           # ReferenceBlock
                            has_ref = True
                        r = e3
                    if entry:
                        entry["keyframe"] = not has_ref
                        blocks.append(entry)
                if s2 == -1:
                    break
                q = e2
        if size == -1:
            # unknown-size element: children were walked in-line above
            # only for clusters; for others bail to avoid loops
            if eid != _MKV_CLUSTER:
                return blocks
            pos = bend
        else:
            pos = bend
    return blocks


def mkv_keyframe_times(payload: bytes, track: Optional[int] = None) -> list:
    return [b["t"] for b in mkv_block_index(payload)
            if b["keyframe"] and (track is None or b["track"] == track)]


def mkv_split(payload: bytes, duration: float) -> list:
    """Cluster-aligned stream-copy segmentation: [(t0, t1, mkv_bytes)].
    Each output = the original EBML header + a Segment with UNKNOWN
    size (the live-streaming form every demuxer accepts) containing the
    original pre-cluster children (Info/Tracks/...) verbatim plus a run
    of whole original clusters. Cluster bytes are never modified."""
    if duration <= 0:
        raise ValueError("duration must be > 0")
    p = bytes(payload)
    bounds = _mkv_segment_bounds(p)
    if bounds is None:
        return []
    seg_start, seg_end, hdr_end = bounds
    ebml_hdr = p[:hdr_end]
    # find clusters + the pre-cluster child region
    clusters = []   # (offset, end, start_t)
    tscale = 1_000_000
    pos = seg_start
    first_cluster = None
    while pos < seg_end:
        eid, p1 = _ebml_vint(p, pos, keep_marker=True)
        size, p2 = _ebml_vint(p, p1, keep_marker=False)
        if eid is None or size is None:
            break
        bend = seg_end if size == -1 else min(p2 + size, seg_end)
        if eid == 0x1549A966:  # Info: pull the scale for timing
            q = p2
            while q < bend:
                i2, q1 = _ebml_vint(p, q, keep_marker=True)
                s2, q2 = _ebml_vint(p, q1, keep_marker=False)
                if i2 is None or s2 is None or s2 < 0:
                    break
                if i2 == 0x2AD7B1:
                    tscale = int.from_bytes(p[q2:q2 + s2], "big") or tscale
                q = q2 + s2
        elif eid == _MKV_CLUSTER:
            if size == -1:
                # unknown-size cluster (live-captured WebM): end at the
                # first non-child element, else every later cluster lands
                # inside this one and the split emits one giant segment
                bend = _mkv_cluster_end(p, p2, seg_end)
            if first_cluster is None:
                first_cluster = pos
            ctime = 0
            q = p2
            i2, q1 = _ebml_vint(p, q, keep_marker=True)
            s2, q2 = _ebml_vint(p, q1, keep_marker=False)
            if i2 == 0xE7 and s2 and s2 > 0:
                ctime = int.from_bytes(p[q2:q2 + s2], "big")
            clusters.append((pos, bend, ctime * tscale / 1e9))
        if size == -1 and eid != _MKV_CLUSTER:
            break
        pos = bend
    if not clusters or first_cluster is None:
        return []
    pre = p[seg_start:first_cluster]   # Info/Tracks/... verbatim
    seg_hdr = b"\x18\x53\x80\x67" + b"\x01" + b"\xff" * 7  # unknown size
    header = ebml_hdr + seg_hdr + pre
    # group clusters into ~duration runs
    last_t = clusters[-1][2]
    segs = []
    start_i = 0
    for i, (off, end, t) in enumerate(clusters):
        nxt_t = clusters[i + 1][2] if i + 1 < len(clusters) else None
        t0 = clusters[start_i][2]
        if (nxt_t is not None and nxt_t - t0 >= duration) \
                or i + 1 == len(clusters):
            t1 = nxt_t if nxt_t is not None else last_t
            segs.append((round(t0, 6), round(t1, 6),
                         header + p[clusters[start_i][0]:end]))
            start_i = i + 1
    return segs


# ---------------------------------------------------------------------------
# H.264/AVC structural layer (public ISO/IEC 14496-10): NAL unit
# indexing (Annex B start codes AND AVCC length-prefixed), Exp-Golomb
# SPS parsing for REAL width/height/profile (containers routinely lie
# in tkhd), and IDR-keyframe detection. Entropy decode (CABAC/CAVLC
# pixel reconstruction) stays with the PyAV escalation — the structural
# syntax here is exact and complete for metadata purposes.
# ---------------------------------------------------------------------------

class _BitReader:
    __slots__ = ("d", "pos")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.d[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:                      # Exp-Golomb unsigned
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad Exp-Golomb")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:                      # Exp-Golomb signed
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _unescape_rbsp(data: bytes) -> bytes:
    """Strip emulation-prevention bytes (00 00 03 -> 00 00)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        if i + 2 < n and data[i] == 0 and data[i + 1] == 0 \
                and data[i + 2] == 3:
            out += data[i:i + 2]
            i += 3
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


def h264_parse_sps(nal: bytes) -> Optional[dict]:
    """Decode an SPS NAL (type 7) per 14496-10 §7.3.2.1: profile/level,
    chroma format, exact coded dimensions including frame cropping."""
    if not nal or (nal[0] & 0x1F) != 7:
        return None
    try:
        r = _BitReader(_unescape_rbsp(nal[1:]))
        profile_idc = r.u(8)
        r.u(8)                                 # constraint flags + reserved
        level_idc = r.u(8)
        r.ue()                                 # seq_parameter_set_id
        chroma_format_idc = 1
        if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128,
                           138, 139, 134, 135):
            chroma_format_idc = r.ue()
            if chroma_format_idc == 3:
                r.u(1)                         # separate_colour_plane
            r.ue()                             # bit_depth_luma_minus8
            r.ue()                             # bit_depth_chroma_minus8
            r.u(1)                             # qpprime_y_zero...
            if r.u(1):                         # seq_scaling_matrix_present
                for i in range(8 if chroma_format_idc != 3 else 12):
                    if r.u(1):                 # scaling list present
                        size = 16 if i < 6 else 64
                        last, nxt = 8, 8
                        for _ in range(size):
                            if nxt:
                                nxt = (last + r.se() + 256) % 256
                            last = nxt if nxt else last
        r.ue()                                 # log2_max_frame_num_minus4
        poc_type = r.ue()
        if poc_type == 0:
            r.ue()
        elif poc_type == 1:
            r.u(1)
            r.se()
            r.se()
            for _ in range(r.ue()):
                r.se()
        r.ue()                                 # max_num_ref_frames
        r.u(1)                                 # gaps_in_frame_num
        w_mbs = r.ue() + 1
        h_map = r.ue() + 1
        frame_mbs_only = r.u(1)
        if not frame_mbs_only:
            r.u(1)                             # mb_adaptive_frame_field
        r.u(1)                                 # direct_8x8_inference
        crop = [0, 0, 0, 0]
        if r.u(1):                             # frame_cropping_flag
            crop = [r.ue(), r.ue(), r.ue(), r.ue()]
        # crop units per 7-19..7-22
        sub_w = 2 if chroma_format_idc in (1, 2) else 1
        sub_h = 2 if chroma_format_idc == 1 else 1
        unit_y = sub_h * (2 - frame_mbs_only)
        width = w_mbs * 16 - sub_w * (crop[0] + crop[1])
        height = (2 - frame_mbs_only) * h_map * 16 - unit_y * (crop[2]
                                                               + crop[3])
        return {"profile_idc": profile_idc, "level_idc": level_idc,
                "chroma_format_idc": chroma_format_idc,
                "width": width, "height": height,
                "interlaced": not frame_mbs_only}
    except (IndexError, ValueError):
        return None


def h264_nal_units(payload: bytes, length_size: Optional[int] = None
                   ) -> list:
    """NAL unit index: [{offset, size, type, idr}]. Annex B start-code
    streams by default; pass `length_size` (1/2/4, from avcC) for AVCC
    length-prefixed sample data. Type 5 = IDR slice (keyframe)."""
    p = bytes(payload)
    out = []
    if length_size:
        pos = 0
        while pos + length_size <= len(p):
            n = int.from_bytes(p[pos:pos + length_size], "big")
            body = pos + length_size
            if n == 0 or body + n > len(p):
                break
            t = p[body] & 0x1F
            out.append({"offset": body, "size": n, "type": t,
                        "idr": t == 5})
            pos = body + n
        return out
    i = 0
    n = len(p)
    starts = []  # (payload_start, start_code_start)
    while i + 3 <= n:
        if p[i] == 0 and p[i + 1] == 0:
            if p[i + 2] == 1:
                starts.append((i + 3, i))
                i += 3
                continue
            if i + 4 <= n and p[i + 2] == 0 and p[i + 3] == 1:
                starts.append((i + 4, i))
                i += 4
                continue
        i += 1
    for k, (s, _cs) in enumerate(starts):
        # a NAL ends exactly where the NEXT start code begins — stripping
        # only the code's own bytes preserves legitimate
        # trailing_zero_8bits / cabac_zero_words that belong to this NAL
        e = starts[k + 1][1] if k + 1 < len(starts) else n
        t = p[s] & 0x1F
        out.append({"offset": s, "size": e - s, "type": t, "idr": t == 5})
    return out


def h264_stream_info(payload: bytes, length_size: Optional[int] = None
                     ) -> Optional[dict]:
    """Stream-level metadata from the first SPS: dims/profile/level +
    NAL/IDR counts."""
    nals = h264_nal_units(payload, length_size)
    if not nals:
        return None
    info = {"n_nals": len(nals),
            "n_idr": sum(1 for x in nals if x["idr"])}
    p = bytes(payload)
    for x in nals:
        if x["type"] == 7:
            sps = h264_parse_sps(p[x["offset"]:x["offset"] + x["size"]])
            if sps:
                info.update(sps)
                break
    return info


def mp4_avc_config(payload: bytes) -> Optional[dict]:
    """SPS-true video metadata for an MP4 whose track is avc1: find the
    avcC box (stsd sample entry extension), parse its first SPS, and
    return dims/profile + the NAL length size used by sample data —
    the container's tkhd width/height can disagree; the SPS is the
    bitstream truth."""
    p = bytes(payload)
    i = p.find(b"avcC")
    if i < 0 or i + 12 > len(p):
        return None
    body = i + 4
    if p[body] != 1:                           # configurationVersion
        return None
    length_size = (p[body + 4] & 3) + 1
    n_sps = p[body + 5] & 0x1F
    pos = body + 6
    for _ in range(n_sps):
        if pos + 2 > len(p):
            return None
        ln = struct.unpack(">H", p[pos:pos + 2])[0]
        sps = h264_parse_sps(p[pos + 2:pos + 2 + ln])
        if sps:
            sps["nal_length_size"] = length_size
            return sps
        pos += 2 + ln
    return None

"""Video functions (reference functions/video/editing.py:25-811,
iterators.py frame_iterator).

Videos are by-reference path strings / binary payloads; frame extraction
is the component-view pattern (explode via mapInPandas). Uncompressed AVI
payloads get REAL frame kernels via the pure-stdlib codec
(functions/video_codec.py: RIFF/AVI container + numpy frame math) —
metadata, clip, crop, resize, reverse, speed, fades, frame extraction,
crossfade transitions, image overlay, scene detection, segmentation, and
make_video (frames → AVI). Compressed codecs (h264/vp9) need ffmpeg/PyAV
(absent here); those payloads keep the deterministic md5 stubs, so every
pipeline stage stays runnable and testable offline.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import video_codec as _vc

try:  # pragma: no cover
    import av  # noqa: F401
    HAS_AV = True
except ImportError:
    HAS_AV = False


def _load_av():
    """Lazy PyAV lookup — resolved per call (cheap: module cache hit)
    so an interpreter that gains PyAV after import, or a test injecting
    a fake into sys.modules, is picked up."""
    try:
        import av as _av
        return _av
    except ImportError:
        return None


def probe_any(payload) -> "dict | None":
    """The codec narrow waist for container metadata: full-fidelity
    stdlib probe for AVI (frame-accurate, no dependencies); for
    compressed containers (MP4/EBML/Ogg) the stdlib probe_* parsers
    provide header metadata, ESCALATED to PyAV automatically when it is
    importable (the reference's decode path, functions/video/
    editing.py:25-811 via av.open) — PyAV sees through codecs the
    stdlib probes cannot (h264/vp9 stream dims, exact duration)."""
    info = _vc.probe(payload)
    if info is not None and info.get("format") == "AVI":
        return info  # stdlib path is already full-fidelity for AVI
    av_mod = _load_av()
    if av_mod is not None:
        try:
            import io as _io
            with av_mod.open(_io.BytesIO(bytes(payload))) as c:
                out = {"format": getattr(getattr(c, "format", None),
                                         "name", "unknown"),
                       "via": "pyav"}
                vs = next((s for s in getattr(c, "streams", [])
                           if getattr(s, "type", None) == "video"), None)
                if vs is not None:
                    for attr in ("width", "height", "frames"):
                        v = getattr(vs, attr, None)
                        if v:
                            out["n_frames" if attr == "frames"
                                else attr] = int(v)
                    rate = getattr(vs, "average_rate", None)
                    if rate:
                        out["fps"] = float(rate)
                dur = getattr(c, "duration", None)
                if dur:
                    out["duration"] = float(dur) / 1_000_000.0
                return out
        except Exception:  # noqa: BLE001 — fall back to the probe
            pass
    # MP4 without PyAV: enrich the header probe with sample-table truth
    # (ISO 14496-12 stts/stsz/stss — exact, codec-independent)
    if info is not None and info.get("format") == "MP4":
        try:
            samples = _vc.mp4_sample_index(payload)
        except Exception:  # noqa: BLE001 — malformed stbl: header only
            samples = []
        if samples:
            dur = _vc.mp4_exact_duration(payload)
            info["n_frames"] = len(samples)
            info["n_keyframes"] = sum(1 for s in samples if s["keyframe"])
            if dur:
                info["duration_s"] = dur
                info["fps"] = round(len(samples) / dur, 6)
        if info.get("video_codec") == "avc1":
            # SPS-true dimensions: the tkhd width/height is an editable
            # presentation hint; the avcC SPS is the bitstream truth
            cfg = _vc.mp4_avc_config(payload)
            if cfg:
                info["width"] = cfg["width"]
                info["height"] = cfg["height"]
                info["h264_profile_idc"] = cfg["profile_idc"]
    return info


def keyframe_index(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """Per-sample structural index of MP4 payloads: one row per sample
    with (idx, t, size, keyframe) from the ISO 14496-12 sample tables —
    the unit of keyframe-aligned parallel clip extraction. Narrow
    mapInPandas: a video's rows never leave its scan partition; non-MP4
    payloads contribute no rows."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("idx", T.LongType()),
        T.StructField("t", T.DoubleType()),
        T.StructField("size", T.LongType()),
        T.StructField("keyframe", T.BooleanType()),
    ])
    cols = [id_col, "idx", "t", "size", "keyframe"]

    def op(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                p = r[payload_col]
                if p is None:
                    continue
                for s in _vc.mp4_sample_index(bytes(p)):
                    rows.append({id_col: r[id_col], "idx": s["idx"],
                                 "t": s["t"], "size": s["size"],
                                 "keyframe": s["keyframe"]})
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(op, out_schema)


def frame_iterator(df: DataFrame, every_n: int = 30,
                   payload_col: str = "payload",
                   id_col: str = "media_id",
                   fps: "float | None" = None,
                   num_frames: "int | None" = None) -> DataFrame:
    """Explode videos into frame rows (reference
    functions/video/iterators.py FrameIterator; drives component views).
    `fps` extracts at a target rate, `num_frames` evenly spaces an exact
    count, default strides every_n. Real PNG frames for uncompressed AVI;
    the deterministic stub for payloads needing ffmpeg."""
    from ..operators.multimodal import sample_video_frames
    return sample_video_frames(df, every_n=every_n, binary_col=payload_col,
                               id_col=id_col, fps=fps, num_frames=num_frames)


def get_metadata(col: Column) -> Column:
    """Container metadata: real AVI header fields (width/height/fps/
    n_frames/duration) when the payload is RIFF/AVI, stdlib header
    probes for MP4/EBML/Ogg (escalated through PyAV when installed —
    see probe_any), byte-level info otherwise."""
    @F.pandas_udf(T.StringType())
    def fn(s):
        import json
        out = []
        for p in s:
            if p is None:
                out.append(None)
                continue
            info = probe_any(p)
            if info is None:
                info = {"n_bytes": len(p),
                        "magic": bytes(p[:4]).hex().upper()}
            else:
                info["n_bytes"] = len(p)
            out.append(json.dumps(info, sort_keys=True))
        return pd.Series(out)
    return fn(col)


def clip(df: DataFrame, start_frame: int, end_frame: int,
         payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Select a frame range from the exploded frame stream — composition of
    frame_iterator + filter (reference editing.py clip), codec-free."""
    frames = frame_iterator(df, every_n=1, payload_col=payload_col, id_col=id_col)
    return frames.filter(
        (F.col("frame_idx") >= start_frame) & (F.col("frame_idx") < end_frame))


def _video_transform_udf(name: str, real_fn=None):
    """Payload->payload edit (reference functions/video/editing.py and
    filters.py). Real kernel for uncompressed AVI via video_codec; the
    deterministic stub for compressed payloads keeps every pipeline stage
    — schema, Arrow batching, null handling — runnable offline."""
    @F.pandas_udf(T.BinaryType())
    def fn(s):
        out = []
        for p in s:
            if p is None:
                out.append(None)
                continue
            if real_fn is not None:
                try:
                    out.append(real_fn(bytes(p)))
                    continue
                except Exception:  # noqa: BLE001 — not uncompressed AVI
                    pass
            out.append(hashlib.md5(p + name.encode()).digest())
        return pd.Series(out)
    return fn


def crop(col: Column, box: tuple) -> Column:
    return _video_transform_udf(f"crop{box}",
                                lambda p: _vc.crop(p, box))(col)


def resize(col: Column, w: int, h: int) -> Column:
    return _video_transform_udf(f"resize{w}x{h}",
                                lambda p: _vc.resize(p, w, h))(col)


def reverse(col: Column) -> Column:
    return _video_transform_udf("reverse", _vc.reverse)(col)


def fade_in(col: Column, seconds: float = 1.0) -> Column:
    return _video_transform_udf(
        f"fade_in{seconds}", lambda p: _vc.fade(p, seconds, out=False))(col)


def fade_out(col: Column, seconds: float = 1.0) -> Column:
    return _video_transform_udf(
        f"fade_out{seconds}", lambda p: _vc.fade(p, seconds, out=True))(col)


def speed(col: Column, factor: float) -> Column:
    return _video_transform_udf(f"speed{factor}",
                                lambda p: _vc.speed(p, factor))(col)


def clip_frames(col: Column, start: int, end: int) -> Column:
    """Frame-range clip as a payload transform (reference editing.py clip)."""
    return _video_transform_udf(
        f"clip{start}-{end}", lambda p: _vc.clip_frames(p, start, end))(col)


def overlay_text(col: Column, text: str, x: int = 0, y: int = 0) -> Column:
    """Text overlay needs font rasterization (PIL/ffmpeg) — stub only."""
    return _video_transform_udf(f"overlay_text{text}@{x},{y}")(col)


def extract_frame(col: Column, frame_idx: int = 0) -> Column:
    """Single-frame grab as a PNG image payload (reference editing.py
    extract_frame) — composes with the image-function surface."""
    return _video_transform_udf(
        f"extract_frame{frame_idx}",
        lambda p: _vc.extract_frame(p, frame_idx))(col)


def extract_audio(col: Column) -> Column:
    """Demux the audio track (reference editing.py extract_audio);
    uncompressed-AVI payloads here carry no audio stream — stub."""
    return _video_transform_udf("extract_audio")(col)


def _video_binary_udf(name: str, real_fn=None):
    @F.pandas_udf(T.BinaryType())
    def fn(a, b):
        out = []
        for p, q in zip(a, b):
            if p is None or q is None:
                out.append(None)
                continue
            if real_fn is not None:
                try:
                    out.append(real_fn(bytes(p), bytes(q)))
                    continue
                except Exception:  # noqa: BLE001
                    pass
            out.append(hashlib.md5(p + q + name.encode()).digest())
        return pd.Series(out)
    return fn


def with_audio(video: Column, audio: Column) -> Column:
    return _video_binary_udf("with_audio")(video, audio)


def mix_audio(video: Column, audio: Column, volume: float = 1.0) -> Column:
    return _video_binary_udf(f"mix_audio{volume}")(video, audio)


def _overlay_image_real(x: int, y: int):
    def fn(video: bytes, image: bytes) -> bytes:
        import numpy as np
        from .image_codec import decode as img_decode
        frames, fps = _vc.decode(video)
        img = img_decode(image).convert("RGB").arr
        h, w = img.shape[:2]
        out = frames.copy()
        out[:, y:y + h, x:x + w] = img[:max(0, min(h, out.shape[1] - y)),
                                       :max(0, min(w, out.shape[2] - x))]
        return _vc.encode(out, fps)
    return fn


def overlay_image(video: Column, image: Column, x: int = 0, y: int = 0) -> Column:
    return _video_binary_udf(f"overlay_image{x},{y}",
                             _overlay_image_real(x, y))(video, image)


def _crossfade_real(seconds: float):
    def fn(pa: bytes, pb: bytes) -> bytes:
        import numpy as np
        fa, fps = _vc.decode(pa)
        fb, _fps2 = _vc.decode(pb)
        n = max(1, int(seconds * fps))
        n = min(n, len(fa), len(fb))
        ramp = np.linspace(0.0, 1.0, n)[:, None, None, None]
        mix = (fa[-n:].astype(np.float32) * (1 - ramp)
               + fb[:n].astype(np.float32) * ramp).astype(np.uint8)
        return _vc.encode(
            np.concatenate([fa[:-n], mix, fb[n:]]), fps)
    return fn


def transition(a: Column, b: Column, kind: str = "crossfade",
               seconds: float = 1.0) -> Column:
    real = _crossfade_real(seconds) if kind == "crossfade" else None
    return _video_binary_udf(f"transition{kind}{seconds}", real)(a, b)


def get_duration(col: Column) -> Column:
    """Duration in seconds: real from the AVI header; the byte-model
    estimate (1 frame per 256 bytes at 30 fps, matching the frame stub)
    for payloads needing ffmpeg."""
    @F.pandas_udf(T.DoubleType())
    def fn(s):
        out = []
        for p in s:
            if p is None:
                out.append(None)
                continue
            info = _vc.probe(p)
            if info is not None and "duration_s" in info:
                out.append(float(info["duration_s"]))
            else:
                out.append(max(1.0, len(p) / 256) / 30.0)
        return pd.Series(out)
    return fn(col)


def scene_detect(col: Column, threshold: float = 27.0) -> Column:
    """Scene-cut frame indices (reference functions/video/scene_detect.py):
    real mean-absolute-frame-difference detection for AVI; deterministic
    stub positions otherwise."""
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def fn(s):
        def cuts(p):
            if p is None:
                return None
            try:
                return _vc.scene_cuts(bytes(p), threshold)
            except Exception:  # noqa: BLE001
                n_frames = max(1, len(p) // 256)
                h = hashlib.md5(bytes(p)).digest()
                return sorted({h[i] % n_frames for i in range(4)})
        return s.map(cuts)
    return fn(col)


def segment_video(df: DataFrame, n_segments: int = 4,
                  payload_col: str = "payload",
                  id_col: str = "media_id") -> DataFrame:
    """Explode each video into N segment rows (reference editing.py
    segment_video) — UDTF shape over mapInPandas, a narrow transformation.
    AVI payloads yield REAL sub-videos (frame-range re-encodes)."""
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("segment_idx", T.IntegerType()),
        T.StructField("segment", T.BinaryType()),
    ])

    def op(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                p = r[payload_col]
                if p is None:
                    continue
                try:
                    frames, fps = _vc.decode(bytes(p))
                    step = max(1, len(frames) // n_segments)
                    for i in range(n_segments):
                        part = frames[i * step:(i + 1) * step]
                        if len(part) == 0:
                            break
                        rows.append({id_col: r[id_col], "segment_idx": i,
                                     "segment": _vc.encode(part, fps)})
                    continue
                except Exception:  # noqa: BLE001
                    pass
                step = max(1, len(p) // n_segments)
                for i in range(n_segments):
                    chunk = p[i * step:(i + 1) * step]
                    if not chunk:
                        break
                    rows.append({id_col: r[id_col], "segment_idx": i,
                                 "segment": hashlib.md5(chunk).digest()})
            yield pd.DataFrame(rows, columns=[id_col, "segment_idx", "segment"])

    return df.mapInPandas(op, out_schema)


def make_video(df: DataFrame, group_col: str, frame_col: str = "frame",
               order_col: str = "frame_idx") -> DataFrame:
    """Frames -> one video per group: the reference's make_video /
    concat_videos_agg media AGGREGATOR (functions/video/editing.py:25,658)
    as applyInPandas. PNG frames of equal dims encode to a REAL AVI; mixed
    or undecodable frames keep the digest stub. Frames shuffle once on the
    group key; each group is encoded independently on its executor — at
    scale this parallelizes per video, and group size (frames per video)
    bounds executor memory, not total data size."""
    out_schema = T.StructType([
        df.schema[group_col],
        T.StructField("video", T.BinaryType()),
        T.StructField("n_frames", T.LongType()),
    ])

    def enc(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        payloads = [p for p in pdf[frame_col] if p is not None]
        video: bytes
        try:
            import numpy as np
            from .image_codec import decode as img_decode
            imgs = [img_decode(bytes(p)).convert("RGB").arr for p in payloads]
            if not imgs or len({im.shape for im in imgs}) != 1:
                raise ValueError("no frames or mixed dimensions")
            video = _vc.encode(np.stack(imgs), fps=30.0)
        except Exception:  # noqa: BLE001
            h = hashlib.md5()
            for p in payloads:
                h.update(p)
            video = h.digest()
        return pd.DataFrame([{group_col: key[0], "video": video,
                              "n_frames": len(payloads)}])

    return df.groupBy(group_col).applyInPandas(enc, out_schema)


concat_videos_agg = make_video


# ---------------------------------------------------------------------------
# filters (reference functions/video/filters.py: grayscale, mirror,
# rotate, brightness, pan/zoom/scroll) — real numpy frame kernels for
# decodable AVIs through the same narrow waist
# ---------------------------------------------------------------------------

def _frames_edit(name: str, edit):
    """Decode -> per-frames numpy edit -> re-encode."""
    def real(p: bytes) -> bytes:
        import numpy as np  # noqa: F401
        frames, fps = _vc.decode(p)
        return _vc.encode(edit(frames), fps)
    return _video_transform_udf(name, real)


def grayscale(col: Column) -> Column:
    """Luma-weighted grayscale, replicated to RGB (reference
    filters.py grayscale / ffmpeg hue=s=0)."""
    import numpy as np

    def ed(fr):
        g = (fr[..., 0] * 0.299 + fr[..., 1] * 0.587
             + fr[..., 2] * 0.114).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=3 if g.ndim == 3 else 2)
    return _frames_edit("grayscale", ed)(col)


def mirror_x(col: Column) -> Column:
    """Horizontal flip (reference filters.py mirror_x)."""
    return _frames_edit("mirror_x", lambda fr: fr[:, :, ::-1])(col)


def mirror_y(col: Column) -> Column:
    """Vertical flip (reference filters.py mirror_y)."""
    return _frames_edit("mirror_y", lambda fr: fr[:, ::-1])(col)


def rotate(col: Column, turns: int = 1) -> Column:
    """Rotate by 90-degree steps (reference filters.py rotate; arbitrary
    angles need interpolation outside the pure-numpy subset)."""
    import numpy as np
    return _frames_edit(f"rotate{turns}",
                        lambda fr: np.rot90(fr, k=-turns, axes=(1, 2)))(col)


def adjust_brightness(col: Column, factor: float = 1.0) -> Column:
    """Multiplicative brightness with clipping (reference filters.py
    adjust_brightness)."""
    import numpy as np

    def ed(fr):
        return np.clip(fr.astype(np.float64) * factor, 0, 255).astype(np.uint8)
    return _frames_edit(f"brightness{factor}", ed)(col)


def zoom(col: Column, factor: float = 1.5) -> Column:
    """Center zoom: crop the central 1/factor window, nearest-resize back
    (reference filters.py zoom)."""
    import numpy as np

    def ed(fr):
        n, h, w, c = fr.shape
        ch, cw = max(1, int(h / factor)), max(1, int(w / factor))
        y0, x0 = (h - ch) // 2, (w - cw) // 2
        win = fr[:, y0:y0 + ch, x0:x0 + cw]
        yi = (np.arange(h) * ch // h)
        xi = (np.arange(w) * cw // w)
        return win[:, yi][:, :, xi]
    return _frames_edit(f"zoom{factor}", ed)(col)


def pan(col: Column, dx_per_frame: int = 2) -> Column:
    """Horizontal pan: frame i shifted by i*dx with wraparound (reference
    filters.py pan)."""
    import numpy as np

    def ed(fr):
        return np.stack([np.roll(f, -(i * dx_per_frame), axis=1)
                         for i, f in enumerate(fr)])
    return _frames_edit(f"pan{dx_per_frame}", ed)(col)


def scroll(col: Column, dy_per_frame: int = 2) -> Column:
    """Vertical scroll with wraparound (reference filters.py scroll)."""
    import numpy as np

    def ed(fr):
        return np.stack([np.roll(f, -(i * dy_per_frame), axis=0)
                         for i, f in enumerate(fr)])
    return _frames_edit(f"scroll{dy_per_frame}", ed)(col)


def concat_videos(a: Column, b: Column) -> Column:
    """Frame-wise concatenation of two decodable videos (reference
    editing.py concat_videos); sizes must match."""
    import numpy as np

    def real(pa: bytes, pb: bytes) -> bytes:
        fa, fps = _vc.decode(pa)
        fb, _ = _vc.decode(pb)
        return _vc.encode(np.concatenate([fa, fb], axis=0), fps)
    return _video_binary_udf("concat", real)(a, b)


def video_splitter(df: DataFrame, duration: float = 1.0,
                   overlap: float = 0.0,
                   payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """Explode videos into fixed-duration (optionally overlapping)
    segments (reference video/iterators.py:361 video_splitter): one row
    per segment with pos / start_time / end_time / segment payload.
    Narrow mapInPandas like the other iterators — segments of one video
    never leave its scan partition."""
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("pos", T.IntegerType()),
        T.StructField("start_time", T.DoubleType()),
        T.StructField("end_time", T.DoubleType()),
        T.StructField("segment", T.BinaryType()),
    ])
    if duration <= 0:
        raise ValueError("duration must be positive")
    if overlap < 0 or overlap >= duration:
        raise ValueError("overlap must be in [0, duration)")

    def op(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                p = r[payload_col]
                if p is None:
                    continue
                try:
                    frames, fps = _vc.decode(bytes(p))
                except Exception:  # noqa: BLE001
                    continue
                step = max(1, int(round((duration - overlap) * fps)))
                win = max(1, int(round(duration * fps)))
                pos = 0
                for s0 in range(0, len(frames), step):
                    part = frames[s0:s0 + win]
                    if len(part) == 0:
                        break
                    rows.append({
                        id_col: r[id_col], "pos": pos,
                        "start_time": s0 / fps,
                        "end_time": (s0 + len(part)) / fps,
                        "segment": _vc.encode(part, fps)})
                    pos += 1
                    if s0 + win >= len(frames):
                        break
            yield pd.DataFrame(rows, columns=[
                id_col, "pos", "start_time", "end_time", "segment"])

    return df.mapInPandas(op, out_schema)


def _scene_detect_metric(col: Column, threshold: float, metric: str) -> Column:
    """Shared scene-cut driver over decodable AVIs; per-variant frame
    difference metric (reference video/scene_detect.py's five detectors)."""
    import numpy as np

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def fn(s):
        def cuts(p):
            if p is None:
                return None
            try:
                frames, _fps = _vc.decode(bytes(p))
            except Exception:  # noqa: BLE001
                n_frames = max(1, len(p) // 256)
                h = hashlib.md5(bytes(p) + metric.encode()).digest()
                return sorted({h[i] % n_frames for i in range(4)})
            out = []
            prev = None
            diffs = []
            for i, f in enumerate(frames):
                if metric == "content":
                    cur = f.astype(np.float64)
                    if prev is not None:
                        diffs.append((i, float(np.abs(cur - prev).mean())))
                    prev = cur
                elif metric == "histogram":
                    cur = np.histogram(f, bins=32, range=(0, 256))[0] / f.size
                    if prev is not None:
                        diffs.append((i, float(np.abs(cur - prev).sum() * 100)))
                    prev = cur
                elif metric == "hash":
                    g = f.mean(axis=2)
                    cur = (g > g.mean()).astype(np.int8)
                    if prev is not None:
                        diffs.append((i, float((cur != prev).mean() * 100)))
                    prev = cur
            if metric == "adaptive":
                # content metric against a rolling-average baseline
                prev = None
                vals = []
                for f in frames:
                    cur = f.astype(np.float64)
                    if prev is not None:
                        vals.append(float(np.abs(cur - prev).mean()))
                    prev = cur
                for i, v in enumerate(vals, start=1):
                    w = vals[max(0, i - 4):i - 1]
                    base = sum(w) / len(w) if w else 0.0
                    if v > base * threshold and v > 1.0:
                        out.append(i)
                return out
            for i, v in diffs:
                if v > threshold:
                    out.append(i)
            return out
        return s.map(cuts)
    return fn(col)


def scene_detect_content(col: Column, threshold: float = 27.0) -> Column:
    """Mean-absolute frame difference (reference scene_detect.py
    scene_detect_content)."""
    return _scene_detect_metric(col, threshold, "content")


def scene_detect_threshold(col: Column, threshold: float = 27.0) -> Column:
    """Alias of the content metric at a fixed threshold (reference
    scene_detect_threshold's fade-to-black use reduces to it on RGB)."""
    return _scene_detect_metric(col, threshold, "content")


def scene_detect_histogram(col: Column, threshold: float = 5.0) -> Column:
    """32-bin intensity-histogram L1 distance (reference
    scene_detect_histogram)."""
    return _scene_detect_metric(col, threshold, "histogram")


def scene_detect_hash(col: Column, threshold: float = 20.0) -> Column:
    """Mean-threshold aHash bit-difference percentage (reference
    scene_detect_hash)."""
    return _scene_detect_metric(col, threshold, "hash")


def scene_detect_adaptive(col: Column, ratio: float = 3.0) -> Column:
    """Content metric vs a rolling-average baseline (reference
    scene_detect_adaptive)."""
    return _scene_detect_metric(col, ratio, "adaptive")


def ffmpeg_filter(col: Column, filter_expr: str) -> Column:
    """Arbitrary ffmpeg filter graphs genuinely need ffmpeg (reference
    editing.py ffmpeg_filter)."""
    raise NotImplementedError(
        "ffmpeg_filter requires the ffmpeg binary, absent in this "
        f"environment (requested filter: {filter_expr!r})")


def concat_videos_agg(df: DataFrame, group_col: str,
                      video_col: str = "payload",
                      order_col: str = "pos") -> DataFrame:
    """Concatenate each group's videos in `order_col` order into one
    payload (reference editing.py concat_videos_agg). ONE hash shuffle +
    a pandas group-walk (the stitch_tiles pattern — per-group
    applyInPandas fan-out costs ~5x with many small groups)."""
    import numpy as np
    out_schema = T.StructType([
        df.schema[group_col],
        T.StructField("video", T.BinaryType()),
    ])

    def op(batches):
        for pdf in batches:
            rows = []
            for gkey, g in pdf.groupby(group_col, sort=False):
                parts, fps = [], 30.0
                for _, r in g.sort_values(order_col).iterrows():
                    try:
                        fr, fps = _vc.decode(bytes(r[video_col]))
                        parts.append(fr)
                    except Exception:  # noqa: BLE001
                        continue
                if not parts:
                    continue
                rows.append({group_col: gkey,
                             "video": _vc.encode(
                                 np.concatenate(parts, axis=0), fps)})
            yield pd.DataFrame(rows, columns=[group_col, "video"])

    return df.repartition(F.col(group_col)).mapInPandas(op, out_schema)

"""Video functions (reference functions/video/editing.py:25-811,
iterators.py frame_iterator).

Videos are by-reference path strings / binary payloads; frame extraction
is the component-view pattern (explode via mapInPandas). ffmpeg/PyAV are
not in this container — the codec boundary is
``operators.multimodal.sample_video_frames``'s stub; everything
Spark-side (explode shape, schema, partitioning) is real.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover
    import av  # noqa: F401
    HAS_AV = True
except ImportError:
    HAS_AV = False


def frame_iterator(df: DataFrame, every_n: int = 30,
                   payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """Explode videos into frame rows (reference iterators frame_iterator;
    drives component views). Real decode requires PyAV; stubbed decode
    keeps the pipeline runnable offline."""
    from ..operators.multimodal import sample_video_frames
    if HAS_AV:
        raise NotImplementedError("wire PyAV decode here when available")
    return sample_video_frames(df, every_n=every_n, binary_col=payload_col,
                               id_col=id_col)


def get_metadata(col: Column) -> Column:
    """Byte-level metadata without a codec (duration etc. need ffmpeg)."""
    return F.to_json(F.struct(
        F.length(col).alias("n_bytes"),
        F.substring(F.hex(col), 1, 8).alias("magic"),
    ))


def clip(df: DataFrame, start_frame: int, end_frame: int,
         payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Select a frame range from the exploded frame stream — composition of
    frame_iterator + filter (reference editing.py clip), codec-free."""
    frames = frame_iterator(df, every_n=1, payload_col=payload_col, id_col=id_col)
    return frames.filter(
        (F.col("frame_idx") >= start_frame) & (F.col("frame_idx") < end_frame))


def _video_transform_udf(name: str):
    """Payload->payload edit (reference functions/video/editing.py and
    filters.py: crop/resize/reverse/fade/speed/overlay...). Real transcode
    needs ffmpeg/PyAV; the deterministic stub keeps every pipeline stage —
    schema, Arrow batching, null handling — runnable and testable offline."""
    import hashlib

    import pandas as pd

    @F.pandas_udf(T.BinaryType())
    def fn(s):
        if HAS_AV:
            raise NotImplementedError(f"wire PyAV {name} here when available")
        return s.map(lambda p: None if p is None
                     else hashlib.md5(p + name.encode()).digest())
    return fn


def crop(col: Column, box: tuple) -> Column:
    return _video_transform_udf(f"crop{box}")(col)


def resize(col: Column, w: int, h: int) -> Column:
    return _video_transform_udf(f"resize{w}x{h}")(col)


def reverse(col: Column) -> Column:
    return _video_transform_udf("reverse")(col)


def fade_in(col: Column, seconds: float = 1.0) -> Column:
    return _video_transform_udf(f"fade_in{seconds}")(col)


def fade_out(col: Column, seconds: float = 1.0) -> Column:
    return _video_transform_udf(f"fade_out{seconds}")(col)


def speed(col: Column, factor: float) -> Column:
    return _video_transform_udf(f"speed{factor}")(col)


def overlay_text(col: Column, text: str, x: int = 0, y: int = 0) -> Column:
    return _video_transform_udf(f"overlay_text{text}@{x},{y}")(col)


def extract_frame(col: Column, frame_idx: int = 0) -> Column:
    """Single-frame grab as an image payload (reference editing.py
    extract_frame)."""
    return _video_transform_udf(f"extract_frame{frame_idx}")(col)


def extract_audio(col: Column) -> Column:
    """Demux the audio track (reference editing.py extract_audio)."""
    return _video_transform_udf("extract_audio")(col)


def _video_binary_udf(name: str):
    import hashlib

    import pandas as pd

    @F.pandas_udf(T.BinaryType())
    def fn(a, b):
        if HAS_AV:
            raise NotImplementedError(f"wire PyAV {name} here when available")
        return pd.Series([
            None if (p is None or q is None)
            else hashlib.md5(p + q + name.encode()).digest()
            for p, q in zip(a, b)])
    return fn


def with_audio(video: Column, audio: Column) -> Column:
    return _video_binary_udf("with_audio")(video, audio)


def mix_audio(video: Column, audio: Column, volume: float = 1.0) -> Column:
    return _video_binary_udf(f"mix_audio{volume}")(video, audio)


def overlay_image(video: Column, image: Column, x: int = 0, y: int = 0) -> Column:
    return _video_binary_udf(f"overlay_image{x},{y}")(video, image)


def transition(a: Column, b: Column, kind: str = "crossfade",
               seconds: float = 1.0) -> Column:
    return _video_binary_udf(f"transition{kind}{seconds}")(a, b)


def get_duration(col: Column) -> Column:
    """Duration estimate; stub assumes the fake 1-frame-per-256-bytes model
    at 30 fps (consistent with sample_video_frames)."""
    return (F.greatest(F.length(col) / F.lit(256), F.lit(1)) / F.lit(30.0)) \
        .cast(T.DoubleType())


def scene_detect(col: Column, threshold: float = 27.0) -> Column:
    """Scene-cut frame indices (reference functions/video/scene_detect.py).
    Stub: deterministic cut positions derived from the payload hash."""
    import hashlib

    import pandas as pd

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def fn(s):
        def cuts(p):
            if p is None:
                return None
            n_frames = max(1, len(p) // 256)
            h = hashlib.md5(p).digest()
            return sorted({h[i] % n_frames for i in range(4)})
        return s.map(cuts)
    return fn(col)


def segment_video(df: DataFrame, n_segments: int = 4,
                  payload_col: str = "payload",
                  id_col: str = "media_id") -> DataFrame:
    """Explode each video into N segment rows (reference editing.py
    segment_video) — UDTF shape over mapInPandas, a narrow transformation."""
    import hashlib

    import pandas as pd

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
                step = max(1, len(p) // n_segments)
                for i in range(n_segments):
                    chunk = p[i * step:(i + 1) * step]
                    if not chunk:
                        break
                    rows.append({id_col: r[id_col], "segment_idx": i,
                                 "segment": hashlib.md5(chunk).digest()
                                 if not HAS_AV else None})
            yield pd.DataFrame(rows, columns=[id_col, "segment_idx", "segment"])

    return df.mapInPandas(op, out_schema)


def make_video(df: DataFrame, group_col: str, frame_col: str = "frame",
               order_col: str = "frame_idx") -> DataFrame:
    """Frames -> one video per group: the reference's make_video /
    concat_videos_agg media AGGREGATOR (functions/video/editing.py:25,658)
    as applyInPandas. Frames shuffle once on the group key; each group is
    encoded independently on its executor — at scale this parallelizes per
    video, and group size (frames per video) bounds executor memory, not
    total data size."""
    import hashlib

    import pandas as pd

    out_schema = T.StructType([
        df.schema[group_col],
        T.StructField("video", T.BinaryType()),
        T.StructField("n_frames", T.LongType()),
    ])

    def enc(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        h = hashlib.md5()
        n = 0
        for p in pdf[frame_col]:
            if p is not None:
                h.update(p)
                n += 1
        return pd.DataFrame([{group_col: key[0], "video": h.digest(),
                              "n_frames": n}])

    return df.groupBy(group_col).applyInPandas(enc, out_schema)


concat_videos_agg = make_video

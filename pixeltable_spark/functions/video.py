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

"""Audio functions (reference functions/audio.py:26-300, iterators/audio.py).

Audio is by-reference / binary; transforms need ffmpeg (absent here) and
are stubbed at the codec call; chunking (the audio splitter iterator) is
real Spark plumbing over byte offsets.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def get_metadata(col: Column) -> Column:
    return F.to_json(F.struct(F.length(col).alias("n_bytes")))


def audio_splitter(df: DataFrame, chunk_bytes: int = 1 << 20,
                   payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """Split audio payloads into fixed-size chunks with pos — the audio
    splitter iterator (component-view driver). Byte-exact, codec-free."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("pos", T.LongType()),
        T.StructField("chunk", T.BinaryType()),
    ])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                p = r[payload_col]
                if p is None:
                    continue
                for pos, off in enumerate(range(0, len(p), chunk_bytes)):
                    rows.append({id_col: r[id_col], "pos": pos,
                                 "chunk": bytes(p[off:off + chunk_bytes])})
            yield pd.DataFrame(rows, columns=[id_col, "pos", "chunk"])

    return df.mapInPandas(op, out_schema)


def _audio_transform_udf(name: str) -> Column:
    """STUB at the codec boundary: deterministic re-hash standing in for an
    ffmpeg filter graph; swap the body when ffmpeg/PyAV is available."""
    @F.pandas_udf(T.BinaryType())
    def fn(s):
        return pd.Series([
            None if p is None else hashlib.md5(p + name.encode()).digest()
            for p in s
        ])
    return fn


def multiply_volume(col: Column, factor: float) -> Column:
    return _audio_transform_udf(f"vol{factor}")(col)


def encode_audio(col: Column, codec: str = "mp3",
                 bitrate: str = "128k") -> Column:
    """Re-encode (reference functions/audio.py encode_audio)."""
    return _audio_transform_udf(f"encode{codec}{bitrate}")(col)


def fade_in(col: Column, seconds: float = 1.0) -> Column:
    return _audio_transform_udf(f"fade_in{seconds}")(col)


def fade_out(col: Column, seconds: float = 1.0) -> Column:
    return _audio_transform_udf(f"fade_out{seconds}")(col)


def normalize(col: Column, target_db: float = -14.0) -> Column:
    """Loudness normalization (reference functions/audio.py normalize)."""
    return _audio_transform_udf(f"normalize{target_db}")(col)

"""Audio functions (reference functions/audio.py:26-300, iterators/audio.py).

Audio is by-reference / binary. PCM WAV payloads get REAL kernels via the
pure-stdlib codec (functions/audio_codec.py: wave module + numpy sample
math) — metadata, volume, fades, normalize, clip, mono. Compressed
formats (mp3/aac/ogg) need ffmpeg (absent here) and keep the
deterministic md5 stub at the codec call; chunking (the audio splitter
iterator) is real Spark plumbing over byte offsets either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import audio_codec as _ac


def get_metadata(col: Column) -> Column:
    """Container metadata (reference functions/audio.py:26 get_metadata):
    real WAV header fields when the payload is RIFF/WAVE, byte length
    alone otherwise."""
    @F.pandas_udf(T.StringType())
    def fn(s):
        import json
        out = []
        for p in s:
            if p is None:
                out.append(None)
                continue
            info = _ac.probe(p)
            if info is None:
                info = {"n_bytes": len(p)}
            else:
                info["n_bytes"] = len(p)
            out.append(json.dumps(info, sort_keys=True))
        return pd.Series(out)
    return fn(col)


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


def _audio_transform_udf(name: str, real_fn=None) -> Column:
    """Real WAV kernel when the payload decodes (audio_codec), else the
    deterministic re-hash stub standing in for an ffmpeg filter graph."""
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
                except Exception:  # noqa: BLE001 — non-WAV payload
                    pass
            out.append(hashlib.md5(p + name.encode()).digest())
        return pd.Series(out)
    return fn


def multiply_volume(col: Column, factor: float) -> Column:
    return _audio_transform_udf(
        f"vol{factor}", lambda p: _ac.multiply_volume(p, factor))(col)


def encode_audio(col: Column, codec: str = "mp3",
                 bitrate: str = "128k") -> Column:
    """Re-encode (reference functions/audio.py encode_audio). 'wav' →
    real PCM re-encode; compressed codecs need ffmpeg (stub)."""
    if codec == "wav":
        return _audio_transform_udf(
            "encodewav", lambda p: _ac.encode(*_ac.decode(p)))(col)
    return _audio_transform_udf(f"encode{codec}{bitrate}")(col)


def fade_in(col: Column, seconds: float = 1.0) -> Column:
    return _audio_transform_udf(
        f"fade_in{seconds}", lambda p: _ac.fade_in(p, seconds))(col)


def fade_out(col: Column, seconds: float = 1.0) -> Column:
    return _audio_transform_udf(
        f"fade_out{seconds}", lambda p: _ac.fade_out(p, seconds))(col)


def normalize(col: Column, target_db: float = -14.0) -> Column:
    """Peak normalization (reference functions/audio.py normalize)."""
    return _audio_transform_udf(
        f"normalize{target_db}", lambda p: _ac.normalize(p, target_db))(col)


def clip(col: Column, start_s: float, end_s: float = None) -> Column:
    """Time-range clip — real for WAV (reference audio splitter slicing)."""
    return _audio_transform_udf(
        f"clip{start_s}-{end_s}", lambda p: _ac.clip(p, start_s, end_s))(col)


def to_mono(col: Column) -> Column:
    return _audio_transform_udf("to_mono", _ac.to_mono)(col)

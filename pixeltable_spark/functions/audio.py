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


def audio_splitter_time(df: DataFrame, duration: float,
                        overlap: float = 0.0, min_segment: float = 0.0,
                        payload_col: str = "payload",
                        id_col: str = "media_id") -> DataFrame:
    """Time-based audio segmentation (reference functions/audio.py:472
    audio_splitter: duration/overlap/min_segment seconds): decode via the
    codec waist, slice sample windows, re-encode each segment as PCM WAV.
    One row per segment with pos/start_time/end_time/segment. Narrow
    mapInPandas — segments of one file never leave its scan partition."""
    if duration <= 0:
        raise ValueError("duration must be > 0")
    if overlap < 0 or overlap >= duration:
        raise ValueError("overlap must satisfy 0 <= overlap < duration")
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("pos", T.LongType()),
        T.StructField("start_time", T.DoubleType()),
        T.StructField("end_time", T.DoubleType()),
        T.StructField("segment", T.BinaryType()),
    ])
    cols = [id_col, "pos", "start_time", "end_time", "segment"]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import audio_codec as ac
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                p = r[payload_col]
                if p is None:
                    continue
                info = ac.probe(bytes(p))
                fmt = (info or {}).get("format")
                if fmt in ("MP3", "OGG", "AAC"):
                    # stream-copy at frame/page boundaries — no decode
                    # needed, segments are valid standalone payloads
                    # (MP3 cuts only at reservoir-safe frames; OGG at
                    # packet-aligned pages with the header pages
                    # re-prefixed). Overlap requires re-encoding, hence
                    # PCM formats only.
                    if overlap:
                        raise ValueError(
                            f"overlap is unsupported for {fmt} stream-"
                            "copy segmentation (needs decode); use "
                            "overlap=0")
                    split = {"MP3": ac.mp3_split, "OGG": ac.ogg_split,
                             "AAC": ac.adts_split}[fmt]
                    n_pos = 0
                    for t0, t1, seg in split(bytes(p), duration):
                        if t1 - t0 >= max(min_segment, 1e-9):
                            rows.append({
                                id_col: r[id_col], "pos": n_pos,
                                "start_time": round(t0, 6),
                                "end_time": round(t1, 6),
                                "segment": seg})
                            n_pos += 1
                    continue
                samples, rate, width = ac.decode(bytes(p))
                step = duration - overlap
                n = samples.shape[0]
                pos = 0
                t = 0.0
                while t * rate < n:
                    s0 = int(round(t * rate))
                    s1 = min(int(round((t + duration) * rate)), n)
                    if (s1 - s0) / rate >= max(min_segment, 1e-9):
                        rows.append({
                            id_col: r[id_col], "pos": pos,
                            "start_time": round(t, 6),
                            "end_time": round(s1 / rate, 6),
                            "segment": ac.encode(samples[s0:s1], rate, width),
                        })
                        pos += 1
                    t += step
            yield pd.DataFrame(rows, columns=cols)

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


def resample(col: Column, rate: int, lobes: int = 3) -> Column:
    """Sample-rate conversion by windowed-sinc (Lanczos) interpolation —
    REAL bandlimited resampling in the stdlib codec (audio_codec.py
    sinc_resample), anti-aliased on downsampling, for every decodable
    format (PCM/G.711/ADPCM WAV, FLAC, AIFF, AU); output is PCM WAV at
    the target rate."""
    return _audio_transform_udf(
        f"resample{rate}",
        lambda p: _ac.resample_payload(p, rate, lobes=lobes))(col)


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


# ---------------------------------------------------------------------------
# audio analysis + fingerprint (beyond-reference; the audio member of the
# cross-modal dedup family — text simhash / image ahash / audio
# fingerprint all feed dedup.hamming_pairs)
# ---------------------------------------------------------------------------

def _mono_f64(payload: bytes):
    import numpy as np

    from . import audio_codec as ac
    samples, rate, _w = ac.decode(payload)
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr.mean(axis=1)
    return arr, rate


def rms_energy(col: Column) -> Column:
    """Root-mean-square sample energy (float; None outside the WAV
    subset)."""
    @F.pandas_udf(T.DoubleType())
    def fn(s):
        import math

        import pandas as pd

        def one(p):
            if p is None:
                return None
            try:
                arr, _ = _mono_f64(bytes(p))
                return float(math.sqrt((arr * arr).mean())) if len(arr) else 0.0
            except Exception:  # noqa: BLE001
                return None
        return pd.Series([one(p) for p in s], dtype="object")
    return fn(col)


def zero_crossing_rate(col: Column) -> Column:
    """Fraction of adjacent sample pairs changing sign — the classic
    voiced/unvoiced + noisiness signal."""
    @F.pandas_udf(T.DoubleType())
    def fn(s):
        import numpy as np
        import pandas as pd

        def one(p):
            if p is None:
                return None
            try:
                arr, _ = _mono_f64(bytes(p))
                if len(arr) < 2:
                    return 0.0
                return float((np.signbit(arr[1:]) != np.signbit(arr[:-1]))
                             .mean())
            except Exception:  # noqa: BLE001
                return None
        return pd.Series([one(p) for p in s], dtype="object")
    return fn(col)


def silence_ratio(col: Column, threshold_frac: float = 0.02,
                  frame_ms: float = 20.0) -> Column:
    """Fraction of frames whose RMS is below threshold_frac * peak —
    trims/flagging for ASR pipelines."""
    @F.pandas_udf(T.DoubleType())
    def fn(s):
        import numpy as np
        import pandas as pd

        def one(p):
            if p is None:
                return None
            try:
                arr, rate = _mono_f64(bytes(p))
            except Exception:  # noqa: BLE001
                return None
            if len(arr) == 0:
                return 1.0
            flen = max(1, int(rate * frame_ms / 1000))
            n = len(arr) // flen
            if n == 0:
                return 0.0
            fr = arr[:n * flen].reshape(n, flen)
            rms = np.sqrt((fr * fr).mean(axis=1))
            peak = float(np.abs(arr).max()) or 1.0
            return float((rms < threshold_frac * peak).mean())
        return pd.Series([one(p) for p in s], dtype="object")
    return fn(col)


def audio_fingerprint(col: Column, bits: int = 64) -> Column:
    """64-bit energy-delta fingerprint (the chromaprint/shazam-family
    design reduced to its public core): split the signal into bits+1
    equal frames, bit i = energy(frame i+1) > energy(frame i). Identical
    audio -> identical bits; independent content lands ~bits/2 apart.
    Feed to dedup.hamming_pairs for banded near-dup joins. Payloads
    outside the WAV subset get a deterministic md5 fingerprint."""
    @F.pandas_udf(T.LongType())
    def fn(s):
        import hashlib

        import numpy as np
        import pandas as pd

        def one(p):
            if p is None:
                return None
            try:
                arr, _ = _mono_f64(bytes(p))
                n = bits + 1
                if len(arr) < n:
                    arr = np.pad(arr, (0, n - len(arr)))
                flen = len(arr) // n
                fr = arr[:n * flen].reshape(n, flen)
                e = (fr * fr).mean(axis=1)
                v = 0
                for b in (e[1:] > e[:-1]):
                    v = (v << 1) | int(b)
                return v - (1 << 64) if v >= (1 << 63) else v
            except Exception:  # noqa: BLE001
                return int.from_bytes(
                    hashlib.md5(bytes(p) + b"afp").digest()[:8], "big",
                    signed=True)
        return pd.Series([one(p) for p in s], dtype="object")
    return fn(col)


_SPECTRAL_TYPE = T.StructType([
    T.StructField("centroid_hz", T.DoubleType()),
    T.StructField("rolloff_hz", T.DoubleType()),
    T.StructField("bandwidth_hz", T.DoubleType()),
    T.StructField("flatness", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
])


def spectral_features(col: Column, rolloff_pct: float = 0.85) -> Column:
    """Magnitude-spectrum summary struct (centroid/rolloff/bandwidth/
    flatness/zcr/rms — audio_codec.spectral_features, textbook MIR
    definitions in pure numpy) for every decodable payload; NULL
    outside the decodable subset."""
    @F.pandas_udf(_SPECTRAL_TYPE)
    def fn(s):
        import pandas as pd

        def one(p):
            if p is None:
                return None
            try:
                samples, rate, _w = _ac.decode(bytes(p))
                return _ac.spectral_features(samples, rate,
                                             rolloff_pct=rolloff_pct)
            except Exception:  # noqa: BLE001
                return None
        rows = [one(p) for p in s]
        return pd.DataFrame(
            [r if r is not None else {k.name: None
                                      for k in _SPECTRAL_TYPE}
             for r in rows])
    return fn(col)


def mel_energies(col: Column, n_mels: int = 20) -> Column:
    """Log mel-filterbank energies (array<double>, the MFCC front half
    — audio_codec.mel_filterbank_energies, Slaney-style triangles from
    the public mel formula); NULL outside the decodable subset."""
    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def fn(s):
        import pandas as pd

        def one(p):
            if p is None:
                return None
            try:
                samples, rate, _w = _ac.decode(bytes(p))
                return [float(x) for x in _ac.mel_filterbank_energies(
                    samples, rate, n_mels=n_mels)]
            except Exception:  # noqa: BLE001
                return None
        return pd.Series([one(p) for p in s], dtype="object")
    return fn(col)

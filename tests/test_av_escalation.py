"""PyAV presence-escalation contract (functions/video.py probe_any):
with a (fake) `av` module importable, compressed-container probes route
through av.open; AVI stays on the full-fidelity stdlib codec; a broken
PyAV falls back to the stdlib probe. Documents the 'probes upgrade
automatically when PyAV is installed' claim as an executable test
instead of prose."""

import io
import json
import sys
import types

import pytest

from pixeltable_spark.functions import video as V
from pixeltable_spark.functions import video_codec as vc


def _fake_av(width=640, height=360, frames=90, fps=30.0,
             duration_us=3_000_000):
    """A minimal stand-in exposing the av.open surface probe_any uses."""
    stream = types.SimpleNamespace(type="video", width=width,
                                   height=height, frames=frames,
                                   average_rate=fps)

    class _Container:
        format = types.SimpleNamespace(name="mov,mp4,m4a,3gp,3g2,mj2")
        streams = [stream]
        duration = duration_us

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    mod = types.ModuleType("av")
    mod.open = lambda fh: _Container()
    return mod


def _mp4_payload() -> bytes:
    # minimal ftyp box — enough for probe_mp4 to identify MP4
    return (b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00isomiso2"
            + b"\x00\x00\x00\x08free")


class TestEscalation:
    def test_mp4_prefers_pyav_when_importable(self, monkeypatch):
        monkeypatch.setitem(sys.modules, "av", _fake_av())
        info = V.probe_any(_mp4_payload())
        assert info["via"] == "pyav"
        assert info["width"] == 640 and info["height"] == 360
        assert info["n_frames"] == 90 and info["fps"] == 30.0
        assert info["duration"] == 3.0

    def test_avi_stays_on_stdlib_codec(self, monkeypatch):
        # PyAV present, but AVI is already full-fidelity stdlib — the
        # waist must NOT route it through av
        boom = types.ModuleType("av")

        def _explode(fh):
            raise AssertionError("AVI must not reach PyAV")
        boom.open = _explode
        monkeypatch.setitem(sys.modules, "av", boom)
        import numpy as np
        frames = np.zeros((2, 6, 8, 3), dtype=np.uint8)
        avi = vc.encode(frames, fps=5)
        info = V.probe_any(avi)
        assert info["format"] == "AVI"
        assert "via" not in info

    def test_broken_pyav_falls_back_to_stdlib_probe(self, monkeypatch):
        boom = types.ModuleType("av")

        def _explode(fh):
            raise RuntimeError("codec init failed")
        boom.open = _explode
        monkeypatch.setitem(sys.modules, "av", boom)
        base = V.probe_any(_mp4_payload())
        # falls back to the stdlib MP4 header probe
        assert base is not None and "via" not in base

    def test_absent_pyav_uses_stdlib_probe(self, monkeypatch):
        monkeypatch.setitem(sys.modules, "av", None)  # import -> error
        info = V.probe_any(_mp4_payload())
        assert info is not None and "via" not in info
        no_av = vc.probe(_mp4_payload())
        assert info == no_av


class TestGetMetadataWaist:
    def test_get_metadata_reports_stdlib_mp4_probe(self, spark):
        # end-to-end through the pandas UDF (executors have no PyAV in
        # this container): MP4 payload yields the stdlib header probe
        from pyspark.sql import functions as F
        df = spark.createDataFrame([(1, bytearray(_mp4_payload()))],
                                   "media_id int, payload binary")
        out = df.select(V.get_metadata(F.col("payload")).alias("m")) \
            .collect()[0]["m"]
        md = json.loads(out)
        assert md["n_bytes"] == len(_mp4_payload())

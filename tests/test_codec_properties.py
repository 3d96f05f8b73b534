"""Property-based roundtrip tests for the pure-stdlib media codecs
(hypothesis): encode→decode is the identity for arbitrary pixel/sample
content, and the vectorized string fallback always agrees with Python
semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pixeltable_spark.functions import audio_codec as ac
from pixeltable_spark.functions import image_codec as ic
from pixeltable_spark.functions import video_codec as vc


@st.composite
def _arrays(draw, max_side=24, channels=(1, 2, 3, 4)):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    c = draw(st.sampled_from(channels))
    data = draw(st.binary(min_size=h * w * c, max_size=h * w * c))
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, c).copy()


class TestImageRoundtrip:
    @settings(max_examples=40, deadline=None)
    @given(_arrays())
    def test_png_roundtrip_identity(self, arr):
        mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[arr.shape[2]]
        img = ic.decode(ic.encode_png(arr, mode))
        assert img.mode == mode
        assert (img.arr == arr).all()

    @settings(max_examples=20, deadline=None)
    @given(_arrays(channels=(3,)), st.integers(1, 16), st.integers(1, 16))
    def test_resize_dims_always_exact(self, arr, w, h):
        out = ic.MiniImage(arr, "RGB").resize((w, h))
        assert out.size == (w, h)
        # resized pixels are drawn from the source pixel set per channel
        assert set(np.unique(out.arr)) <= set(np.unique(arr))


class TestAudioRoundtrip:
    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 2000), st.sampled_from([1, 2]),
           st.sampled_from([8000, 16000, 44100]))
    def test_wav_roundtrip_identity(self, n, channels, rate):
        rng = np.random.default_rng(n * channels)
        arr = rng.integers(-32768, 32767, (n, channels), dtype=np.int16)
        back, r2, w2 = ac.decode(ac.encode(arr, rate, 2))
        assert r2 == rate and w2 == 2
        assert (back == arr).all()

    @settings(max_examples=15, deadline=None)
    @given(st.integers(10, 500), st.floats(0.0, 4.0))
    def test_volume_scales_peak(self, n, factor):
        arr = np.linspace(-5000, 5000, n).astype(np.int16)[:, None]
        out, _r, _w = ac.decode(ac.multiply_volume(ac.encode(arr, 8000, 2),
                                                   factor))
        assert abs(out).max() <= abs(arr).max() * factor + 1


class TestVideoRoundtrip:
    @settings(max_examples=20, deadline=None)
    @given(st.integers(1, 6), st.integers(1, 10), st.integers(1, 10),
           st.integers(0, 2 ** 32 - 1))
    def test_avi_roundtrip_identity(self, n, h, w, seed):
        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        back, _fps = vc.decode(vc.encode(frames, 30.0))
        assert (back == frames).all()


class TestVectorizedStringEquivalence:
    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.text(min_size=0, max_size=30), min_size=1,
                    max_size=20),
           st.text(min_size=1, max_size=3))
    def test_rfind_matches_python(self, texts, sub):
        from pixeltable_spark.functions import string as pxs
        got = pxs.rfind.pandas_fn(pd.Series(texts), sub)
        want = [t.rfind(sub) for t in texts]
        assert [int(v) for v in got] == want

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.text(min_size=0, max_size=30), min_size=1,
                    max_size=20))
    def test_title_matches_python(self, texts):
        from pixeltable_spark.functions import string as pxs
        got = pxs.title.pandas_fn(pd.Series(texts))
        assert list(got) == [t.title() for t in texts]


class TestReviewRegressions:
    """Regressions for the round-4 self-review findings."""

    def test_truncated_headers_probe_none(self):
        assert ic.probe(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) is None
        assert ic.probe(b"BM" + b"\x00" * 10) is None
        assert ic.probe(b"GIF89a" + b"\x00" * 2) is None
        assert ic.probe(b"\xff\xd8\xff\xc0\x00") is None
        assert vc.probe(b"RIFF\x20\x00\x00\x00AVI LIST\x10\x00\x00\x00hdrlavih\x28\x00\x00\x00") is None

    def test_pdf_invalid_escape_tolerated(self):
        from pixeltable_spark.functions.pdf_codec import _literal_string
        assert _literal_string(rb"foo\8bar") == "foo8bar"
        assert _literal_string(rb"a\101b") == "aAb"  # octal 101 = 'A'

    def test_split_maxsplit_zero_matches_python(self):
        from pixeltable_spark.functions import string as pxs
        got = pxs.split.pandas_fn(pd.Series(["a b c"]), " ", 0)
        assert list(got)[0] == ["a b c"]
        got1 = pxs.split.pandas_fn(pd.Series(["a b c"]), " ", 1)
        assert list(got1)[0] == ["a", "b c"]

    def test_manifest_cas_detects_concurrent_writer(self, spark, tmp_path):
        import json as _json
        import os

        import pixeltable_spark as pxt
        cat = pxt.Catalog(spark, str(tmp_path / "wh"))
        t = cat.create_table("cc", {"k": pxt.Int(False)}, primary_key=["k"])
        t.insert([{"k": 1}])
        # simulate another writer moving CURRENT between read and commit
        t._current_files()
        with open(t._current_path) as f:
            cur = _json.load(f)
        other = os.path.join("manifests", "m-intruder.json")
        t._atomic_write(os.path.join(t.path, other),
                        _json.dumps({"files": []}))
        t._atomic_write(t._current_path, _json.dumps({"manifest": other}))
        import pytest as _pt
        with _pt.raises(RuntimeError, match="concurrent modification"):
            t._commit_files([])

"""Pure-stdlib AVI video codec: real frame kernels without ffmpeg
(functions/video_codec.py) and their wiring through the video-function
surface — frame_iterator, transforms, make_video roundtrip."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from pixeltable_spark.functions import image_codec as icodec
from pixeltable_spark.functions import video as pxv
from pixeltable_spark.functions import video_codec as vc


def _gradient_video(n=6, h=4, w=6, fps=10.0) -> bytes:
    frames = np.stack([np.full((h, w, 3), i * 40 % 256, np.uint8)
                       for i in range(n)])
    return vc.encode(frames, fps)


class TestCodecCore:
    def test_roundtrip(self):
        frames = np.random.default_rng(7).integers(
            0, 256, (5, 4, 6, 3), dtype=np.uint8)
        avi = vc.encode(frames, 25.0)
        info = vc.probe(avi)
        assert (info["width"], info["height"], info["n_frames"]) == (6, 4, 5)
        assert info["fps"] == pytest.approx(25.0)
        back, fps = vc.decode(avi)
        assert (back == frames).all() and fps == pytest.approx(25.0)

    def test_odd_width_row_padding(self):
        frames = np.arange(3 * 2 * 5 * 3, dtype=np.uint8).reshape(3, 2, 5, 3)
        back, _fps = vc.decode(vc.encode(frames, 30.0))
        assert (back == frames).all()

    def test_probe_rejects_non_avi(self):
        assert vc.probe(b"RIFFxxxxWAVEfmt ....") is None
        assert vc.probe(b"garbage data here...") is None

    def test_scene_cuts_real(self):
        a = np.zeros((3, 4, 4, 3), np.uint8)
        b = np.full((3, 4, 4, 3), 200, np.uint8)
        avi = vc.encode(np.concatenate([a, b]), 30.0)
        assert vc.scene_cuts(avi, threshold=27.0) == [3]


class TestVideoSurface:
    @pytest.fixture()
    def vid_df(self, spark):
        return spark.createDataFrame(
            [(1, _gradient_video()), (2, b"not video data ...........")],
            "media_id long, payload binary")

    def test_metadata_real_vs_fallback(self, vid_df):
        rows = {r["media_id"]: json.loads(r["m"]) for r in vid_df.select(
            "media_id", pxv.get_metadata(F.col("payload")).alias("m")
        ).collect()}
        assert rows[1]["n_frames"] == 6 and rows[1]["fps"] == 10.0
        assert rows[1]["duration_s"] == pytest.approx(0.6)
        assert "magic" in rows[2]

    def test_transforms_real(self, vid_df):
        rows = vid_df.filter("media_id = 1").select(
            pxv.resize(F.col("payload"), 3, 2).alias("rs"),
            pxv.reverse(F.col("payload")).alias("rev"),
            pxv.speed(F.col("payload"), 2.0).alias("sp"),
            pxv.clip_frames(F.col("payload"), 1, 4).alias("cl"),
            pxv.extract_frame(F.col("payload"), 2).alias("fr"),
            pxv.get_duration(F.col("payload")).alias("dur"),
        ).collect()[0]
        assert vc.probe(bytes(rows["rs"]))["width"] == 3
        rev, _ = vc.decode(bytes(rows["rev"]))
        assert rev[0][0, 0, 0] == 5 * 40  # last frame first
        assert vc.probe(bytes(rows["sp"]))["n_frames"] == 3
        assert vc.probe(bytes(rows["cl"]))["n_frames"] == 3
        img = icodec.decode(bytes(rows["fr"]))  # PNG frame
        assert img.size == (6, 4) and img.getpixel((0, 0))[0] == 80
        assert rows["dur"] == pytest.approx(0.6)

    def test_stub_for_non_avi(self, vid_df):
        rows = vid_df.filter("media_id = 2").select(
            pxv.resize(F.col("payload"), 3, 2).alias("rs")).collect()
        assert len(rows[0]["rs"]) == 16  # md5 stub

    def test_frame_iterator_real_png_frames(self, vid_df):
        out = pxv.frame_iterator(vid_df.filter("media_id = 1"),
                                 every_n=2).collect()
        assert [r["frame_idx"] for r in out] == [0, 2, 4]
        img = icodec.decode(bytes(out[1]["frame"]))
        assert img.getpixel((0, 0))[0] == 80

    def test_segment_video_real_subvideos(self, vid_df):
        segs = pxv.segment_video(vid_df.filter("media_id = 1"),
                                 n_segments=3).collect()
        assert len(segs) == 3
        for s in segs:
            assert vc.probe(bytes(s["segment"]))["n_frames"] == 2

    def test_transition_crossfade_real(self, spark):
        a = vc.encode(np.zeros((4, 2, 2, 3), np.uint8), 4.0)
        b = vc.encode(np.full((4, 2, 2, 3), 200, np.uint8), 4.0)
        df = spark.createDataFrame([(a, b)], "a binary, b binary")
        out = df.select(pxv.transition(
            F.col("a"), F.col("b"), seconds=1.0).alias("t")).collect()[0]["t"]
        frames, _ = vc.decode(bytes(out))
        assert len(frames) == 4  # 4 + 4 with a 4-frame overlap
        assert frames[0].max() < frames[-1].min()  # monotone fade

    def test_make_video_from_png_frames(self, spark):
        pngs = [(1, i, icodec.encode_png(
            np.full((3, 5, 3), i * 30, np.uint8), "RGB")) for i in range(4)]
        df = spark.createDataFrame(pngs, "gid long, frame_idx int, frame binary")
        out = pxv.make_video(df, "gid").collect()[0]
        assert out["n_frames"] == 4
        frames, fps = vc.decode(bytes(out["video"]))
        assert frames.shape == (4, 3, 5, 3) and frames[2][0, 0, 0] == 60


class TestComponentViewIntegration:
    """The reference's flagship pattern: a component view exploding videos
    into frames (reference iterators frame_iterator driving
    create_view), with REAL frames and incremental maintenance."""

    @pytest.fixture()
    def frame_view(self, spark, tmp_path):
        import pixeltable_spark as pxt
        cat = pxt.Catalog(spark, str(tmp_path / "wh"))
        t = cat.create_table(
            "vids", {"media_id": pxt.Int(False),
                     "payload": pxt.ColumnType.binary()},
            primary_key=["media_id"])
        t.insert([{"media_id": 1, "payload": _gradient_video(n=4)}])

        @pxt.iterator(output_schema={"frame_idx": pxt.Int(),
                                     "frame": pxt.ColumnType.binary()})
        def frames(payload: bytes):
            fr, _fps = vc.decode(payload)
            for i in range(len(fr)):
                yield {"frame_idx": i,
                       "frame": icodec.encode_png(fr[i], "RGB")}

        v = cat.create_view("vframes", t, iterator=frames.as_view_iterator())
        return cat, t, v

    def test_real_frames_in_view(self, frame_view):
        _cat, _t, v = frame_view
        rows = v.collect()
        assert len(rows) == 4
        img = icodec.decode(bytes(rows[0]["frame"]))
        assert img.size == (6, 4)

    def test_incremental_on_insert(self, frame_view):
        _cat, t, v = frame_view
        t.insert([{"media_id": 2, "payload": _gradient_video(n=3)}])
        assert v.count() == 7  # only the new video explodes

    def test_base_delete_propagates(self, frame_view):
        from pixeltable_spark.exprs import ColumnRef
        _cat, t, v = frame_view
        mid = ColumnRef("media_id", t.schema["media_id"])
        t.delete(where=mid == 1)
        assert v.count() == 0


class TestMjpeg:
    """MJPEG AVI ('MJPG' fourcc, per-frame baseline JPEG chunks) — the
    compressed-video variant the codec can now handle for real."""

    def _flat_frames(self, n=5, h=16, w=24):
        import numpy as np
        return np.stack([np.full((h, w, 3), (i * 40) % 256, np.uint8)
                         for i in range(n)])

    def test_flat_roundtrip_exact(self):
        import numpy as np
        from pixeltable_spark.functions import video_codec as vc
        frames = self._flat_frames()
        p = vc.encode_mjpeg(frames, fps=10)
        info = vc.probe(p)
        assert (info["width"], info["height"], info["n_frames"],
                info["fps"]) == (24, 16, 5, 10.0)
        assert info["compression"] == vc._MJPG
        d, fps = vc.decode(p)
        assert fps == 10.0 and np.array_equal(d, frames)

    def test_smaller_than_dib(self):
        from pixeltable_spark.functions import video_codec as vc
        frames = self._flat_frames()
        assert len(vc.encode_mjpeg(frames, 10)) < len(vc.encode(frames, 10))

    def test_gradient_bounded_error(self):
        import numpy as np
        from pixeltable_spark.functions import video_codec as vc
        yy, xx = np.mgrid[0:16, 0:24]
        g = np.stack([np.dstack([(xx * 8 + i * 3) % 256, (yy * 8) % 256,
                                 ((xx + yy) * 4) % 256]).astype(np.uint8)
                      for i in range(3)])
        d, _ = vc.decode(vc.encode_mjpeg(g, 5, quality=90))
        assert np.abs(d.astype(int) - g.astype(int)).mean() < 3

    def test_frame_kernels_accept_mjpeg(self):
        import numpy as np
        from pixeltable_spark.functions import video_codec as vc
        frames = self._flat_frames()
        d, _ = vc.decode(vc.clip_frames(vc.encode_mjpeg(frames, 10), 1, 3))
        assert np.array_equal(d, frames[1:3])

    def test_other_compression_still_rejected(self):
        import struct

        import numpy as np
        import pytest
        from pixeltable_spark.functions import video_codec as vc
        p = vc.encode_mjpeg(self._flat_frames(), 10)
        p = p.replace(b"MJPG", b"H264")  # strh handler + strf compression
        with pytest.raises(ValueError, match="real codec"):
            vc.decode(p)


class TestFiltersRound3:
    """grayscale/mirror/rotate/brightness/pan/zoom/scroll + splitter +
    concat (reference functions/video/filters.py, iterators.py:361)."""

    def _avi(self, n=6, h=8, w=10, fps=5.0):
        import numpy as np

        from pixeltable_spark.functions import video_codec as vc
        rng = np.random.RandomState(3)
        frames = rng.randint(0, 256, size=(n, h, w, 3), dtype="uint8")
        return frames, vc.encode(frames, fps)

    def _one(self, spark, payload, col_fn):
        from pyspark.sql import functions as F
        df = spark.createDataFrame([(1, bytearray(payload))], ["media_id", "payload"])
        return bytes(df.select(col_fn(F.col("payload")).alias("v"))
                     .collect()[0]["v"])

    def test_mirror_and_rotate(self, spark):
        import numpy as np

        from pixeltable_spark.functions import video as V
        from pixeltable_spark.functions import video_codec as vc
        frames, p = self._avi()
        mx, _ = vc.decode(self._one(spark, p, V.mirror_x))
        assert (mx == frames[:, :, ::-1]).all()
        my, _ = vc.decode(self._one(spark, p, V.mirror_y))
        assert (my == frames[:, ::-1]).all()
        rot, _ = vc.decode(self._one(spark, p, lambda c: V.rotate(c, 1)))
        assert rot.shape == (6, 10, 8, 3)
        assert (rot == np.rot90(frames, k=-1, axes=(1, 2))).all()

    def test_grayscale_and_brightness(self, spark):
        import numpy as np

        from pixeltable_spark.functions import video as V
        from pixeltable_spark.functions import video_codec as vc
        frames, p = self._avi()
        g, _ = vc.decode(self._one(spark, p, V.grayscale))
        assert (g[..., 0] == g[..., 1]).all() and (g[..., 1] == g[..., 2]).all()
        b, _ = vc.decode(self._one(spark, p, lambda c: V.adjust_brightness(c, 0.5)))
        assert (b == np.clip(frames.astype(np.float64) * 0.5, 0, 255)
                .astype(np.uint8)).all()

    def test_pan_scroll_zoom_shapes(self, spark):
        from pixeltable_spark.functions import video as V
        from pixeltable_spark.functions import video_codec as vc
        frames, p = self._avi()
        for fn in (lambda c: V.pan(c, 1), lambda c: V.scroll(c, 1),
                   lambda c: V.zoom(c, 2.0)):
            out, _ = vc.decode(self._one(spark, p, fn))
            assert out.shape == frames.shape

    def test_video_splitter(self, spark):
        from pixeltable_spark.functions import video as V
        from pixeltable_spark.functions import video_codec as vc
        frames, p = self._avi(n=10, fps=5.0)  # 2s video
        df = spark.createDataFrame([(1, bytearray(p))], ["media_id", "payload"])
        segs = V.video_splitter(df, duration=1.0).collect()
        assert [s["pos"] for s in segs] == [0, 1]
        f0, _ = vc.decode(bytes(segs[0]["segment"]))
        assert len(f0) == 5 and segs[0]["start_time"] == 0.0
        assert segs[1]["end_time"] == 2.0
        # overlapping windows
        ov = V.video_splitter(df, duration=1.0, overlap=0.5).collect()
        assert len(ov) > 2

    def test_concat_and_agg(self, spark):
        import numpy as np

        from pixeltable_spark.functions import video as V
        from pixeltable_spark.functions import video_codec as vc
        from pyspark.sql import functions as F
        fa, pa = self._avi(n=3)
        fb, pb = self._avi(n=2)
        df = spark.createDataFrame([(1, bytearray(pa), bytearray(pb))],
                                   ["media_id", "a", "b"])
        out = bytes(df.select(V.concat_videos(F.col("a"), F.col("b"))
                              .alias("v")).collect()[0]["v"])
        fr, _ = vc.decode(out)
        assert (fr == np.concatenate([fa, fb], axis=0)).all()
        parts = spark.createDataFrame(
            [(1, 0, bytearray(pa)), (1, 1, bytearray(pb))],
            ["gid", "pos", "payload"])
        agg = V.concat_videos_agg(parts, "gid").collect()
        fr2, _ = vc.decode(bytes(agg[0]["video"]))
        assert len(fr2) == 5

    def test_scene_detect_variants(self, spark):
        import numpy as np

        from pixeltable_spark.functions import video as V
        from pyspark.sql import functions as F
        from pixeltable_spark.functions import video_codec as vc
        # intensity change: content/threshold/histogram/adaptive see it
        dark = np.zeros((4, 8, 10, 3), dtype="uint8")
        light = np.full((4, 8, 10, 3), 220, dtype="uint8")
        p1 = vc.encode(np.concatenate([dark, light]), 5.0)
        # structure change at constant intensity distribution: the
        # mean-relative aHash sees it where the histogram cannot
        a = np.zeros((4, 8, 10, 3), dtype="uint8"); a[:, :, :5] = 220
        b = np.zeros((4, 8, 10, 3), dtype="uint8"); b[:, :4, :] = 220
        p2 = vc.encode(np.concatenate([a, b]), 5.0)
        df = spark.createDataFrame(
            [(1, bytearray(p1)), (2, bytearray(p2))], ["media_id", "payload"])
        got = {}
        for fn in (V.scene_detect_content, V.scene_detect_histogram,
                   V.scene_detect_hash, V.scene_detect_threshold,
                   V.scene_detect_adaptive):
            got[fn.__name__] = {
                r["media_id"]: r["c"] for r in
                df.select("media_id", fn(F.col("payload")).alias("c"))
                  .collect()}
        for name in ("scene_detect_content", "scene_detect_threshold",
                     "scene_detect_histogram", "scene_detect_adaptive"):
            assert 4 in got[name][1], name
        assert got["scene_detect_hash"][2] == [4]
        assert got["scene_detect_histogram"][2] == []  # designed blind spot

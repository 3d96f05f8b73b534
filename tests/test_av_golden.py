"""PyAV-present golden lane: when the real `av` package is importable,
encode real media WITH PyAV, then cross-check our pure-Python structural
parsers (audio_codec/video_codec) against PyAV's own demux/decode of the
same bytes. Closes the loop on the escalation contract
(test_av_escalation.py tests the routing with a FAKE av; this suite
validates the structural layer against a REAL codec stack).

Skips cleanly — at module level — in environments without PyAV (such as
this sandbox); runs wherever `pip install av` has happened. Each codec
is additionally gated on encoder availability inside the local FFmpeg
build (e.g. libmp3lame may be compiled out).

Reference parity: the reference's media tests decode via PyAV directly
(pixeltable functions/audio.py:26-300, functions/video/editing.py); our
structural indexes must agree with that decode on frame/sample counts,
durations and dimensions.
"""

import io
import math

import pytest

av = pytest.importorskip("av")

from pixeltable_spark.functions import audio_codec as ac
from pixeltable_spark.functions import video_codec as vc
from pixeltable_spark.functions import video as V


def _encoder_available(name: str) -> bool:
    try:
        av.CodecContext.create(name, "w")
        return True
    except Exception:
        return False


def _encode_audio(codec: str, fmt: str, seconds: float = 1.0,
                  rate: int = 44100) -> bytes:
    """Encode a sine sweep to `fmt` container bytes with PyAV."""
    import numpy as np
    buf = io.BytesIO()
    out = av.open(buf, mode="w", format=fmt)
    stream = out.add_stream(codec, rate=rate)
    n = int(seconds * rate)
    t = np.arange(n, dtype=np.float64) / rate
    pcm = (0.4 * np.sin(2 * math.pi * 440.0 * t) * 32767).astype("int16")
    frame = av.AudioFrame.from_ndarray(pcm.reshape(1, -1), format="s16",
                                       layout="mono")
    frame.sample_rate = rate
    for pkt in stream.encode(frame):
        out.mux(pkt)
    for pkt in stream.encode(None):
        out.mux(pkt)
    out.close()
    return buf.getvalue()


def _encode_h264_mp4(w: int = 64, h: int = 48, n_frames: int = 25,
                     fps: int = 25) -> bytes:
    import numpy as np
    buf = io.BytesIO()
    out = av.open(buf, mode="w", format="mp4")
    stream = out.add_stream("libx264", rate=fps)
    stream.width, stream.height = w, h
    stream.pix_fmt = "yuv420p"
    for i in range(n_frames):
        img = np.full((h, w, 3), (i * 9) % 256, dtype=np.uint8)
        img[:, : (i * 2) % w] = 255 - img[:, : (i * 2) % w]
        frame = av.VideoFrame.from_ndarray(img, format="rgb24")
        for pkt in stream.encode(frame):
            out.mux(pkt)
    for pkt in stream.encode(None):
        out.mux(pkt)
    out.close()
    return buf.getvalue()


def _decode_audio_samples(payload: bytes) -> tuple[int, int]:
    """(total decoded samples, rate) via PyAV."""
    total, rate = 0, 0
    with av.open(io.BytesIO(payload)) as c:
        for frame in c.decode(audio=0):
            total += frame.samples
            rate = frame.sample_rate
    return total, rate


class TestMp3Golden:
    @pytest.fixture(scope="class")
    def mp3(self):
        if not _encoder_available("libmp3lame"):
            pytest.skip("FFmpeg built without libmp3lame")
        return _encode_audio("libmp3lame", "mp3")

    def test_frame_index_matches_pyav_packets(self, mp3):
        frames = ac.mp3_frame_index(mp3)
        # drop the LAME/Xing metadata frame our index intentionally keeps
        data = [f for f in frames if not ac._is_info_frame(mp3, f)]
        with av.open(io.BytesIO(mp3)) as c:
            pkts = sum(1 for p in c.demux(audio=0) if p.size > 0)
        assert len(data) == pkts

    def test_duration_matches_decoded_pcm(self, mp3):
        samples, rate = _decode_audio_samples(mp3)
        # encoder/decoder delay trims at most ~2 frames' worth of PCM
        assert abs(ac.mp3_duration(mp3) - samples / rate) < 0.1

    def test_split_segments_decode_and_sum(self, mp3):
        segs = ac.mp3_split(mp3, 0.3)
        assert len(segs) >= 2
        total = 0.0
        for (_t0, _t1, seg_bytes) in segs:
            samples, rate = _decode_audio_samples(seg_bytes)
            assert samples > 0          # every segment decodes standalone
            total += samples / rate
        assert abs(total - ac.mp3_duration(mp3)) < 0.15


class TestAdtsGolden:
    @pytest.fixture(scope="class")
    def adts(self):
        if not _encoder_available("aac"):
            pytest.skip("FFmpeg built without an AAC encoder")
        return _encode_audio("aac", "adts")

    def test_frame_index_matches_pyav_packets(self, adts):
        frames = ac.adts_frame_index(adts)
        with av.open(io.BytesIO(adts)) as c:
            pkts = sum(1 for p in c.demux(audio=0) if p.size > 0)
        assert len(frames) == pkts
        # byte-exact frame boundaries: re-demuxing one indexed frame works
        f0 = frames[0]
        one = adts[f0["offset"]: f0["offset"] + f0["size"]]
        assert ac.adts_frame_index(one)[0]["size"] == f0["size"]


class TestMp4H264Golden:
    @pytest.fixture(scope="class")
    def mp4(self):
        if not _encoder_available("libx264"):
            pytest.skip("FFmpeg built without libx264")
        return _encode_h264_mp4()

    def test_sample_index_matches_decoded_frames(self, mp4):
        idx = vc.mp4_sample_index(mp4)
        with av.open(io.BytesIO(mp4)) as c:
            decoded = sum(1 for _ in c.decode(video=0))
        assert len(idx) == decoded == 25

    def test_sample_offsets_are_byte_exact_access_units(self, mp4):
        """Each indexed (offset, size) range must parse as H.264
        length-prefixed NAL units — proves stsc/stco/stsz arithmetic."""
        ls = vc.mp4_avc_config(mp4)["nal_length_size"]
        idx = vc.mp4_sample_index(mp4)
        for s in idx[:5]:
            au = mp4[s["offset"]: s["offset"] + s["size"]]
            nals = vc.h264_nal_units(au, length_size=ls)
            assert nals
            assert sum(ls + n["size"] for n in nals) == len(au)

    def test_sps_dimensions_match_pyav(self, mp4):
        with av.open(io.BytesIO(mp4)) as c:
            st = c.streams.video[0]
            w, h = st.width, st.height
        sps = vc.mp4_avc_config(mp4)  # SPS from the avcC box (stsd)
        assert sps is not None
        assert (sps["width"], sps["height"]) == (w, h)

    def test_probe_any_routes_through_pyav(self, mp4):
        info = V.probe_any(mp4)
        assert info["via"] == "pyav"
        assert (info["width"], info["height"]) == (64, 48)

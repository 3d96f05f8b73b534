"""ISO BMFF (MP4/M4A) metadata probing: hand-built box trees per
ISO/IEC 14496-12 pin the walker (64-bit largesize, v0/v1 headers, track
kinds, sample-entry codecs). Reference parity: pixeltable reads MP4
metadata via PyAV (reference functions/video.py get_metadata)."""

from __future__ import annotations

import struct

from pixeltable_spark.functions import audio_codec as ac
from pixeltable_spark.functions import video_codec as vc


def box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + fourcc + payload


def big_box(fourcc: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", 1) + fourcc
            + struct.pack(">Q", len(payload) + 16) + payload)


def _mvhd_v0(timescale: int, duration: int) -> bytes:
    return box(b"mvhd", b"\x00" + b"\x00" * 3 + b"\x00" * 8
               + struct.pack(">II", timescale, duration) + b"\x00" * 80)


def _mvhd_v1(timescale: int, duration: int) -> bytes:
    return box(b"mvhd", b"\x01" + b"\x00" * 3 + b"\x00" * 16
               + struct.pack(">I", timescale)
               + struct.pack(">Q", duration) + b"\x00" * 80)


def _tkhd(w: int, h: int) -> bytes:
    # v0 header: 4 + 4*3 + 4 + 4 + 4 + 8 + 2*4 + 36 then width/height 16.16
    body = (b"\x00" * 4 + b"\x00" * 12 + struct.pack(">I", 1) + b"\x00" * 4
            + struct.pack(">I", 0) + b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 36
            + struct.pack(">II", w << 16, h << 16))
    return box(b"tkhd", body)


def _mdhd_v0(timescale: int, duration: int) -> bytes:
    return box(b"mdhd", b"\x00" * 4 + b"\x00" * 8
               + struct.pack(">II", timescale, duration) + b"\x00" * 4)


def _hdlr(kind: bytes) -> bytes:
    return box(b"hdlr", b"\x00" * 4 + b"\x00" * 4 + kind + b"\x00" * 12)


def _stsd_video(codec: bytes) -> bytes:
    entry = box(codec, b"\x00" * 78)           # VisualSampleEntry body
    return box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)


def _stsd_audio(codec: bytes, channels: int, rate: int) -> bytes:
    body = (b"\x00" * 6 + struct.pack(">H", 1)        # SampleEntry
            + b"\x00" * 8                              # version/revision/vendor
            + struct.pack(">HH", channels, 16)         # channelcount, size
            + b"\x00" * 4 + struct.pack(">I", rate << 16))
    return box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + box(codec, body))


def _video_trak(w, h, codec=b"avc1", ts=30000, dur=90000) -> bytes:
    stbl = box(b"stbl", _stsd_video(codec))
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", _mdhd_v0(ts, dur) + _hdlr(b"vide") + minf)
    return box(b"trak", _tkhd(w, h) + mdia)


def _audio_trak(codec=b"mp4a", channels=2, rate=44100, dur=441000) -> bytes:
    stbl = box(b"stbl", _stsd_audio(codec, channels, rate))
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", _mdhd_v0(rate, dur) + _hdlr(b"soun") + minf)
    return box(b"trak", _tkhd(0, 0) + mdia)


class TestMp4Probe:
    def test_video_file(self):
        blob = (box(b"ftyp", b"isom" + b"\x00" * 12)
                + box(b"moov", _mvhd_v0(1000, 12500)
                      + _video_trak(1920, 1080)
                      + _audio_trak())
                + box(b"mdat", b"\x00" * 64))
        info = vc.probe(blob)
        assert info["format"] == "MP4" and info["brand"] == "isom"
        assert info["duration_s"] == 12.5
        assert info["width"] == 1920 and info["height"] == 1080
        assert info["video_codec"] == "avc1"
        assert info["audio_codec"] == "mp4a"
        assert info["sample_rate"] == 44100 and info["channels"] == 2
        assert info["n_tracks"] == 2

    def test_m4a_through_audio_waist(self):
        blob = (box(b"ftyp", b"M4A " + b"\x00" * 12)
                + box(b"moov", _mvhd_v0(44100, 441000)
                      + _audio_trak(codec=b"mp4a", channels=1, rate=22050)))
        info = ac.probe(blob)
        assert info["format"] == "MP4" and info["brand"] == "M4A"
        assert info["audio_codec"] == "mp4a"
        assert info["channels"] == 1 and info["sample_rate"] == 22050
        assert info["duration_s"] == 10.0

    def test_v1_mvhd_and_largesize(self):
        moov = big_box(b"moov", _mvhd_v1(600, 3600)
                       + _video_trak(640, 480, codec=b"hvc1"))
        blob = box(b"ftyp", b"mp42" + b"\x00" * 4) + moov
        info = vc.probe(blob)
        assert info["duration_s"] == 6.0
        assert info["video_codec"] == "hvc1"
        assert (info["width"], info["height"]) == (640, 480)

    def test_truncated_degrades_not_raises(self):
        blob = (box(b"ftyp", b"isom" + b"\x00" * 12)
                + box(b"moov", _mvhd_v0(1000, 5000)
                      + _video_trak(320, 240)))
        for cut in (10, 30, len(blob) // 2, len(blob) - 3):
            info = vc.probe(blob[:cut])
            assert info is None or info["format"] == "MP4"

    def test_non_bmff_rejected(self):
        assert vc.probe_mp4(b"\x00" * 40) is None
        assert vc.probe(b"RIFF" + b"\x00" * 20) is None  # not AVI

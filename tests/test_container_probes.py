"""Container metadata probes beyond ISO BMFF: EBML (Matroska/WebM per the
public Matroska spec), Ogg (RFC 3533 pages + Vorbis I / RFC 7845 Opus id
headers), and AVIF/HEIC dims (meta>iprp>ipco>ispe). All bitstreams are
hand-built from the specs."""

from __future__ import annotations

import struct

from pixeltable_spark.functions import audio_codec as ac
from pixeltable_spark.functions import image_codec as ic
from pixeltable_spark.functions import video_codec as vc


# -- EBML builders ----------------------------------------------------------

def _vint_size(n: int) -> bytes:
    """Encode a size as a 2-byte EBML VINT (marker 0x40)."""
    assert n < (1 << 14) - 1
    return struct.pack(">H", 0x4000 | n)


def el(eid: int, body: bytes) -> bytes:
    nbytes = max(1, (eid.bit_length() + 7) // 8)
    return eid.to_bytes(nbytes, "big") + _vint_size(len(body)) + body


def _ebml_header(doctype: bytes) -> bytes:
    return el(0x1A45DFA3, el(0x4282, doctype))


def _mkv(doctype=b"matroska", dur_units=4500.0, tscale=1_000_000,
         tracks=b"") -> bytes:
    info = el(0x1549A966,
              el(0x2AD7B1, tscale.to_bytes(4, "big"))
              + el(0x4489, struct.pack(">d", dur_units)))
    seg = el(0x18538067, info + el(0x1654AE6B, tracks))
    return _ebml_header(doctype) + seg


def _video_track(w, h, codec=b"V_VP9") -> bytes:
    video = el(0xE0, el(0xB0, w.to_bytes(2, "big"))
               + el(0xBA, h.to_bytes(2, "big")))
    return el(0xAE, el(0x83, b"\x01") + el(0x86, codec) + video)


def _audio_track(rate=48000.0, channels=2, codec=b"A_OPUS") -> bytes:
    audio = el(0xE1, el(0xB5, struct.pack(">f", rate))
               + el(0x9F, bytes([channels])))
    return el(0xAE, el(0x83, b"\x02") + el(0x86, codec) + audio)


class TestEbmlProbe:
    def test_webm_av(self):
        blob = _mkv(b"webm", dur_units=12500.0,
                    tracks=_video_track(1280, 720) + _audio_track())
        info = vc.probe(blob)
        assert info["format"] == "WEBM" and info["doctype"] == "webm"
        assert info["duration_s"] == 12.5
        assert (info["width"], info["height"]) == (1280, 720)
        assert info["video_codec"] == "V_VP9"
        assert info["audio_codec"] == "A_OPUS"
        assert info["sample_rate"] == 48000 and info["channels"] == 2
        assert info["n_tracks"] == 2

    def test_mkv_custom_timescale(self):
        # tscale 500000 ns -> 4500 units = 2.25 s
        blob = _mkv(b"matroska", dur_units=4500.0, tscale=500_000,
                    tracks=_video_track(320, 240, codec=b"V_MPEG4/ISO/AVC"))
        info = vc.probe(blob)
        assert info["format"] == "MKV"
        assert info["duration_s"] == 2.25
        assert info["video_codec"] == "V_MPEG4/ISO/AVC"

    def test_truncated_degrades(self):
        blob = _mkv(b"webm", tracks=_video_track(640, 480))
        for cut in (3, 10, len(blob) // 2):
            info = vc.probe(blob[:cut])
            assert info is None or info["format"] in ("MKV", "WEBM")


# -- Ogg builders -----------------------------------------------------------

def _ogg_page(body: bytes, granule: int = 0, seq: int = 0) -> bytes:
    segs = []
    rem = len(body)
    while rem >= 255:
        segs.append(255)
        rem -= 255
    segs.append(rem)
    hdr = (b"OggS" + b"\x00" + b"\x02"      # version, header-type (BOS)
           + struct.pack("<q", granule)
           + struct.pack("<I", 1)            # serial
           + struct.pack("<I", seq)
           + struct.pack("<I", 0)            # crc (unchecked by probe)
           + bytes([len(segs)]) + bytes(segs))
    return hdr + body


class TestOggProbe:
    def test_opus(self):
        ident = (b"OpusHead" + b"\x01" + b"\x02"          # ver, channels
                 + struct.pack("<H", 312)                  # pre-skip
                 + struct.pack("<I", 44100) + b"\x00" * 3)
        last = _ogg_page(b"\x00" * 10, granule=48000 * 3 + 312, seq=7)
        info = ac.probe(_ogg_page(ident) + last)
        assert info["format"] == "OGG" and info["encoding"] == "opus"
        assert info["channels"] == 2
        assert info["sample_rate"] == 48000
        assert info["input_sample_rate"] == 44100
        assert info["duration_s"] == 3.0

    def test_vorbis(self):
        ident = (b"\x01vorbis" + struct.pack("<I", 0) + b"\x02"
                 + struct.pack("<I", 22050) + b"\x00" * 16)
        last = _ogg_page(b"\x00" * 10, granule=22050 * 2, seq=3)
        info = ac.probe(_ogg_page(ident) + last)
        assert info["encoding"] == "vorbis"
        assert info["channels"] == 2 and info["sample_rate"] == 22050
        assert info["duration_s"] == 2.0

    def test_unknown_payload(self):
        info = ac.probe(_ogg_page(b"\x80theora" + b"\x00" * 20))
        assert info["format"] == "OGG" and info["encoding"] == "unknown"


# -- AVIF -------------------------------------------------------------------

def box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + fourcc + payload


class TestAvifProbe:
    def test_avif_dims_via_image_waist(self):
        ispe = box(b"ispe", b"\x00" * 4 + struct.pack(">II", 1024, 768))
        meta = box(b"meta", b"\x00" * 4
                   + box(b"iprp", box(b"ipco", ispe)))
        blob = box(b"ftyp", b"avif" + b"\x00" * 8) + meta
        info = ic.probe(blob)
        assert info["format"] == "AVIF"
        assert (info["width"], info["height"]) == (1024, 768)
        v = vc.probe(blob)
        assert v["format"] == "AVIF" and v["width"] == 1024

    def test_heic(self):
        ispe = box(b"ispe", b"\x00" * 4 + struct.pack(">II", 400, 300))
        meta = box(b"meta", b"\x00" * 4 + box(b"iprp", box(b"ipco", ispe)))
        blob = box(b"ftyp", b"heic" + b"\x00" * 8) + meta
        info = ic.probe(blob)
        assert info["format"] == "HEIC" and info["height"] == 300


# -- ID3v2 ------------------------------------------------------------------

def _id3_frame(fid: bytes, text: str, enc: int = 3,
               syncsafe: bool = False) -> bytes:
    body = bytes([enc]) + text.encode(
        {0: "latin-1", 1: "utf-16", 3: "utf-8"}[enc])
    n = len(body)
    if syncsafe:
        size = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                      (n >> 7) & 0x7F, n & 0x7F])
    else:
        size = struct.pack(">I", n)
    return fid + size + b"\x00\x00" + body


def _id3_tag(frames: bytes, major: int = 3) -> bytes:
    n = len(frames)
    size = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])
    return b"ID3" + bytes([major, 0, 0]) + size + frames


def _mp3_frame() -> bytes:
    # MPEG1 Layer III, 128 kbps, 44100 Hz, stereo
    return b"\xff\xfb\x90\x00" + b"\x00" * 413


class TestId3Tags:
    def test_v23_text_frames(self):
        frames = (_id3_frame(b"TIT2", "A Title")
                  + _id3_frame(b"TPE1", "Somebody")
                  + _id3_frame(b"TALB", "An Album", enc=1))
        blob = _id3_tag(frames, major=3) + _mp3_frame()
        info = ac.probe(blob)
        assert info["format"] == "MP3"
        assert info["tags"] == {"title": "A Title", "artist": "Somebody",
                                "album": "An Album"}

    def test_v24_syncsafe_sizes(self):
        frames = _id3_frame(b"TIT2", "X" * 200, syncsafe=True) \
            + _id3_frame(b"TCON", "Jazz", syncsafe=True)
        blob = _id3_tag(frames, major=4) + _mp3_frame()
        info = ac.probe(blob)
        assert info["tags"]["title"] == "X" * 200
        assert info["tags"]["genre"] == "Jazz"

    def test_untagged_mp3_has_no_tags_key(self):
        info = ac.probe(_mp3_frame())
        assert info["format"] == "MP3" and "tags" not in info

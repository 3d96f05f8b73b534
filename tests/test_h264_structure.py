"""H.264 structural layer (functions/video_codec.py; public ISO/IEC
14496-10): NAL indexing for Annex B and AVCC framing, Exp-Golomb SPS
parsing with frame cropping, avcC extraction. The test builds SPS
bitstreams with its own independent Exp-Golomb writer following the
§7.3.2.1 grammar, so writer and parser validate each other."""

from __future__ import annotations

import struct

import pytest

from pixeltable_spark.functions import video_codec as vc


class BitWriter:
    def __init__(self):
        self.bits: list = []

    def u(self, val: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def ue(self, k: int):
        k += 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def bytes_(self) -> bytes:
        bits = self.bits + [1] + [0] * ((8 - (len(self.bits) + 1) % 8) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        # emulation prevention (00 00 0x -> 00 00 03 0x)
        esc = bytearray()
        zeros = 0
        for b in out:
            if zeros >= 2 and b <= 3:
                esc.append(3)
                zeros = 0
            esc.append(b)
            zeros = zeros + 1 if b == 0 else 0
        return bytes(esc)


def mk_sps(width: int, height: int, profile: int = 66,
           level: int = 31) -> bytes:
    """SPS NAL for frame_mbs_only progressive video; adds bottom/right
    cropping when dims are not multiples of 16."""
    w = BitWriter()
    w.u(profile, 8)
    w.u(0, 8)               # constraint flags
    w.u(level, 8)
    w.ue(0)                 # sps id
    if profile == 100:
        w.ue(1)             # chroma_format_idc 4:2:0
        w.ue(0)             # bit_depth_luma_minus8
        w.ue(0)             # bit_depth_chroma_minus8
        w.u(0, 1)           # qpprime
        w.u(0, 1)           # no scaling matrix
    w.ue(4)                 # log2_max_frame_num_minus4
    w.ue(0)                 # poc type 0
    w.ue(4)                 # log2_max_poc_lsb_minus4
    w.ue(1)                 # max_num_ref_frames
    w.u(0, 1)               # gaps
    wm = (width + 15) // 16
    hm = (height + 15) // 16
    w.ue(wm - 1)
    w.ue(hm - 1)
    w.u(1, 1)               # frame_mbs_only
    w.u(0, 1)               # direct_8x8
    crop_r = (wm * 16 - width) // 2
    crop_b = (hm * 16 - height) // 2
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)               # vui absent
    return bytes([0x67]) + w.bytes_()


class TestSps:
    @pytest.mark.parametrize("wh,profile", [
        ((640, 480), 66), ((1920, 1080), 100), ((1280, 720), 66),
        ((176, 144), 66), ((3840, 2160), 100), ((854, 480), 100)])
    def test_dims_roundtrip(self, wh, profile):
        sps = vc.h264_parse_sps(mk_sps(*wh, profile=profile))
        assert sps is not None
        assert (sps["width"], sps["height"]) == wh
        assert sps["profile_idc"] == profile
        assert sps["interlaced"] is False

    def test_not_sps(self):
        assert vc.h264_parse_sps(bytes([0x65, 0xFF])) is None
        assert vc.h264_parse_sps(b"") is None


class TestNalIndex:
    def test_annexb_stream(self):
        sps = mk_sps(640, 480)
        pps = bytes([0x68, 0xCE, 0x38, 0x80])
        idr = bytes([0x65]) + bytes(40)
        nonidr = bytes([0x41]) + bytes(25)
        p = (b"\x00\x00\x00\x01" + sps + b"\x00\x00\x01" + pps
             + b"\x00\x00\x00\x01" + idr + b"\x00\x00\x01" + nonidr)
        nals = vc.h264_nal_units(p)
        assert [x["type"] for x in nals] == [7, 8, 5, 1]
        assert [x["idr"] for x in nals] == [False, False, True, False]
        info = vc.h264_stream_info(p)
        assert info["width"] == 640 and info["n_idr"] == 1
        assert info["n_nals"] == 4

    def test_avcc_length_prefixed(self):
        sps = mk_sps(1280, 720)
        idr = bytes([0x65]) + bytes(30)
        p = (struct.pack(">I", len(sps)) + sps
             + struct.pack(">I", len(idr)) + idr)
        nals = vc.h264_nal_units(p, length_size=4)
        assert [x["type"] for x in nals] == [7, 5]
        info = vc.h264_stream_info(p, length_size=4)
        assert (info["width"], info["height"]) == (1280, 720)

    def test_garbage_returns_empty(self):
        assert vc.h264_nal_units(b"\xff" * 64) == []
        assert vc.h264_stream_info(b"") is None


class TestAvcC:
    def test_avcc_extraction(self):
        sps = mk_sps(1920, 1080, profile=100)
        pps = bytes([0x68, 0xCE, 0x38, 0x80])
        avcc_body = (bytes([1, 100, 0, 31, 0xFF, 0xE1])
                     + struct.pack(">H", len(sps)) + sps
                     + bytes([1]) + struct.pack(">H", len(pps)) + pps)
        box = struct.pack(">I", 8 + len(avcc_body)) + b"avcC" + avcc_body
        payload = b"junkpadding" + box + b"tail"
        cfg = vc.mp4_avc_config(payload)
        assert cfg is not None
        assert (cfg["width"], cfg["height"]) == (1920, 1080)
        assert cfg["nal_length_size"] == 4
        assert cfg["profile_idc"] == 100

    def test_no_avcc(self):
        assert vc.mp4_avc_config(b"no box here") is None

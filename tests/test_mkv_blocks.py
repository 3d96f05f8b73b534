"""Matroska/WebM block toolkit (functions/video_codec.py; public RFC
8794 EBML + Matroska element registry): per-block timestamps and
keyframe flags from Cluster/SimpleBlock/BlockGroup, cluster-aligned
stream-copy segmentation with the unknown-size Segment rewrite. Test
vectors are synthesized EBML built element-by-element."""

from __future__ import annotations

import struct

import pytest

from pixeltable_spark.functions import video_codec as vc


def vint_size(n: int) -> bytes:
    """EBML size vint (1-4 bytes, marker in the top bits)."""
    if n < (1 << 7) - 1:
        return bytes([0x80 | n])
    if n < (1 << 14) - 1:
        return bytes([0x40 | (n >> 8), n & 0xFF])
    if n < (1 << 21) - 1:
        return bytes([0x20 | (n >> 16), (n >> 8) & 0xFF, n & 0xFF])
    return bytes([0x10 | (n >> 24), (n >> 16) & 0xFF, (n >> 8) & 0xFF,
                  n & 0xFF])


def el(eid: int, body: bytes) -> bytes:
    nid = eid.bit_length() + 7 >> 3
    return eid.to_bytes(nid, "big") + vint_size(len(body)) + body


def simple_block(track: int, rel_ts: int, keyframe: bool,
                 data: bytes = b"\x00" * 8) -> bytes:
    body = bytes([0x80 | track]) + struct.pack(">h", rel_ts) \
        + bytes([0x80 if keyframe else 0x00]) + data
    return el(0xA3, body)


def block_group(track: int, rel_ts: int, ref: bool,
                data: bytes = b"\x00" * 8) -> bytes:
    blk = el(0xA1, bytes([0x80 | track]) + struct.pack(">h", rel_ts)
             + b"\x00" + data)
    refb = el(0xFB, b"\xff") if ref else b""
    return el(0xA0, blk + refb)


def cluster(ctime: int, blocks: bytes) -> bytes:
    return el(0x1F43B675, el(0xE7, ctime.to_bytes(2, "big")) + blocks)


def build_mkv(tscale: int = 1_000_000):
    ebml_hdr = el(0x1A45DFA3, el(0x4282, b"matroska"))
    info = el(0x1549A966, el(0x2AD7B1, tscale.to_bytes(3, "big")))
    tracks = el(0x1654AE6B, el(0xAE, el(0x83, b"\x01") + el(0x86, b"V_T")))
    # 3 clusters at 0 / 100 / 200 ms (tscale = 1 ms per unit at 1e6 ns)
    c0 = cluster(0, simple_block(1, 0, True) + simple_block(1, 40, False))
    c1 = cluster(100, simple_block(1, 0, True)
                 + block_group(1, 40, ref=True))
    c2 = cluster(200, block_group(1, 0, ref=False)
                 + simple_block(1, 40, False))
    seg_body = info + tracks + c0 + c1 + c2
    segment = el(0x18538067, seg_body)
    return ebml_hdr + segment


class TestBlockIndex:
    def test_timestamps_and_keyframes(self):
        p = build_mkv()
        idx = vc.mkv_block_index(p)
        assert len(idx) == 6
        assert [b["t"] for b in idx] == [0.0, 0.04, 0.1, 0.14, 0.2, 0.24]
        # SimpleBlock flag / BlockGroup ReferenceBlock semantics
        assert [b["keyframe"] for b in idx] == \
            [True, False, True, False, True, False]
        assert all(b["track"] == 1 and b["n_frames"] == 1 for b in idx)
        assert vc.mkv_keyframe_times(p) == [0.0, 0.1, 0.2]

    def test_timestamp_scale_honored(self):
        p = build_mkv(tscale=500_000)  # 0.5 ms units
        idx = vc.mkv_block_index(p)
        assert idx[2]["t"] == pytest.approx(0.05, abs=1e-9)

    def test_probe_still_works(self):
        info = vc.probe_ebml(build_mkv())
        assert info["format"] == "MKV" and info["n_tracks"] == 1

    def test_not_mkv_empty(self):
        assert vc.mkv_block_index(b"\x00" * 40) == []
        assert vc.mkv_split(b"RIFF" * 4, 1.0) == []


class TestSplit:
    def test_cluster_aligned_segments(self):
        p = build_mkv()
        segs = vc.mkv_split(p, duration=0.1)
        assert len(segs) == 3  # one per cluster at 100 ms spacing
        for t0, t1, s in segs:
            sub = vc.mkv_block_index(s)
            assert len(sub) == 2, "segment lost blocks"
            assert sub[0]["t"] == 0.0 or sub[0]["t"] >= 0.0
            assert vc.probe_ebml(s)["format"] == "MKV"
        # block times inside each segment match the original clusters
        assert [vc.mkv_block_index(s)[0]["keyframe"]
                for _, _, s in segs] == [True, True, True]
        # boundaries are contiguous
        assert [x[0] for x in segs] == [0.0, 0.1, 0.2]

    def test_single_segment_when_duration_large(self):
        p = build_mkv()
        segs = vc.mkv_split(p, duration=10.0)
        assert len(segs) == 1
        assert len(vc.mkv_block_index(segs[0][2])) == 6

    def test_segment_keeps_tracks_metadata(self):
        """The unknown-size Segment rewrite must carry Info+Tracks so a
        demuxer can interpret the clusters."""
        p = build_mkv()
        _, _, s = vc.mkv_split(p, duration=10.0)[0]
        info = vc.probe_ebml(s)
        assert info["n_tracks"] == 1

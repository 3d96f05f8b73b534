"""MP4 sample-table toolkit (functions/video_codec.py; public ISO/IEC
14496-12 stbl layout): exact per-sample timestamps/sizes/offsets,
keyframes, sample-table duration, access-unit extraction, GOP-aligned
segmentation. The test vector is a synthesized-but-valid BMFF file
built box-by-box, so every table interaction (multi-entry stts, stsc
chunk map, ctts offsets, stss) is exercised with known ground truth."""

from __future__ import annotations

import struct

import pytest

from pixeltable_spark.functions import video_codec as vc


def box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def full(fourcc: bytes, body: bytes, ver: int = 0) -> bytes:
    return box(fourcc, bytes([ver, 0, 0, 0]) + body)


def build_mp4(sizes, deltas, sync, timescale=600, stsc=None, ctts=None):
    """Valid minimal MP4: ftyp + mdat (concatenated samples with
    recognizable content) + moov/trak(vide)/stbl. Returns (payload,
    expected absolute sample offsets)."""
    n = len(sizes)
    samples = [bytes([i % 251]) * sz for i, sz in enumerate(sizes)]
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat_body = b"".join(samples)
    mdat_off = len(ftyp) + 8
    # chunk layout: default one chunk holding all samples
    stsc = stsc or [(1, n, 1)]
    # chunk offsets: walk the stsc map over the concatenated samples
    chunk_offsets, si, pos = [], 0, mdat_off
    ci = 0
    while si < n:
        ci += 1
        spc = 0
        for first, per, _d in stsc:
            if ci >= first:
                spc = per
        chunk_offsets.append(pos)
        for _ in range(min(spc, n - si)):
            pos += sizes[si]
            si += 1
    expected_offsets, si = [], 0
    ci = 0
    pos_iter = iter(chunk_offsets)
    si = 0
    for co_i, co in enumerate(chunk_offsets):
        spc = 0
        for first, per, _d in stsc:
            if co_i + 1 >= first:
                spc = per
        p = co
        for _ in range(min(spc, n - si)):
            expected_offsets.append(p)
            p += sizes[si]
            si += 1
    stts_body = struct.pack(">I", len(deltas)) + b"".join(
        struct.pack(">II", c, d) for c, d in deltas)
    stsz_body = struct.pack(">II", 0, n) + b"".join(
        struct.pack(">I", s) for s in sizes)
    stsc_body = struct.pack(">I", len(stsc)) + b"".join(
        struct.pack(">III", a, b, c) for a, b, c in stsc)
    stco_body = struct.pack(">I", len(chunk_offsets)) + b"".join(
        struct.pack(">I", c) for c in chunk_offsets)
    stbl_children = [
        full(b"stsd", struct.pack(">I", 1)
             + box(b"avc1", b"\x00" * 78)),
        full(b"stts", stts_body),
        full(b"stsz", stsz_body),
        full(b"stsc", stsc_body),
        full(b"stco", stco_body),
    ]
    if sync is not None:
        stss_body = struct.pack(">I", len(sync)) + b"".join(
            struct.pack(">I", s) for s in sync)
        stbl_children.append(full(b"stss", stss_body))
    if ctts is not None:
        ctts_body = struct.pack(">I", len(ctts)) + b"".join(
            struct.pack(">II", c, o) for c, o in ctts)
        stbl_children.append(full(b"ctts", ctts_body))
    stbl = box(b"stbl", b"".join(stbl_children))
    total = sum(c * d for c, d in deltas)
    mdhd = full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, total,
                                     0x55C4, 0))
    hdlr = full(b"hdlr", struct.pack(">I", 0) + b"vide"
                + b"\x00" * 12 + b"Video\x00")
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = full(b"tkhd", b"\x00" * 72 + struct.pack(
        ">II", 320 << 16, 240 << 16))
    trak = box(b"trak", tkhd + mdia)
    mvhd = full(b"mvhd", struct.pack(">IIII", 0, 0, timescale, total)
                + b"\x00" * 80)
    moov = box(b"moov", mvhd + trak)
    return ftyp + box(b"mdat", mdat_body) + moov, expected_offsets


SIZES = [50, 20, 30, 40, 25, 35, 45, 15, 55, 10]
DELTAS = [(4, 100), (6, 50)]          # 4 samples @100 + 6 @50 ticks
SYNC = [1, 5, 9]                       # keyframes at samples 1, 5, 9


class TestSampleIndex:
    def test_full_index_ground_truth(self):
        p, offs = build_mp4(SIZES, DELTAS, SYNC)
        idx = vc.mp4_sample_index(p)
        assert len(idx) == 10
        assert [s["size"] for s in idx] == SIZES
        assert [s["offset"] for s in idx] == offs
        want_dts = [0, 100, 200, 300, 400, 450, 500, 550, 600, 650]
        assert [s["dts"] for s in idx] == want_dts
        assert [s["t"] for s in idx] == [round(d / 600, 6) for d in want_dts]
        assert [s["keyframe"] for s in idx] == \
            [True, False, False, False, True, False, False, False, True,
             False]

    def test_exact_duration_from_stts(self):
        p, _ = build_mp4(SIZES, DELTAS, SYNC)
        assert vc.mp4_exact_duration(p) == pytest.approx(700 / 600, abs=1e-6)
        assert vc.probe_mp4(p)["format"] == "MP4"

    def test_no_stss_means_all_keyframes(self):
        p, _ = build_mp4(SIZES, DELTAS, sync=None)
        assert all(s["keyframe"] for s in vc.mp4_sample_index(p))

    def test_multi_chunk_stsc_offsets(self):
        """3 samples per chunk for chunk 1-2, then 2 per chunk: the
        chunk-map expansion must place every sample byte-exactly."""
        stsc = [(1, 3, 1), (3, 2, 1)]
        p, offs = build_mp4(SIZES, DELTAS, SYNC, stsc=stsc)
        idx = vc.mp4_sample_index(p)
        assert [s["offset"] for s in idx] == offs
        # access-unit bytes round-trip from the original content
        for i in (0, 4, 9):
            au = vc.mp4_sample_bytes(p, i)
            assert au == bytes([i % 251]) * SIZES[i]

    def test_ctts_pts_offsets(self):
        p, _ = build_mp4(SIZES, DELTAS, SYNC, ctts=[(10, 25)])
        idx = vc.mp4_sample_index(p)
        assert all(s["pts"] == s["dts"] + 25 for s in idx)

    def test_keyframe_times(self):
        p, _ = build_mp4(SIZES, DELTAS, SYNC)
        assert vc.mp4_keyframe_times(p) == [0.0, round(400 / 600, 6),
                                            1.0]

    def test_gop_segments_start_on_keyframes(self):
        p, _ = build_mp4(SIZES, DELTAS, SYNC)
        segs = vc.mp4_gop_segments(p, duration=0.5)
        assert len(segs) >= 2
        idx = vc.mp4_sample_index(p)
        for t0, t1, first, count in segs:
            assert idx[first]["keyframe"], "segment not keyframe-aligned"
            assert t1 > t0 and count >= 1
        # segments tile the sample range exactly
        assert segs[0][2] == 0
        assert sum(s[3] for s in segs) == len(idx)

    def test_not_bmff_returns_empty(self):
        assert vc.mp4_sample_tables(b"RIFFxxxxAVI ") == []
        assert vc.mp4_sample_index(b"\x00" * 64) == []
        assert vc.mp4_exact_duration(b"junk") is None


class TestSparkIntegration:
    def test_keyframe_index_under_spark(self, spark):
        from pyspark.sql import Row

        from pixeltable_spark.functions.video import keyframe_index
        p, _ = build_mp4(SIZES, DELTAS, SYNC)
        df = spark.createDataFrame(
            [Row(media_id=1, payload=bytearray(p)),
             Row(media_id=2, payload=None)],
            "media_id long, payload binary")
        rows = keyframe_index(df).orderBy("idx").collect()
        assert len(rows) == 10
        assert [r["keyframe"] for r in rows].count(True) == 3
        assert rows[4]["t"] == pytest.approx(400 / 600, abs=1e-6)

    def test_probe_any_enriched_with_sample_tables(self):
        from pixeltable_spark.functions.video import probe_any
        p, _ = build_mp4(SIZES, DELTAS, SYNC)
        info = probe_any(p)
        assert info["format"] == "MP4"
        assert info["n_frames"] == 10 and info["n_keyframes"] == 3
        assert info["duration_s"] == pytest.approx(700 / 600, abs=1e-6)
        assert info["fps"] == pytest.approx(10 / (700 / 600), abs=1e-4)

"""MP3 frame toolkit: frame-accurate indexing, exact VBR duration,
and reservoir-safe stream-copy segmentation (audio_codec.py;
public ISO 11172-3 / 13818-3 frame layout).

Test vectors are synthesized frame streams: the header fields and the
frame-size formula are fully spec-defined, so a stream of valid headers
with zeroed payloads exercises every structural path (padding-bit size
changes, VBR per-frame bitrates, ID3v2/ID3v1 tags, Xing info frames,
false syncs, bit-reservoir flags) without needing a DSP codec."""

from __future__ import annotations

import pytest

from pixeltable_spark.functions import audio_codec as ac


def mk_frame(bitrate_kbps: int = 128, rate: int = 44100, padding: int = 0,
             version: str = "1", channels: int = 2,
             main_data_begin: int = 0, fill: int = 0x00) -> bytes:
    """A valid MPEG Layer III frame: spec header + side info carrying
    `main_data_begin` + zero-filled payload."""
    ver_bits = {"1": 3, "2": 2, "2.5": 0}[version]
    vgroup = "1" if version == "1" else "2"
    br_idx = ac._MP3_BITRATES[(vgroup, 3)].index(bitrate_kbps) + 1
    sr_idx = ac._MP3_RATES[version].index(rate)
    h0 = 0xFF
    h1 = 0xE0 | (ver_bits << 3) | (1 << 1) | 1  # layer III, no CRC
    h2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    h3 = (3 << 6) if channels == 1 else 0  # mono vs stereo mode
    if version == "1":
        size = 144 * bitrate_kbps * 1000 // rate + padding
        side = bytes([main_data_begin >> 1,
                      (main_data_begin & 1) << 7]) \
            + b"\x00" * (ac._mp3_side_info_size(version, channels) - 2)
    else:
        size = 72 * bitrate_kbps * 1000 // rate + padding
        side = bytes([main_data_begin]) \
            + b"\x00" * (ac._mp3_side_info_size(version, channels) - 1)
    body = bytes([h0, h1, h2, h3]) + side
    return body + bytes([fill]) * (size - len(body))


class TestFrameIndex:
    def test_cbr_index_and_sizes(self):
        p = mk_frame() * 10
        idx = ac.mp3_frame_index(p)
        assert len(idx) == 10
        assert all(f["size"] == 417 and f["rate"] == 44100
                   and f["samples"] == 1152 for f in idx)
        assert [f["offset"] for f in idx] == [i * 417 for i in range(10)]

    def test_padding_changes_frame_size(self):
        p = mk_frame(padding=0) + mk_frame(padding=1) + mk_frame(padding=0)
        idx = ac.mp3_frame_index(p)
        assert [f["size"] for f in idx] == [417, 418, 417]

    def test_vbr_per_frame_bitrates(self):
        p = mk_frame(128) + mk_frame(192) + mk_frame(320) + mk_frame(128)
        idx = ac.mp3_frame_index(p)
        assert [f["bitrate"] // 1000 for f in idx] == [128, 192, 320, 128]
        st = ac.mp3_bitrate_stats(p)
        assert st["vbr"] is True and st["n_frames"] == 4
        assert st["min_kbps"] == 128 and st["max_kbps"] == 320

    def test_id3v2_and_id3v1_skipped(self):
        id3v2 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
        id3v1 = b"TAG" + b"\x00" * 125
        p = id3v2 + mk_frame() * 3 + id3v1
        idx = ac.mp3_frame_index(p)
        assert len(idx) == 3
        assert idx[0]["offset"] == len(id3v2)

    def test_false_sync_resynced(self):
        junk = b"\x00\x12\xff\xe3\x99" * 3  # contains sync-looking bytes
        p = junk + mk_frame() * 4
        assert len(ac.mp3_frame_index(p)) == 4

    def test_mpeg2_spf_576(self):
        p = mk_frame(64, 22050, version="2", channels=1) * 5
        idx = ac.mp3_frame_index(p)
        assert len(idx) == 5
        assert all(f["samples"] == 576 and f["version"] == "2" for f in idx)


class TestDuration:
    def test_cbr_exact(self):
        p = mk_frame() * 100
        assert ac.mp3_duration(p) == pytest.approx(100 * 1152 / 44100, abs=1e-6)

    def test_vbr_exact_without_xing(self):
        frames = [mk_frame(b) for b in (128, 192, 320, 40, 128)] * 20
        p = b"".join(frames)
        assert ac.mp3_duration(p) == pytest.approx(100 * 1152 / 44100, abs=1e-6)

    def test_xing_info_frame_excluded(self):
        f = mk_frame()
        side = ac._mp3_side_info_size("1", 2)
        xing = bytearray(f)
        xing[4 + side:4 + side + 4] = b"Xing"
        p = bytes(xing) + mk_frame() * 9
        assert ac.mp3_duration(p) == pytest.approx(9 * 1152 / 44100, abs=1e-6)
        assert ac.mp3_bitrate_stats(p)["n_frames"] == 9


class TestSplit:
    def test_split_boundaries_and_reassembly(self):
        p = mk_frame() * 40  # ~1.045 s
        segs = ac.mp3_split(p, duration=0.25)
        assert len(segs) > 1
        assert b"".join(s for _, _, s in segs) == p  # byte-exact copy
        # boundaries are contiguous and start at 0
        assert segs[0][0] == 0.0
        for (a0, a1, _), (b0, b1, _) in zip(segs, segs[1:]):
            assert a1 == b0
        # every segment re-probes as MP3 and re-indexes to whole frames
        for t0, t1, s in segs:
            sub = ac.mp3_frame_index(s)
            assert len(sub) >= 1
            assert sum(f["samples"] for f in sub) / 44100 == pytest.approx(
                t1 - t0, abs=1e-6)
            assert ac.probe(s)["format"] == "MP3"

    def test_reservoir_safe_cut_points(self):
        """Frames whose successor back-references the bit reservoir
        (main_data_begin > 0) are NOT cut points; the next clean frame
        is used instead."""
        frames = []
        for i in range(30):
            # every frame except multiples of 10 leans on the reservoir
            frames.append(mk_frame(main_data_begin=0 if i % 10 == 0 else 200))
        p = b"".join(frames)
        segs = ac.mp3_split(p, duration=0.1, reservoir_safe=True)
        # 0.1 s ~ 4 frames, but cuts may only happen before frames
        # 10 and 20 -> exactly 3 segments of 10 frames each
        assert len(segs) == 3
        for _, _, s in segs:
            assert len(ac.mp3_frame_index(s)) == 10
        loose = ac.mp3_split(p, duration=0.1, reservoir_safe=False)
        assert len(loose) > 3

    def test_main_data_begin_parse(self):
        p = mk_frame(main_data_begin=0) + mk_frame(main_data_begin=200)
        idx = ac.mp3_frame_index(p)
        assert ac.mp3_main_data_begin(p, idx[0]) == 0
        assert ac.mp3_main_data_begin(p, idx[1]) == 200
        p2 = mk_frame(64, 22050, version="2", channels=1,
                      main_data_begin=77)
        idx2 = ac.mp3_frame_index(p2)
        assert ac.mp3_main_data_begin(p2, idx2[0]) == 77


class TestSparkIntegration:
    def test_audio_splitter_time_on_mp3(self, spark):
        """audio_splitter end-to-end on MP3: stream-copy segments with
        exact times, via the same entry point the WAV path uses."""
        from pyspark.sql import Row

        from pixeltable_spark.functions.audio import audio_splitter_time
        p = mk_frame() * 80  # ~2.09 s
        df = spark.createDataFrame([Row(media_id=1, payload=bytearray(p))],
                                   "media_id long, payload binary")
        rows = audio_splitter_time(df, duration=0.5).orderBy("pos").collect()
        assert len(rows) >= 3
        assert rows[0]["start_time"] == 0.0
        reassembled = b"".join(bytes(r["segment"]) for r in rows)
        assert reassembled == p
        for r in rows:
            assert ac.probe(bytes(r["segment"]))["format"] == "MP3"

    def test_mp3_overlap_rejected(self, spark):
        from pyspark.sql import Row

        from pixeltable_spark.functions.audio import audio_splitter_time
        df = spark.createDataFrame(
            [Row(media_id=1, payload=bytearray(mk_frame() * 10))],
            "media_id long, payload binary")
        out = audio_splitter_time(df, duration=0.5, overlap=0.1)
        with pytest.raises(Exception, match="overlap is unsupported"):
            out.collect()

    def test_get_metadata_on_mp3(self, spark):
        from pyspark.sql import Row
        from pyspark.sql import functions as F

        from pixeltable_spark.functions.audio import get_metadata
        p = mk_frame() * 20
        df = spark.createDataFrame([Row(media_id=1, payload=bytearray(p))],
                                   "media_id long, payload binary")
        md = df.select(get_metadata(F.col("payload")).alias("m")).collect()[0]["m"]
        import json
        m = json.loads(md) if isinstance(md, str) else md
        assert m["format"] == "MP3"
        assert m["sample_rate"] == 44100

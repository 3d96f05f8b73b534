"""ADTS AAC frame toolkit (functions/audio_codec.py; public ISO/IEC
13818-7 header layout): frame index, exact duration, stream-copy
segmentation, and the MP3-vs-ADTS sync disambiguation (both start
0xFFEx; ADTS uses the MPEG-audio reserved layer bits)."""

from __future__ import annotations

import pytest

from pixeltable_spark.functions import audio_codec as ac


def mk_adts(size: int = 200, sr_idx: int = 4, channels: int = 2,
            profile: int = 2, n_blocks: int = 1) -> bytes:
    """One valid ADTS frame (protection absent), zero-filled payload."""
    assert 7 <= size < (1 << 13)
    h = bytearray(7)
    h[0] = 0xFF
    h[1] = 0xF1                       # MPEG-4, layer 00, no CRC
    h[2] = ((profile - 1) << 6) | (sr_idx << 2) | ((channels >> 2) & 1)
    h[3] = ((channels & 3) << 6) | ((size >> 11) & 3)
    h[4] = (size >> 3) & 0xFF
    h[5] = ((size & 7) << 5) | 0x1F   # buffer fullness high bits
    h[6] = 0xFC | (n_blocks - 1)
    return bytes(h) + bytes(size - 7)


class TestAdts:
    def test_index_ground_truth(self):
        p = b"".join(mk_adts(size=100 + 10 * i) for i in range(8))
        idx = ac.adts_frame_index(p)
        assert len(idx) == 8
        assert [f["size"] for f in idx] == [100 + 10 * i for i in range(8)]
        assert all(f["rate"] == 44100 and f["samples"] == 1024
                   and f["channels"] == 2 and f["profile"] == 2
                   for f in idx)
        assert sum(f["size"] for f in idx) == len(p)

    def test_exact_duration_and_probe(self):
        p = mk_adts() * 43            # 43 * 1024 / 44100
        assert ac.adts_duration(p) == pytest.approx(43 * 1024 / 44100,
                                                    abs=1e-6)
        info = ac.probe(p)
        assert info["format"] == "AAC" and info["profile"] == "LC"
        assert info["n_frames"] == 43 and info["sample_rate"] == 44100

    def test_mp3_not_misdetected_as_aac(self):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from test_mp3_frames import mk_frame
        assert ac.probe(mk_frame() * 3)["format"] == "MP3"

    def test_multi_block_frames(self):
        p = mk_adts(n_blocks=4) * 5
        idx = ac.adts_frame_index(p)
        assert all(f["samples"] == 4096 for f in idx)
        assert ac.adts_duration(p) == pytest.approx(5 * 4096 / 44100,
                                                    abs=1e-6)

    def test_split_reassembles(self):
        p = b"".join(mk_adts(size=120 + i) for i in range(40))
        segs = ac.adts_split(p, duration=0.2)
        assert len(segs) >= 3
        assert b"".join(s for _, _, s in segs) == p
        for t0, t1, s in segs:
            assert ac.probe(s)["format"] == "AAC"
            assert t1 > t0

    def test_id3_skip_and_false_sync(self):
        id3 = b"ID3\x04\x00\x00\x00\x00\x00\x05" + b"\x00" * 5
        junk = b"\xff\xe1junkxx"
        p = id3 + mk_adts() * 4
        assert len(ac.adts_frame_index(p)) == 4
        assert len(ac.adts_frame_index(junk + mk_adts() * 4)) == 4

    def test_audio_splitter_on_adts(self, spark):
        from pyspark.sql import Row

        from pixeltable_spark.functions.audio import audio_splitter_time
        p = mk_adts() * 60
        df = spark.createDataFrame([Row(media_id=1, payload=bytearray(p))],
                                   "media_id long, payload binary")
        rows = audio_splitter_time(df, duration=0.3).orderBy("pos").collect()
        assert len(rows) >= 3
        assert b"".join(bytes(r["segment"]) for r in rows) == p

"""Ogg page toolkit (functions/audio_codec.py; public RFC 3533):
page-accurate index with CRC verification, granule-exact duration,
packet-aligned stream-copy segmentation. Test vectors are synthesized
Opus-framed Ogg streams built page-by-page with real RFC 3533 CRCs."""

from __future__ import annotations

import struct

import pytest

from pixeltable_spark.functions import audio_codec as ac


def mk_page(serial: int, seq: int, granule: int, packets,
            bos=False, eos=False, continued=False) -> bytes:
    """One valid Ogg page; `packets` is a list of packet byte strings
    (each fully contained — lacing values end < 255)."""
    lacing = []
    body = b""
    for pk in packets:
        n = len(pk)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)
        body += pk
    hdr_type = (1 if continued else 0) | (2 if bos else 0) | (4 if eos else 0)
    page = (b"OggS" + bytes([0, hdr_type])
            + struct.pack("<q", granule)
            + struct.pack("<III", serial, seq, 0)
            + bytes([len(lacing)]) + bytes(lacing) + body)
    crc = ac.ogg_page_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def build_opus_stream(n_data_pages=10, samples_per_page=960,
                      pre_skip=312, serial=7):
    """BOS OpusHead + OpusTags + n data pages, 48 kHz granules."""
    opus_head = (b"OpusHead" + bytes([1, 2])             # ver, channels
                 + struct.pack("<H", pre_skip)
                 + struct.pack("<I", 48000) + b"\x00\x00\x00")
    opus_tags = b"OpusTags" + struct.pack("<I", 4) + b"test" \
        + struct.pack("<I", 0)
    pages = [mk_page(serial, 0, 0, [opus_head], bos=True),
             mk_page(serial, 1, 0, [opus_tags])]
    g = pre_skip
    for i in range(n_data_pages):
        g += samples_per_page
        pages.append(mk_page(serial, 2 + i, g,
                             [bytes([i % 251]) * 40],
                             eos=(i == n_data_pages - 1)))
    return b"".join(pages)


class TestPageIndex:
    def test_index_and_crc(self):
        p = build_opus_stream()
        idx = ac.ogg_page_index(p, verify_crc=True)
        assert len(idx) == 12
        assert all(pg["crc_ok"] for pg in idx)
        assert idx[0]["bos"] and idx[-1]["eos"]
        assert [pg["seq"] for pg in idx] == list(range(12))
        assert sum(pg["size"] for pg in idx) == len(p)

    def test_resync_over_garbage(self):
        p = build_opus_stream(n_data_pages=3)
        idx0 = ac.ogg_page_index(p)
        junk = b"OggZ\x00garbagexxOggS\x01"  # sync-looking noise
        assert len(ac.ogg_page_index(junk + p)) == len(idx0)

    def test_corrupted_page_crc_flagged(self):
        p = bytearray(build_opus_stream(n_data_pages=2))
        idx = ac.ogg_page_index(bytes(p), verify_crc=True)
        body_off = idx[2]["offset"] + idx[2]["size"] - 1
        p[body_off] ^= 0xFF
        idx2 = ac.ogg_page_index(bytes(p), verify_crc=True)
        assert idx2[2]["crc_ok"] is False
        assert idx2[0]["crc_ok"] and idx2[1]["crc_ok"]


class TestDuration:
    def test_opus_duration_minus_preskip(self):
        p = build_opus_stream(n_data_pages=10, samples_per_page=960,
                              pre_skip=312)
        assert ac.ogg_duration(p) == pytest.approx(9600 / 48000, abs=1e-6)
        info = ac.probe_ogg(p)
        assert info["encoding"] == "opus" and info["channels"] == 2


class TestSplit:
    def test_split_reassembles_data_pages(self):
        p = build_opus_stream(n_data_pages=12)
        segs = ac.ogg_split(p, duration=0.06)  # 3 pages = 0.06 s
        assert len(segs) >= 3
        idx = ac.ogg_page_index(p)
        header = p[:idx[2]["offset"]]
        # every segment carries the header pages and whole data pages
        for t0, t1, s in segs:
            assert s.startswith(header)
            sub = ac.ogg_page_index(s, verify_crc=True)
            assert all(pg["crc_ok"] for pg in sub)
            assert t1 > t0
        # concatenating the data parts reproduces the original data run
        datas = b"".join(s[len(header):] for _, _, s in segs)
        assert header + datas == p
        # boundaries are contiguous
        for (a0, a1, _), (b0, b1, _) in zip(segs, segs[1:]):
            assert a1 == b0

    def test_split_respects_packet_continuation(self):
        """A page whose packet spills into the next (lacing 255 tail)
        must not be a cut point."""
        serial = 9
        opus_head = (b"OpusHead" + bytes([1, 1])
                     + struct.pack("<H", 0)
                     + struct.pack("<I", 48000) + b"\x00\x00\x00")
        opus_tags = b"OpusTags" + struct.pack("<I", 1) + b"x" \
            + struct.pack("<I", 0)
        pages = [mk_page(serial, 0, 0, [opus_head], bos=True),
                 mk_page(serial, 1, 0, [opus_tags])]
        # data page 2's packet is exactly 255 bytes -> lacing [255, 0]?
        # build a SPANNING packet: page2 holds the first 255 bytes
        # (lacing 255 only => packet continues), page3 is continued
        big = bytes(300)
        lac2 = b"OggS" + bytes([0, 0]) + struct.pack("<q", -1) \
            + struct.pack("<III", serial, 2, 0) + bytes([1, 255]) + big[:255]
        lac2 = lac2[:22] + struct.pack("<I", ac.ogg_page_crc(lac2)) + lac2[26:]
        rest = mk_page(serial, 3, 960, [big[255:]], continued=True)
        tail = mk_page(serial, 4, 1920, [b"z" * 20], eos=True)
        p = b"".join(pages) + lac2 + rest + tail
        segs = ac.ogg_split(p, duration=0.0001)
        # the spanning page (granule -1 / no packet end) cannot end a
        # segment: first segment must include pages 2 AND 3
        sub0 = ac.ogg_page_index(segs[0][2])
        data_pages0 = [pg for pg in sub0 if pg["seq"] >= 2]
        assert len(data_pages0) >= 2

    def test_non_ogg_empty(self):
        assert ac.ogg_page_index(b"RIFFxxxx") == []
        assert ac.ogg_split(b"\x00" * 50, 1.0) == []


class TestSparkIntegration:
    def test_audio_splitter_time_on_ogg(self, spark):
        from pyspark.sql import Row

        from pixeltable_spark.functions.audio import audio_splitter_time
        p = build_opus_stream(n_data_pages=20)
        df = spark.createDataFrame([Row(media_id=1, payload=bytearray(p))],
                                   "media_id long, payload binary")
        rows = audio_splitter_time(df, duration=0.06).orderBy("pos").collect()
        assert len(rows) >= 3
        for r in rows:
            info = ac.probe_ogg(bytes(r["segment"]))
            assert info is not None and info["encoding"] == "opus"
        assert rows[0]["start_time"] == 0.0

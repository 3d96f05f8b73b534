"""Round-9 regression battery:

* time-travel version validation — df(version=N) for a version that
  never existed must raise NotFoundError, not silently return current
  rows (the visibility predicate `_v_min <= N < _v_max` passes for
  every live row when N > current; reference validates via its version
  catalog, catalog/table.py:1087-1111);
* optimize(purge_before=v) raises the reconstructible floor;
* view manifests stamp the POST-mutation version (crash between commit
  and meta save must not let a reloaded handle reuse the version);
* CRC-protected MP3 Xing tag frames are recognized (2-byte CRC before
  side info, ISO 11172-3);
* unknown-size Matroska Clusters terminate at the next non-child
  element (RFC 8794 §6.2 — live-captured WebM);
* Annex B H.264 NALs keep legitimate trailing zeros (only the next
  start code's own bytes are excluded).
"""

from __future__ import annotations

import json
import os
import struct

import pytest

import pixeltable_spark as pxt
from pixeltable_spark.exceptions import NotFoundError
from pixeltable_spark.exprs import ColumnRef
from pixeltable_spark.functions import audio_codec as ac
from pixeltable_spark.functions import video_codec as vc

from test_mkv_blocks import el, simple_block
from test_mp3_frames import mk_frame


@pytest.fixture()
def cat(spark, tmp_path):
    return pxt.Catalog(spark, str(tmp_path / "wh"))


class TestVersionValidation:
    def test_nonexistent_version_raises(self, cat):
        t = cat.create_table("t", {"k": pxt.Int(False)})
        t.insert([{"k": i} for i in range(5)])
        assert t.version == 1
        with pytest.raises(NotFoundError, match="no version 99"):
            t.df(version=99)
        with pytest.raises(NotFoundError):
            t.scan(version=99)
        with pytest.raises(NotFoundError):
            t.df(version=-1)
        # existing versions still work
        assert t.df(version=0).count() == 0
        assert t.df(version=1).count() == 5

    def test_reverted_version_raises(self, cat):
        t = cat.create_table("t2", {"k": pxt.Int(False)})
        t.insert([{"k": 1}])
        t.insert([{"k": 2}])
        t.revert()
        assert t.version == 1
        with pytest.raises(NotFoundError):
            t.df(version=2)

    def test_purge_raises_floor(self, cat):
        t = cat.create_table("t3", {"k": pxt.Int(False),
                                    "v": pxt.Float(True)})
        t.insert([{"k": i, "v": float(i)} for i in range(8)])
        k = ColumnRef("k", t.schema["k"])
        t.update({"v": -1.0}, where=k < 3)           # v2
        t.update({"v": -2.0}, where=k < 2)           # v3
        t.optimize(purge_before=2)
        with pytest.raises(NotFoundError, match="no longer reconstructible"):
            t.df(version=1)
        # at/above the floor still reconstructs exactly
        assert t.df(version=2).count() == 8
        assert t.df(version=3).count() == 8
        # the floor survives a reload
        t2 = pxt.Catalog(t.catalog.spark, t.catalog.root).get_table("t3")
        with pytest.raises(NotFoundError):
            t2.df(version=1)

    def test_view_upper_bound(self, cat):
        t = cat.create_table("vb", {"k": pxt.Int(False)})
        t.insert([{"k": i} for i in range(4)])
        v = cat.create_view("vv", t)
        with pytest.raises(NotFoundError, match="no version"):
            v.df(version=v.version + 7)


class TestViewManifestStamp:
    def test_view_manifest_carries_post_mutation_version(self, cat):
        t = cat.create_table("b", {"k": pxt.Int(False)})
        t.insert([{"k": i} for i in range(6)])
        v = cat.create_view("vw", t)
        # propagate an increment, then inspect the view's CURRENT manifest
        t.insert([{"k": 6}, {"k": 7}])
        with open(os.path.join(v.path, "CURRENT")) as f:
            mrel = json.load(f)["manifest"]
        with open(os.path.join(v.path, mrel)) as f:
            m = json.load(f)
        assert m.get("version") == v.version  # POST-mutation stamp

    def test_crash_between_commit_and_meta_save_recovers(self, cat,
                                                         monkeypatch):
        """A view writer that dies after the CURRENT swap but before
        _save_view_meta must not let a reloaded handle reuse the
        committed version number."""
        t = cat.create_table("b2", {"k": pxt.Int(False)})
        t.insert([{"k": i} for i in range(6)])
        v = cat.create_view("vw2", t)
        committed_v = v.version

        calls = []

        def crash(*a, **kw):
            calls.append(1)
            raise RuntimeError("injected crash")

        monkeypatch.setattr(v, "_save_view_meta", crash)
        with pytest.raises(RuntimeError, match="injected crash"):
            t.insert([{"k": 6}])
        assert calls  # the crash point fired after the commit
        monkeypatch.undo()
        # fresh handle: the manifest stamp must win over stale meta.json
        cat2 = pxt.Catalog(t.catalog.spark, t.catalog.root)
        v2 = cat2.get_table("vw2")
        assert v2.version > committed_v


class TestMp3ProtectedXing:
    def test_crc_protected_xing_frame_recognized(self):
        f = bytearray(mk_frame())
        f[1] &= ~1                       # protection bit 0 = CRC present
        side = ac._mp3_side_info_size("1", 2)
        # frame layout with CRC: header(4) + crc(2) + side info + payload;
        # keep the spec frame size by consuming 2 payload bytes
        body = bytes(f[:4]) + b"\x00\x00" + bytes(f[4:-2])
        xing = bytearray(body)
        off = 4 + 2 + side
        xing[off:off + 4] = b"Xing"
        p = bytes(xing) + mk_frame() * 9
        idx = ac.mp3_frame_index(p)
        assert len(idx) == 10 and idx[0]["protected"]
        assert ac._is_info_frame(p, idx[0])
        assert ac.mp3_duration(p) == pytest.approx(9 * 1152 / 44100,
                                                   abs=1e-6)
        assert ac.mp3_bitrate_stats(p)["n_frames"] == 9


def el_unknown(eid: int, body: bytes) -> bytes:
    """EBML element with UNKNOWN size (all-ones 1-byte vint) — the form
    live captures write for in-progress Clusters/Segments."""
    nid = eid.bit_length() + 7 >> 3
    return eid.to_bytes(nid, "big") + b"\xff" + body


class TestMkvUnknownSizeClusters:
    def _build(self):
        ebml_hdr = el(0x1A45DFA3, el(0x4282, b"webm"))
        info = el(0x1549A966, el(0x2AD7B1, (1_000_000).to_bytes(3, "big")))
        tracks = el(0x1654AE6B, el(0xAE, el(0x83, b"\x01")
                                   + el(0x86, b"V_T")))
        c0 = el_unknown(0x1F43B675, el(0xE7, (0).to_bytes(2, "big"))
                        + simple_block(1, 0, True)
                        + simple_block(1, 40, False))
        c1 = el_unknown(0x1F43B675, el(0xE7, (100).to_bytes(2, "big"))
                        + simple_block(1, 0, True))
        c2 = el_unknown(0x1F43B675, el(0xE7, (200).to_bytes(2, "big"))
                        + simple_block(1, 0, True)
                        + simple_block(1, 40, False))
        seg = el_unknown(0x18538067, info + tracks + c0 + c1 + c2)
        return ebml_hdr + seg

    def test_blocks_after_first_unknown_cluster_indexed(self):
        p = self._build()
        idx = vc.mkv_block_index(p)
        assert [b["t"] for b in idx] == [0.0, 0.04, 0.1, 0.2, 0.24]
        assert [b["keyframe"] for b in idx] == [True, False, True,
                                                True, False]

    def test_split_sees_every_cluster(self):
        p = self._build()
        segs = vc.mkv_split(p, duration=0.05)
        # one giant segment would mean clusters 2/3 were swallowed
        assert len(segs) == 3
        assert [s[0] for s in segs] == [0.0, 0.1, 0.2]
        # each piece re-indexes to exactly its own blocks
        counts = [len(vc.mkv_block_index(s[2])) for s in segs]
        assert counts == [2, 1, 2]


class TestH264TrailingZeros:
    def test_cabac_zero_words_kept(self):
        nal1 = b"\x65\xaa\xbb" + b"\x00" * 3   # IDR + cabac_zero_words
        nal2 = b"\x41\xcc"
        p = b"\x00\x00\x00\x01" + nal1 + b"\x00\x00\x00\x01" + nal2
        units = vc.h264_nal_units(p)
        assert len(units) == 2
        assert units[0]["size"] == len(nal1)    # zeros preserved
        assert units[0]["idr"] and units[1]["type"] == 1
        assert units[1]["size"] == len(nal2)

    def test_three_byte_start_code(self):
        nal1 = b"\x67\x42"
        nal2 = b"\x68\xce"
        p = b"\x00\x00\x01" + nal1 + b"\x00\x00\x01" + nal2
        units = vc.h264_nal_units(p)
        assert [u["size"] for u in units] == [2, 2]
        assert [u["type"] for u in units] == [7, 8]

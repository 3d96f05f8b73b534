"""Pure-stdlib TIFF codec (functions/tiff_codec.py): round trips through the
repo encoder plus hand-built spec bitstreams (big-endian, 16-bit, sub-byte,
palette, predictor, multi-strip) that pin decoder paths the encoder cannot
emit. Reference parity: pixeltable reads TIFF via PIL (reference
functions/image.py); this pins the offline pure-python equivalent."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pixeltable_spark.functions import image_codec as ic
from pixeltable_spark.functions import tiff_codec as tc


def _rand(shape, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=shape, dtype=np.int64).astype(np.uint8)


def _build_tiff(bo: str, w: int, h: int, strips: list, tags: dict) -> bytes:
    """Hand-assemble a TIFF from the spec: header + IFD + values + strips.

    `tags` maps tag -> (type, [values]); StripOffsets/ByteCounts are added.
    """
    entries = dict(tags)
    sizes = {1: 1, 3: 2, 4: 4}
    code = {1: "B", 3: "H", 4: "I"}
    # place strips after we know IFD size
    n_entries = len(entries) + 2
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    overflow = bytearray()
    overflow_base = ifd_off + ifd_size

    def pack_value(typ, vals):
        raw = struct.pack(bo + code[typ] * len(vals), *vals)
        if len(raw) <= 4:
            return raw.ljust(4, b"\x00"), None
        off = overflow_base + len(overflow)
        overflow.extend(raw)
        return struct.pack(bo + "I", off), off

    packed = {}
    for tag, (typ, vals) in sorted(entries.items()):
        packed[tag] = (typ, len(vals), pack_value(typ, vals)[0])
    # strip offsets: placed after overflow; two passes since offsets shift
    counts = [len(s) for s in strips]
    otyp = 4
    off_raw = struct.pack(bo + "I" * len(strips), *([0] * len(strips)))
    cnt_raw = struct.pack(bo + "I" * len(strips), *counts)
    for tag, raw in ((273, off_raw), (279, cnt_raw)):
        if len(raw) <= 4:
            packed[tag] = (otyp, len(strips), raw.ljust(4, b"\x00"))
        else:
            off = overflow_base + len(overflow)
            overflow.extend(raw)
            packed[tag] = (otyp, len(strips), struct.pack(bo + "I", off))
    data_base = overflow_base + len(overflow)
    offs = []
    pos = data_base
    for s in strips:
        offs.append(pos)
        pos += len(s)
    off_raw = struct.pack(bo + "I" * len(strips), *offs)
    if len(off_raw) <= 4:
        packed[273] = (otyp, len(strips), off_raw.ljust(4, b"\x00"))
    else:
        # patch in place: offsets raw sits right before counts in overflow
        idx = len(overflow) - len(cnt_raw) - len(off_raw)
        overflow[idx:idx + len(off_raw)] = off_raw

    out = bytearray()
    out += (b"II" if bo == "<" else b"MM")
    out += struct.pack(bo + "HI", 42, ifd_off)
    out += struct.pack(bo + "H", len(packed))
    for tag in sorted(packed):
        typ, cnt, val = packed[tag]
        out += struct.pack(bo + "HHI", tag, typ, cnt) + val
    out += struct.pack(bo + "I", 0)
    out += overflow
    for s in strips:
        out += s
    return bytes(out)


class TestRoundTrip:
    def test_modes_and_compressions(self):
        for mode, nch in (("L", 1), ("LA", 2), ("RGB", 3), ("RGBA", 4)):
            arr = _rand((9, 7, nch))
            for comp in ("none", "deflate", "packbits", "lzw"):
                blob = tc.encode_tiff(arr, mode, compression=comp)
                info = tc.probe_tiff(blob)
                assert info == {"format": "TIFF", "width": 7, "height": 9,
                                "mode": mode, "bit_depth": 8}, (mode, comp)
                out, omode = tc.decode_tiff(blob)
                assert omode == mode
                assert np.array_equal(out, arr), (mode, comp)

    def test_packbits_runs(self):
        # long runs + literals stress the RLE coder
        arr = np.zeros((4, 300, 1), dtype=np.uint8)
        arr[:, 100:200, 0] = np.arange(100, dtype=np.uint8)
        blob = tc.encode_tiff(arr, "L", compression="packbits")
        out, _ = tc.decode_tiff(blob)
        assert np.array_equal(out, arr)
        assert len(blob) < arr.size  # RLE actually compressed the runs

    def test_lzw_width_growth_and_reset(self):
        # >4094 table entries forces 9->10->11->12-bit codes and a Clear
        arr = _rand((60, 400, 1), seed=3)
        blob = tc.encode_tiff(arr, "L", compression="lzw")
        out, _ = tc.decode_tiff(blob)
        assert np.array_equal(out, arr)

    def test_lzw_compresses_smooth_data(self):
        arr = np.tile(np.arange(64, dtype=np.uint8), (32, 4))[:, :, None]
        blob = tc.encode_tiff(arr, "L", compression="lzw")
        assert len(blob) < arr.size // 2
        out, _ = tc.decode_tiff(blob)
        assert np.array_equal(out, arr)


class TestHandBuiltStreams:
    def test_big_endian_gray(self):
        arr = _rand((5, 6, 1))
        blob = _build_tiff(
            ">", 6, 5, [arr.tobytes()],
            {256: (3, [6]), 257: (3, [5]), 258: (3, [8]), 259: (3, [1]),
             262: (3, [1]), 277: (3, [1]), 278: (4, [5])})
        out, mode = tc.decode_tiff(blob)
        assert mode == "L"
        assert np.array_equal(out[:, :, 0], arr[:, :, 0])

    def test_white_is_zero_inverts(self):
        arr = _rand((3, 4, 1))
        blob = _build_tiff(
            "<", 4, 3, [arr.tobytes()],
            {256: (3, [4]), 257: (3, [3]), 258: (3, [8]), 259: (3, [1]),
             262: (3, [0]), 277: (3, [1]), 278: (4, [3])})
        out, _ = tc.decode_tiff(blob)
        assert np.array_equal(out[:, :, 0], 255 - arr[:, :, 0])

    def test_16bit_both_endians_take_high_byte(self):
        vals = np.array([[0, 1, 255, 256, 0x1234, 0xFFFF]], dtype=np.uint16)
        for bo in ("<", ">"):
            raw = vals.astype(np.dtype(np.uint16).newbyteorder(bo)).tobytes()
            blob = _build_tiff(
                bo, 6, 1, [raw],
                {256: (3, [6]), 257: (3, [1]), 258: (3, [16]), 259: (3, [1]),
                 262: (3, [1]), 277: (3, [1]), 278: (4, [1])})
            out, _ = tc.decode_tiff(blob)
            assert np.array_equal(out[0, :, 0], (vals[0] >> 8).astype(np.uint8))

    def test_1bit_and_4bit_gray(self):
        # 1-bit: 10 px row -> 2 bytes MSB-first; pattern 1100110011
        row = np.array([1, 1, 0, 0, 1, 1, 0, 0, 1, 1], dtype=np.uint8)
        packed = np.packbits(row).tobytes()
        blob = _build_tiff(
            "<", 10, 1, [packed],
            {256: (3, [10]), 257: (3, [1]), 258: (3, [1]), 259: (3, [1]),
             262: (3, [1]), 277: (3, [1]), 278: (4, [1])})
        out, _ = tc.decode_tiff(blob)
        assert np.array_equal(out[0, :, 0], row * 255)
        # 4-bit: values 0..15 scale by 17
        vals = np.arange(16, dtype=np.uint8)
        packed = bytes((vals[i] << 4) | vals[i + 1] for i in range(0, 16, 2))
        blob = _build_tiff(
            "<", 16, 1, [packed],
            {256: (3, [16]), 257: (3, [1]), 258: (3, [4]), 259: (3, [1]),
             262: (3, [1]), 277: (3, [1]), 278: (4, [1])})
        out, _ = tc.decode_tiff(blob)
        assert np.array_equal(out[0, :, 0], vals * 17)

    def test_palette(self):
        # 8-bit indices + 16-bit ColorMap (all reds, greens, blues)
        idx = np.array([[0, 1, 2, 3]], dtype=np.uint8)
        colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (17, 34, 51)]
        cmap = ([c[0] * 257 for c in colors] + [0] * 252
                + [c[1] * 257 for c in colors] + [0] * 252
                + [c[2] * 257 for c in colors] + [0] * 252)
        blob = _build_tiff(
            "<", 4, 1, [idx.tobytes()],
            {256: (3, [4]), 257: (3, [1]), 258: (3, [8]), 259: (3, [1]),
             262: (3, [3]), 277: (3, [1]), 278: (4, [1]),
             320: (3, cmap)})
        out, mode = tc.decode_tiff(blob)
        assert mode == "RGB"
        assert np.array_equal(out[0], np.array(colors, dtype=np.uint8))

    def test_predictor2_deflate_rgb(self):
        arr = _rand((4, 5, 3), seed=11)
        diff = arr.astype(np.int16)
        diff[:, 1:] = diff[:, 1:] - diff[:, :-1]
        raw = (diff % 256).astype(np.uint8).tobytes()
        blob = _build_tiff(
            "<", 5, 4, [zlib.compress(raw)],
            {256: (3, [5]), 257: (3, [4]), 258: (3, [8, 8, 8]), 259: (3, [8]),
             262: (3, [2]), 277: (3, [3]), 278: (4, [4]), 317: (3, [2])})
        out, mode = tc.decode_tiff(blob)
        assert mode == "RGB"
        assert np.array_equal(out, arr)

    def test_multi_strip_packbits(self):
        arr = _rand((7, 5, 3), seed=5)
        rps = 3
        strips = []
        for s in range(0, 7, rps):
            chunk = arr[s:s + rps].tobytes()
            strips.append(tc._packbits_encode(chunk))
        blob = _build_tiff(
            "<", 5, 7, strips,
            {256: (3, [5]), 257: (3, [7]), 258: (3, [8, 8, 8]),
             259: (3, [32773]), 262: (3, [2]), 277: (3, [3]),
             278: (4, [rps])})
        out, _ = tc.decode_tiff(blob)
        assert np.array_equal(out, arr)

    def test_old_style_deflate_32946(self):
        arr = _rand((3, 3, 3), seed=9)
        blob = _build_tiff(
            "<", 3, 3, [zlib.compress(arr.tobytes())],
            {256: (3, [3]), 257: (3, [3]), 258: (3, [8, 8, 8]),
             259: (3, [32946]), 262: (3, [2]), 277: (3, [3]), 278: (4, [3])})
        out, _ = tc.decode_tiff(blob)
        assert np.array_equal(out, arr)


class TestGatesAndWiring:
    def test_unsupported_variants_raise_precisely(self):
        arr = _rand((2, 2, 1))
        base = {256: (3, [2]), 257: (3, [2]), 258: (3, [8]), 259: (3, [1]),
                262: (3, [1]), 277: (3, [1]), 278: (4, [2])}
        tiled = dict(base)
        tiled[322] = (3, [16])
        blob = _build_tiff("<", 2, 2, [arr.tobytes()], tiled)
        with pytest.raises(ValueError, match="tiled"):
            tc.decode_tiff(blob)
        planar = dict(base)
        planar[284] = (3, [2])
        blob = _build_tiff("<", 2, 2, [arr.tobytes()], planar)
        with pytest.raises(ValueError, match="planar"):
            tc.decode_tiff(blob)
        ccitt = dict(base)
        ccitt[259] = (3, [4])
        blob = _build_tiff("<", 2, 2, [arr.tobytes()], ccitt)
        with pytest.raises(ValueError, match="compression 4"):
            tc.decode_tiff(blob)

    def test_probe_rejects_non_tiff(self):
        assert tc.probe_tiff(b"II+\x00garbagegarbage") is None
        assert tc.probe_tiff(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30) is None

    def test_narrow_waist_dispatch(self):
        arr = _rand((6, 8, 3), seed=13)
        blob = tc.encode_tiff(arr, "RGB", compression="deflate")
        info = ic.probe(blob)
        assert info["format"] == "TIFF" and info["width"] == 8
        img = ic.decode(blob)
        assert img.format == "TIFF" and img.size == (8, 6)
        assert np.array_equal(img.arr, arr)
        # save_bytes round trip through the MiniImage surface
        back = ic.decode(img.save_bytes("TIFF"))
        assert np.array_equal(back.arr, arr)


class TestExif:
    @staticmethod
    def _tiff_body() -> bytes:
        # IFD0: Make(271 ascii), Orientation(274 short), ExifIFD ptr(34665)
        # Exif IFD: ExposureTime(33434 rational 1/250), ISO(34855 short)
        make = b"CamCo\x00"
        # layout: header(8) IFD0(2+3*12+4=42) make(6) -> exif ifd at 56
        ifd0 = struct.pack("<H", 3)
        ifd0 += struct.pack("<HHI", 271, 2, len(make)) + struct.pack("<I", 50)
        ifd0 += struct.pack("<HHI", 274, 3, 1) + struct.pack("<HH", 6, 0)
        ifd0 += struct.pack("<HHI", 34665, 4, 1) + struct.pack("<I", 56)
        ifd0 += struct.pack("<I", 0)
        exif = struct.pack("<H", 2)
        exif += struct.pack("<HHI", 33434, 5, 1) + struct.pack("<I", 56 + 30)
        exif += struct.pack("<HHI", 34855, 3, 1) + struct.pack("<HH", 200, 0)
        exif += struct.pack("<I", 0)
        rat = struct.pack("<II", 1, 250)
        body = b"II" + struct.pack("<HI", 42, 8) + ifd0 + make + exif + rat
        assert body.index(make) == 50 and body.index(exif) == 56
        return body

    def test_exif_from_tiff_body(self):
        ex = tc.exif_from_tiff_body(self._tiff_body())
        assert ex["make"] == "CamCo"
        assert ex["orientation"] == 6
        assert ex["exposure_time"] == 0.004
        assert ex["iso"] == 200

    def test_exif_in_jpeg_app1(self):
        from pixeltable_spark.functions.jpeg_codec import encode_jpeg
        arr = _rand((8, 8, 3), seed=21)
        jpg = encode_jpeg(arr, "RGB", 85)
        payload = b"Exif\x00\x00" + self._tiff_body()
        app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
        tagged = jpg[:2] + app1 + jpg[2:]
        ex = tc.exif_from_jpeg(tagged)
        assert ex["make"] == "CamCo" and ex["orientation"] == 6
        # still decodes + probes normally with the APP1 present
        assert ic.probe(tagged)["format"] == "JPEG"
        assert ic.decode(tagged).size == (8, 8)
        # no APP1 -> {}
        assert tc.exif_from_jpeg(jpg) == {}

    def test_exif_surfaces_in_get_metadata(self):
        import json
        from pixeltable_spark.functions.jpeg_codec import encode_jpeg
        from pixeltable_spark.functions.image import _metadata_json
        arr = _rand((4, 4, 3), seed=2)
        jpg = encode_jpeg(arr, "RGB", 85)
        payload = b"Exif\x00\x00" + self._tiff_body()
        app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
        tagged = jpg[:2] + app1 + jpg[2:]
        out = json.loads(_metadata_json(tagged))
        assert out["exif"]["make"] == "CamCo"
        assert out["exif"]["orientation"] == 6
        # untagged image: no exif key, dims intact
        plain = json.loads(_metadata_json(jpg))
        assert "exif" not in plain and plain["width"] == 4

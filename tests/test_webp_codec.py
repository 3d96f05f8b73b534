"""WebP lossless codec (functions/webp_codec.py): literal round-trips
through our encoder plus hand-built VP8L bitstreams pinning the decoder
paths the encoder does not emit — LZ77 backrefs, the color cache, and
all four transforms."""

from __future__ import annotations

import numpy as np
import pytest

from pixeltable_spark.functions import webp_codec as wc
from pixeltable_spark.functions.webp_codec import (_LsbWriter,
                                                   _canonical_codes,
                                                   _complete_lengths,
                                                   decode_webp, encode_webp,
                                                   probe_webp)


class TestRoundtrip:
    def test_rgb_rgba_exact(self):
        rng = np.random.default_rng(2)
        for h, w, ch in [(8, 8, 3), (5, 13, 4), (1, 1, 3), (2, 31, 4)]:
            a = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            out, mode = decode_webp(encode_webp(
                a, "RGBA" if ch == 4 else "RGB"))
            assert mode == "RGBA"
            exp = a if ch == 4 else np.dstack(
                [a, np.full((h, w), 255, np.uint8)])
            assert (out == exp).all()

    def test_probe(self):
        a = np.zeros((3, 5, 4), dtype=np.uint8)
        info = probe_webp(encode_webp(a))
        assert info == {"format": "WEBP", "width": 5, "height": 3,
                        "mode": "RGBA", "lossless": True}

    def test_lossy_rejected_clearly(self):
        import struct
        vp8 = b"VP8 " + struct.pack("<I", 10) + b"\x00" * 10
        riff = b"RIFF" + struct.pack("<I", 4 + len(vp8)) + b"WEBP" + vp8
        with pytest.raises(ValueError, match="lossy"):
            decode_webp(riff)

    def test_kraft_exact_lengths(self):
        for n in (2, 3, 40, 256, 280, 300):
            ls = _complete_lengths(n)
            assert len(ls) == n
            assert abs(sum(2.0 ** -l for l in ls) - 1.0) < 1e-12


# -- hand-built bitstream helpers --------------------------------------------

def _vp8l_header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _wrap_riff(bw):
    import struct
    vp8l = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _simple1(bw, sym):
    """Simple prefix code, one symbol (8-bit form): consumes no bits."""
    bw.write(1, 1)   # simple
    bw.write(0, 1)   # nsym-1 = 0
    bw.write(1, 1)   # first symbol is 8-bit
    bw.write(sym, 8)


def _sparse_code(bw, pairs, alphabet_size):
    """Full (code-length) serialization of a code giving 1-bit codes to
    exactly two symbols (everything else zero), using RLE-17/18 zero runs
    and the max-symbol limit. pairs = sorted [(sym, 1), (sym2, 1)]."""
    (s0, _), (s1, _) = pairs
    bw.write(0, 1)   # not simple
    # cl-code: lengths — symbol '1'->1 bit, '17'->2, '18'->2
    cl_lengths = {1: 1, 17: 2, 18: 2}
    order = wc._CL_ORDER
    num_codes = max(order.index(k) for k in cl_lengths) + 1
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths.get(order[i], 0), 3)
    cl_codes = _canonical_codes(
        [cl_lengths.get(i, 0) for i in range(19)])

    ops = []  # (cl_symbol, extra_value, extra_bits)
    pos = 0
    for sym in (s0, s1):
        gap = sym - pos
        while gap > 0:
            if gap >= 11:
                take = min(gap, 138)
                ops.append((18, take - 11, 7))
                gap -= take
            elif gap >= 3:
                ops.append((17, gap - 3, 3))
                gap = 0
            else:
                # short zero gaps: emit explicit zero lengths... cl code
                # has no '0' symbol here, so avoid syms closer than 3
                raise AssertionError("choose symbols >= 3 apart from 0")
        ops.append((1, None, 0))
        pos = sym + 1
    # limit decoded symbol count to exactly len(ops)
    bw.write(1, 1)
    bw.write(1, 3)            # length_nbits = 2 + 2*1 = 4
    bw.write(len(ops) - 2, 4)  # max_symbol = 2 + value
    for cls, extra, nbits in ops:
        code, ln = cl_codes[cls]
        bw.write_code(code, ln)
        if nbits:
            bw.write(extra, nbits)
    lengths = [0] * alphabet_size
    lengths[s0] = 1
    lengths[s1] = 1
    return _canonical_codes(lengths)


class TestHandBuiltStreams:
    def test_lz77_backref(self):
        """4x1 image: two literals then a length-2 backref at distance 2
        via the 2D map code (2,0)."""
        bw = _LsbWriter()
        _vp8l_header(bw, 4, 1)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        # green code: symbols {green=77 literal, 257=length-sym-1}
        gcodes = _sparse_code(bw, [(77, 1), (257, 1)], 280)
        _simple1(bw, 200)  # red
        _simple1(bw, 150)  # blue
        _simple1(bw, 255)  # alpha
        _simple1(bw, 4)    # distance sym 4 -> value 5..6 w/ 1 extra bit
        # two literals
        for _ in range(2):
            code, ln = gcodes[77]
            bw.write_code(code, ln)
        # backref: green sym 257 => lz77 length sym 1 -> length 2
        code, ln = gcodes[257]
        bw.write_code(code, ln)
        # distance: tree gives sym 4; extra bit 1 -> value 6 -> 2D code 6
        # = (2, 0) -> dist 2
        bw.write(1, 1)
        out, _ = decode_webp(_wrap_riff(bw))
        assert out.shape == (1, 4, 4)
        exp_px = [200, 77, 150, 255]  # RGBA
        for x in range(4):
            assert list(out[0, x]) == exp_px

    def test_color_cache(self):
        """Literal pixel inserted into a 4-entry cache, then re-emitted
        twice via its cache symbol."""
        cache_bits = 2
        px = (255 << 24) | (10 << 16) | (20 << 8) | 30  # ARGB
        idx = (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
        bw = _LsbWriter()
        _vp8l_header(bw, 3, 1)
        bw.write(0, 1)  # no transforms
        bw.write(1, 1)  # cache present
        bw.write(cache_bits, 4)
        bw.write(0, 1)  # no meta
        alphabet = 256 + 24 + (1 << cache_bits)
        cache_sym = 256 + 24 + int(idx)
        gcodes = _sparse_code(bw, sorted([(20, 1), (cache_sym, 1)]),
                              alphabet)
        _simple1(bw, 10)   # red
        _simple1(bw, 30)   # blue
        _simple1(bw, 255)  # alpha
        _simple1(bw, 1)    # distance (unused)
        code, ln = gcodes[20]
        bw.write_code(code, ln)
        for _ in range(2):
            code, ln = gcodes[cache_sym]
            bw.write_code(code, ln)
        out, _ = decode_webp(_wrap_riff(bw))
        for x in range(3):
            assert list(out[0, x]) == [10, 20, 30, 255]

    def test_subtract_green_transform(self):
        bw = _LsbWriter()
        _vp8l_header(bw, 1, 1)
        bw.write(1, 1)  # transform present
        bw.write(2, 2)  # subtract-green
        bw.write(0, 1)  # no more transforms
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        _simple1(bw, 100)  # green literal code (1-symbol)
        _simple1(bw, 50)   # red residual (r - g mod 256)
        _simple1(bw, 200)  # blue residual
        _simple1(bw, 255)  # alpha
        _simple1(bw, 1)
        out, _ = decode_webp(_wrap_riff(bw))
        # r = 50 + 100 = 150; b = (200 + 100) % 256 = 44
        assert list(out[0, 0]) == [150, 100, 44, 255]

    def test_predictor_transform_mode_L(self):
        """3x1 image, one tile, predictor mode 1 (= left); residuals +5
        per pixel on green; first pixel predicts 0xFF000000."""
        bw = _LsbWriter()
        _vp8l_header(bw, 3, 1)
        bw.write(1, 1)
        bw.write(0, 2)   # predictor transform
        bw.write(2, 3)   # size_bits = 2+2 = 4 -> single 16px tile
        # tile image 1x1 (entropy image, no meta): green = mode 1
        bw.write(0, 1)   # tile image: no cache
        _simple1(bw, 1)    # green = mode
        _simple1(bw, 0)    # red
        _simple1(bw, 0)    # blue
        _simple1(bw, 0)    # alpha
        _simple1(bw, 1)    # distance
        bw.write(0, 1)   # no more transforms
        bw.write(0, 1)   # no cache
        bw.write(0, 1)   # no meta
        _simple1(bw, 5)    # green residual 5 for every pixel
        _simple1(bw, 0)    # red residual
        _simple1(bw, 0)    # blue residual
        _simple1(bw, 0)    # alpha residual (alpha pred starts 0xFF)
        _simple1(bw, 1)
        out, _ = decode_webp(_wrap_riff(bw))
        # px0: pred (0,0,0,255) + (0,5,0,0) = g5; px1: g10; px2: g15
        assert [int(out[0, x, 1]) for x in range(3)] == [5, 10, 15]
        assert [int(out[0, x, 3]) for x in range(3)] == [255, 255, 255]

    def test_color_indexing_bundled(self):
        """4-entry palette, 4x1 image -> 2-bit indices bundled into one
        packed byte-pixel."""
        bw = _LsbWriter()
        _vp8l_header(bw, 4, 1)
        bw.write(1, 1)
        bw.write(3, 2)   # color indexing
        bw.write(3, 8)   # palette size - 1 = 3
        # palette entropy image 4x1, delta coded: entries all delta
        # (a=0,r=0,g=+10,b=0) from previous, first from 0 -> greens
        # 10,20,30,40
        bw.write(0, 1)   # palette image: no cache
        _simple1(bw, 10)   # green delta
        _simple1(bw, 0)    # red delta
        _simple1(bw, 0)    # blue delta
        _simple1(bw, 0)    # alpha delta
        _simple1(bw, 1)
        bw.write(0, 1)   # no more transforms
        bw.write(0, 1)   # no cache
        bw.write(0, 1)   # no meta
        # packed image width 1: indices 0,1,2,3 -> bits 11100100 = 0xE4
        _simple1(bw, 0xE4)  # green carries packed indices
        _simple1(bw, 0)
        _simple1(bw, 0)
        _simple1(bw, 0)
        _simple1(bw, 1)
        out, _ = decode_webp(_wrap_riff(bw))
        assert [int(out[0, x, 1]) for x in range(4)] == [10, 20, 30, 40]


class TestSaveBytesWebp:
    def test_minimage_save_webp_roundtrip(self):
        from pixeltable_spark.functions import image_codec as ic
        import numpy as np
        a = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
        img = ic.MiniImage(a, "RGB")
        p = img.save_bytes("WEBP")
        back = ic.decode(p)
        assert back.size == (5, 4)
        assert (np.asarray(back.arr)[:, :, :3] == a).all()


class TestImageCodecIntegration:
    def test_probe_and_decode_via_waist(self):
        from pixeltable_spark.functions import image_codec as ic
        a = np.zeros((4, 6, 3), dtype=np.uint8)
        a[:, :3] = [255, 0, 0]
        p = encode_webp(a, "RGB")
        info = ic.probe(p)
        assert info["format"] == "WEBP" and info["width"] == 6
        img = ic.decode(p)
        assert img.size == (6, 4)
        assert tuple(img.arr[0, 0][:3]) == (255, 0, 0)

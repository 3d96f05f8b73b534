"""GIF codec (functions/gif_codec.py): LZW encode/decode roundtrips are
LOSSLESS for paletted content, so every test asserts exact equality."""

from __future__ import annotations

import numpy as np
import pytest

from pixeltable_spark.functions import image_codec
from pixeltable_spark.functions.gif_codec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


class TestLzw:
    def test_roundtrip_small_alphabet(self):
        rng = np.random.default_rng(1)
        for trial in range(5):
            idx = rng.integers(0, 4, size=rng.integers(1, 500))
            data = _lzw_encode(2, idx)
            assert _lzw_decode(2, data) == idx.tolist()

    def test_roundtrip_full_byte_alphabet(self):
        rng = np.random.default_rng(2)
        idx = rng.integers(0, 256, size=5000)
        data = _lzw_encode(8, idx)
        assert _lzw_decode(8, data) == idx.tolist()

    def test_table_overflow_resets(self):
        # > 4096 codes forces the encoder's clear-and-reset path
        idx = np.arange(20000) % 256
        data = _lzw_encode(8, idx)
        assert _lzw_decode(8, data) == idx.tolist()


class TestGifRoundtrip:
    def test_rgb_exact(self):
        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        a = pal[rng.integers(0, 16, (23, 31))]
        d, mode = decode_gif(encode_gif(a, "RGB"))
        assert mode == "RGB" and np.array_equal(d, a)

    def test_256_color_ramp_exact(self):
        g = np.repeat(np.arange(256, dtype=np.uint8)[None, :], 10, axis=0)
        a = np.dstack([g, g, g])
        d, mode = decode_gif(encode_gif(a))
        assert np.array_equal(d, a)

    def test_transparency(self):
        rng = np.random.default_rng(4)
        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        idx = rng.integers(0, 8, (12, 17))
        alpha = np.where(idx % 3 == 0, 0, 255).astype(np.uint8)
        a = np.dstack([pal[idx], alpha])
        d, mode = decode_gif(encode_gif(a, "RGBA"))
        assert mode == "RGBA"
        assert np.array_equal(d[:, :, 3] >= 128, alpha >= 128)
        opaque = alpha >= 128
        assert np.array_equal(d[:, :, :3][opaque], a[:, :, :3][opaque])

    def test_too_many_colors_raises(self):
        rng = np.random.default_rng(5)
        big = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="256"):
            encode_gif(big)

    def test_interlaced_decodes(self):
        # craft an interlaced variant: re-order rows into pass order and
        # set the interlace flag on an encoder output
        pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
        h, w = 13, 9
        idx = (np.add.outer(np.arange(h), np.arange(w)) % 2).astype(np.int32)
        a = pal[idx]
        p = bytearray(encode_gif(a))
        # image descriptor starts after header(6)+LSD(7)+palette(2*3)
        desc = 6 + 7 + 6
        assert p[desc] == 0x2C
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        reordered = pal[idx[order]]
        p2 = bytearray(encode_gif(reordered))
        p2[desc + 9] |= 0x40  # set interlace flag
        d, _ = decode_gif(bytes(p2))
        assert np.array_equal(d, a)


class TestWaistIntegration:
    def test_decode_and_reencode(self):
        pal = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
        a = pal[(np.add.outer(np.arange(9), np.arange(11)) % 2)]
        img = image_codec.decode(encode_gif(a))
        assert (img.width, img.height, img.mode) == (11, 9, "RGB")
        again = img.save_bytes("GIF")
        assert again[:6] == b"GIF89a"
        img2 = image_codec.decode(again)
        assert np.array_equal(img2.arr, a)

    def test_probe_unchanged(self):
        p = encode_gif(np.zeros((5, 7, 3), np.uint8))
        assert image_codec.probe(p) == {
            "format": "GIF", "width": 7, "height": 5, "mode": "P"}

"""Baseline JPEG codec (functions/jpeg_codec.py): pure stdlib+numpy
encode/decode, roundtrip-verified without PIL. Mirrors the validation
style of tests/test_image_codec.py (no external golden files possible in
the sandbox, so correctness = spec-structural checks + bounded
quantization error on roundtrips + probe agreement)."""

from __future__ import annotations

import numpy as np
import pytest

from pixeltable_spark.functions import image_codec
from pixeltable_spark.functions.jpeg_codec import decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    a = np.zeros((h, w, 3), dtype=np.uint8)
    a[:, :, 0] = (xx * 4) % 256
    a[:, :, 1] = (yy * 6) % 256
    a[:, :, 2] = ((xx + yy) * 3) % 256
    return a


class TestRoundtrip:
    def test_flat_color_is_exact(self):
        a = np.full((16, 24, 3), 128, dtype=np.uint8)
        d, mode = decode_jpeg(encode_jpeg(a, "RGB", 90))
        assert mode == "RGB" and d.shape == a.shape
        assert np.array_equal(d, a)

    def test_gradient_bounded_error(self):
        a = _gradient(37, 53)  # dims not multiples of 8
        d, mode = decode_jpeg(encode_jpeg(a, "RGB", 90))
        assert d.shape == (37, 53, 3)
        err = np.abs(d.astype(int) - a.astype(int))
        assert err.mean() < 2.0 and err.max() <= 32

    def test_grayscale(self):
        g = ((np.add.outer(np.arange(40), np.arange(40) * 2)) % 256).astype(np.uint8)
        d, mode = decode_jpeg(encode_jpeg(g[:, :, None], "L", 90))
        assert mode == "L" and d.shape == (40, 40, 1)
        assert np.abs(d[:, :, 0].astype(int) - g.astype(int)).mean() < 3.0

    def test_quality_monotonic_size(self):
        a = _gradient(64, 64)
        sizes = [len(encode_jpeg(a, "RGB", q)) for q in (10, 50, 95)]
        assert sizes[0] < sizes[1] < sizes[2]

    def test_random_images_roundtrip(self):
        rng = np.random.default_rng(7)
        for _ in range(5):
            h, w = int(rng.integers(8, 50)), int(rng.integers(8, 50))
            # low-frequency random content (random noise is the JPEG
            # worst case and only bounded by ~quant-table magnitudes)
            small = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
            a = np.kron(small, np.ones((max(1, h // 4), max(1, w // 4), 1))) \
                .astype(np.uint8)[:h, :w]
            d, _ = decode_jpeg(encode_jpeg(a, "RGB", 95))
            assert d.shape == a.shape
            assert np.abs(d.astype(int) - a.astype(int)).mean() < 6.0


class TestSpecStructure:
    def test_markers_and_probe(self):
        a = _gradient(20, 30)
        p = encode_jpeg(a, "RGB", 85)
        assert p.startswith(b"\xFF\xD8\xFF\xE0") and p.endswith(b"\xFF\xD9")
        assert b"JFIF\x00" in p[:20]
        info = image_codec.probe(p)
        assert info == {"format": "JPEG", "width": 30, "height": 20,
                        "mode": "RGB"}

    def test_entropy_data_byte_stuffed(self):
        # every 0xFF inside the entropy segment must be followed by 0x00
        # or be a marker; decode success implies the reader handled it,
        # but check the writer directly too
        a = np.full((8, 8, 3), 255, dtype=np.uint8)
        p = encode_jpeg(a, "RGB", 100)
        sos = p.find(b"\xFF\xDA")
        seglen = int.from_bytes(p[sos + 2:sos + 4], "big")
        body = p[sos + 2 + seglen:-2]
        i = 0
        while i < len(body):
            if body[i] == 0xFF:
                assert body[i + 1] == 0x00, "unstuffed 0xFF in entropy data"
                i += 2
            else:
                i += 1

    def test_codec_waist_integration(self):
        a = _gradient(12, 18)
        p = encode_jpeg(a, "RGB", 85)
        img = image_codec.decode(p)
        assert (img.width, img.height, img.mode) == (18, 12, "RGB")
        # JPEG in -> JPEG out via save_bytes(format)
        again = img.save_bytes("JPEG")
        assert again.startswith(b"\xFF\xD8")
        img2 = image_codec.decode(again)
        assert (img2.width, img2.height) == (18, 12)


class TestRejections:
    def test_progressive_rejected(self):
        a = _gradient(16, 16)
        p = bytearray(encode_jpeg(a, "RGB", 85))
        i = bytes(p).find(b"\xFF\xC0")
        p[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError, match="SOF0"):
            decode_jpeg(bytes(p))

    def test_subsampled_rejected(self):
        a = _gradient(16, 16)
        p = bytearray(encode_jpeg(a, "RGB", 85))
        i = bytes(p).find(b"\xFF\xC0")
        # component 0 sampling byte: SOF payload = len(2) prec(1) h(2) w(2)
        # ncomp(1) then per-comp [id, samp, qid]
        p[i + 2 + 2 + 1 + 4 + 1 + 1] = 0x22
        with pytest.raises(ValueError, match="4:4:4"):
            decode_jpeg(bytes(p))

    def test_truncated_rejected(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\xFF\xD8\xFF\xE0")
        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg at all")

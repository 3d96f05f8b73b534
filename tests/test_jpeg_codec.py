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


class TestProgressive:
    """Progressive (SOF2) decode with successive approximation — round 5.
    Core property: a progressive stream carries the SAME quantized
    coefficients as the baseline stream of the same image, so decode
    must be pixel-identical to baseline decode."""

    def test_progressive_equals_baseline_rgb(self):
        for h, w in [(16, 16), (13, 9), (24, 33), (8, 8)]:
            a = _gradient(h, w)
            base, _ = decode_jpeg(encode_jpeg(a, "RGB", 85))
            prog, mode = decode_jpeg(
                encode_jpeg(a, "RGB", 85, progressive=True))
            assert mode == "RGB"
            assert (base == prog).all(), (h, w)

    def test_progressive_equals_baseline_gray(self):
        rng = np.random.default_rng(7)
        a = rng.integers(0, 256, (21, 17), dtype=np.uint8)
        base, _ = decode_jpeg(encode_jpeg(a, "L", 70))
        prog, mode = decode_jpeg(encode_jpeg(a, "L", 70, progressive=True))
        assert mode == "L" and (base == prog).all()

    def test_progressive_sparse_blocks_eobrun(self):
        # mostly-flat image -> long EOB runs across blocks
        a = np.full((40, 40, 3), 128, dtype=np.uint8)
        a[0, 0] = [255, 0, 0]
        a[33, 21] = [0, 255, 0]
        base, _ = decode_jpeg(encode_jpeg(a, "RGB", 85))
        prog, _ = decode_jpeg(encode_jpeg(a, "RGB", 85, progressive=True))
        assert (base == prog).all()

    def test_random_images_progressive(self):
        rng = np.random.default_rng(11)
        for _ in range(3):
            h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
            a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            base, _ = decode_jpeg(encode_jpeg(a, "RGB", 60))
            prog, _ = decode_jpeg(encode_jpeg(a, "RGB", 60,
                                              progressive=True))
            assert (base == prog).all(), (h, w)


class TestSubsampling:
    """4:2:0 / 4:2:2 MCU decode — round 5."""

    def test_420_smooth_image_close(self):
        a = _gradient(32, 32)
        out, mode = decode_jpeg(encode_jpeg(a, "RGB", 95,
                                            subsampling="4:2:0"))
        assert mode == "RGB" and out.shape == a.shape
        assert np.abs(out.astype(int) - a.astype(int)).mean() < 8

    def test_422_and_odd_dims(self):
        a = _gradient(19, 27)
        out, _ = decode_jpeg(encode_jpeg(a, "RGB", 95, subsampling="4:2:2"))
        assert out.shape == a.shape
        assert np.abs(out.astype(int) - a.astype(int)).mean() < 8

    def test_420_luma_matches_444_luma(self):
        # luma is NOT subsampled in 4:2:0: gray projection stays close to
        # the 4:4:4 encode of the same image
        rng = np.random.default_rng(3)
        a = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        full, _ = decode_jpeg(encode_jpeg(a, "RGB", 90))
        sub, _ = decode_jpeg(encode_jpeg(a, "RGB", 90, subsampling="4:2:0"))
        gray = lambda x: (0.299 * x[:, :, 0] + 0.587 * x[:, :, 1]  # noqa: E731
                          + 0.114 * x[:, :, 2])
        assert np.abs(gray(full) - gray(sub)).mean() < 3

    def test_progressive_420_equals_baseline_420(self):
        a = _gradient(20, 28)
        base, _ = decode_jpeg(encode_jpeg(a, "RGB", 85, subsampling="4:2:0"))
        prog, _ = decode_jpeg(encode_jpeg(a, "RGB", 85, subsampling="4:2:0",
                                          progressive=True))
        assert (base == prog).all()


class TestCmyk:
    def test_cmyk_roundtrip_to_rgb(self):
        # flat inverted-CMYK blocks: decode converts via R=C*K/255 on the
        # Adobe-stored (inverted) values
        a = np.zeros((16, 16, 4), dtype=np.uint8)
        a[:, :8] = [255, 0, 0, 255]    # C=255,K=255 -> R=255, G=B=0
        a[:, 8:] = [200, 200, 200, 255]
        out, mode = decode_jpeg(encode_jpeg(a, "CMYK", 95))
        assert mode == "RGB" and out.shape == (16, 16, 3)
        assert abs(int(out[4, 4, 0]) - 255) <= 12
        assert int(out[4, 4, 1]) <= 12 and int(out[4, 4, 2]) <= 12
        assert all(abs(int(v) - 200) <= 12 for v in out[4, 12])

    def test_cmyk_has_adobe_app14(self):
        p = encode_jpeg(np.zeros((8, 8, 4), dtype=np.uint8), "CMYK", 85)
        assert b"Adobe" in p

    def test_ycck_transform_path(self):
        # flip the APP14 transform byte to 2 on a stream whose 4 planes we
        # control: YCCK(Y=128,Cb=128,Cr=128,K=255) -> C=M=Y=128 inverted
        # -> RGB ~ 128
        a = np.full((8, 8, 4), 128, dtype=np.uint8)
        a[:, :, 3] = 255
        p = bytearray(encode_jpeg(a, "CMYK", 95))
        i = bytes(p).find(b"Adobe")
        p[i + 11] = 2
        out, mode = decode_jpeg(bytes(p))
        assert mode == "RGB"
        assert np.abs(out.astype(int) - 128).max() <= 12


class TestRejections:
    def test_arithmetic_rejected(self):
        a = _gradient(16, 16)
        p = bytearray(encode_jpeg(a, "RGB", 85))
        i = bytes(p).find(b"\xFF\xC0")
        p[i + 1] = 0xC9  # arithmetic sequential
        with pytest.raises(ValueError, match="arithmetic"):
            decode_jpeg(bytes(p))

    def test_truncated_rejected(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\xFF\xD8\xFF\xE0")
        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg at all")

"""Real resampling filters in the stdlib image codec
(functions/image_codec.py _resample_axis/_resample_kernel: separable
normalized convolutions — triangle, Keys bicubic a=-0.5, Lanczos-3,
box — with kernel support widened by the downscale factor, the same
antialiasing scheme PIL implements)."""
import numpy as np
import pytest

from pixeltable_spark.functions.image_codec import MiniImage

FILTERS = ("bilinear", "bicubic", "lanczos", "box")


def _gray(arr):
    return MiniImage(np.asarray(arr, np.uint8), "L", "PNG")


class TestResampleFilters:
    @pytest.mark.parametrize("f", FILTERS)
    def test_constant_reproduced(self, f):
        img = MiniImage(np.full((20, 30, 3), 137, np.uint8), "RGB", "PNG")
        out = img.resize((13, 7), resample=f)
        assert out.arr.shape == (7, 13, 3)
        assert (out.arr == 137).all()

    @pytest.mark.parametrize("f", ("bilinear", "bicubic"))
    def test_linear_ramp_preserved_interior(self, f):
        ramp = np.tile(np.arange(0, 200, 2, dtype=np.float64), (10, 1))
        img = _gray(ramp)
        out = np.squeeze(img.resize((50, 10), resample=f).arr) \
            .astype(float)
        d = np.diff(out[5, 10:40])          # interior slope: 4 per px
        assert abs(d.mean() - 4.0) < 0.1

    def test_box_integer_downscale_is_block_mean(self):
        blk = np.arange(36, dtype=np.float64).reshape(6, 6) * 7 % 256
        out = np.squeeze(
            _gray(blk).resize((3, 3), resample="box").arr).astype(float)
        want = blk.reshape(3, 2, 3, 2).mean(axis=(1, 3))
        assert np.abs(out - np.rint(want)).max() <= 1

    def test_antialiasing_vs_nearest(self):
        # Nyquist checkerboard: nearest keeps one phase (all-extreme),
        # a widened-kernel filter averages to mid-gray
        cb = (np.indices((64, 64)).sum(axis=0) % 2) * 255
        img = _gray(cb)
        near = np.squeeze(img.resize((8, 8), resample="nearest").arr) \
            .astype(float)
        lz = np.squeeze(img.resize((8, 8), resample="lanczos").arr) \
            .astype(float)
        assert abs(near.mean() - 127.5) > 100   # aliased: one phase
        assert abs(lz.mean() - 127.5) < 3 and lz.std() < 10

    def test_upscale_shapes_and_range(self):
        img = _gray(np.arange(16).reshape(4, 4) * 16)
        for f in FILTERS:
            up = img.resize((16, 16), resample=f).arr
            assert up.shape[:2] == (16, 16)
            assert up.dtype == np.uint8     # clipped + rounded

    def test_bicubic_overshoot_clipped(self):
        # step edge: Keys kernel overshoots; uint8 output must clip
        step = np.zeros((8, 8), np.float64)
        step[:, 4:] = 255
        up = _gray(step).resize((32, 32), resample="bicubic").arr
        assert up.min() >= 0 and up.max() <= 255

    def test_unknown_filter_raises(self):
        with pytest.raises(ValueError, match="unknown resample"):
            _gray(np.zeros((4, 4))).resize((2, 2), resample="area")

    def test_default_unchanged_nearest(self):
        arr = (np.arange(64).reshape(8, 8) * 3 % 256)
        a = _gray(arr).resize((4, 4)).arr
        b = _gray(arr).resize((4, 4), resample="nearest").arr
        assert (a == b).all()


class TestResizeFunctionPlumbing:
    def test_spark_resize_with_resample(self, spark):
        from pixeltable_spark.functions import image as pxti
        from pixeltable_spark.functions.image_codec import encode_png
        from pyspark.sql import functions as F

        png = encode_png(np.full((16, 16, 3), 200, np.uint8), "RGB")
        df = spark.createDataFrame([(bytearray(png),)], "img binary")
        out = df.select(pxti.resize(F.col("img"), 4, 4,
                                    resample="lanczos").alias("r")) \
            .collect()[0]["r"]
        img = MiniImage.open(bytes(out)) if hasattr(MiniImage, "open") \
            else None
        if img is None:
            from pixeltable_spark.functions.image import _load_image
            img = _load_image(bytes(out))
        assert (img.width, img.height) == (4, 4)
        assert int(np.asarray(img.arr).mean()) == 200


class TestImageQualityMetrics:
    """PSNR / SSIM (Wang et al. 2004 global form, 8x8 windows) over
    image payload pairs (functions/image.py psnr/ssim)."""

    def _frames(self, spark):
        from pixeltable_spark.functions.image_codec import encode_png
        rng = np.random.RandomState(7)
        base = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
        noisy = np.clip(base.astype(int)
                        + rng.randint(-20, 21, base.shape),
                        0, 255).astype(np.uint8)
        inverted = (255 - base).astype(np.uint8)
        pngs = [encode_png(a, "RGB") for a in (base, noisy, inverted)]
        rows = [(bytearray(pngs[0]), bytearray(pngs[0])),
                (bytearray(pngs[0]), bytearray(pngs[1])),
                (bytearray(pngs[0]), bytearray(pngs[2]))]
        return spark.createDataFrame(rows, "a binary, b binary")

    def test_psnr_ssim_ordering(self, spark):
        from pixeltable_spark.functions import image as pxti
        from pyspark.sql import functions as F
        out = self._frames(spark).select(
            pxti.psnr(F.col("a"), F.col("b")).alias("p"),
            pxti.ssim(F.col("a"), F.col("b")).alias("s")).collect()
        ident, noisy, inv = out
        assert ident["p"] == 100.0 and ident["s"] == pytest.approx(1.0)
        assert 20 < noisy["p"] < 40 and 0.2 < noisy["s"] < 0.999
        # inversion flips structure: covariance negative, SSIM far
        # below the noisy pair (PSNR alone can't see this — that's
        # exactly why SSIM exists)
        assert inv["s"] < 0.1 < noisy["s"]

    def test_null_and_garbage_payloads(self, spark):
        from pixeltable_spark.functions import image as pxti
        from pyspark.sql import functions as F
        df = spark.createDataFrame(
            [(None, bytearray(b"x")), (bytearray(b"junk"),
                                       bytearray(b"junk"))],
            "a binary, b binary")
        out = df.select(pxti.psnr(F.col("a"), F.col("b")).alias("p"),
                        pxti.ssim(F.col("a"), F.col("b")).alias("s")) \
            .collect()
        assert out[0]["p"] is None and out[1]["s"] is None

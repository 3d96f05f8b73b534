"""Image tile iterator + stitcher (reference functions/image.py:473
tile_iterator / :576 stitch_tiles)."""

from __future__ import annotations

import numpy as np
import pytest

from pixeltable_spark.functions.image import (
    _tile_grid,
    stitch_tiles,
    tile_iterator,
)
from pixeltable_spark.functions.image_codec import decode, encode_png


def _img(w, h, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype="uint8")


class TestGrid:
    def test_reference_formula(self):
        # t, 2t-o, 3t-2o ... accommodate exactly 1, 2, 3 tiles
        assert _tile_grid(64, 64, (64, 64), (0, 0)) == (1, 1)
        assert _tile_grid(65, 64, (64, 64), (0, 0)) == (2, 1)
        assert _tile_grid(120, 56, (64, 56), (8, 0)) == (2, 1)
        assert _tile_grid(121, 56, (64, 56), (8, 0)) == (3, 1)


class TestTileIterator:
    def test_tiles_rowmajor_with_padding(self, spark):
        arr = _img(100, 70)
        df = spark.createDataFrame([(1, bytearray(encode_png(arr, "RGB")))],
                                   ["media_id", "payload"])
        tiles = tile_iterator(df, tile_size=(64, 64)).collect()
        assert len(tiles) == 4  # 2x2 grid
        by_pos = {t["pos"]: t for t in tiles}
        assert by_pos[0]["tile_coord"] == [0, 0]
        assert by_pos[1]["tile_coord"] == [1, 0]
        assert by_pos[2]["tile_coord"] == [0, 1]
        assert by_pos[3]["tile_box"] == [64, 64, 128, 128]
        # every tile decodes to exactly tile_size with black padding
        t3 = decode(bytes(by_pos[3]["tile"]))
        assert t3.size == (64, 64)
        assert (t3.arr[:6, :36] == arr[64:70, 64:100]).all()
        assert (t3.arr[6:, :] == 0).all() and (t3.arr[:, 36:] == 0).all()

    def test_overlap(self, spark):
        arr = _img(120, 56, seed=1)
        df = spark.createDataFrame([(7, bytearray(encode_png(arr, "RGB")))],
                                   ["media_id", "payload"])
        tiles = tile_iterator(df, tile_size=(64, 56), overlap=(8, 0)).collect()
        assert len(tiles) == 2
        boxes = sorted(t["tile_box"] for t in tiles)
        assert boxes == [[0, 0, 64, 56], [56, 0, 120, 56]]

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, bytearray(b""))], ["media_id", "payload"])
        with pytest.raises(ValueError, match="must be positive"):
            tile_iterator(df, tile_size=(0, 4))
        with pytest.raises(ValueError, match="non-negative"):
            tile_iterator(df, tile_size=(4, 4), overlap=(-1, 0))
        with pytest.raises(ValueError, match="strictly smaller"):
            tile_iterator(df, tile_size=(4, 4), overlap=(4, 0))


class TestStitch:
    @pytest.mark.parametrize("overlap", [(0, 0), (8, 8)])
    def test_roundtrip(self, spark, overlap):
        arr = _img(100, 70, seed=2)
        df = spark.createDataFrame([(1, bytearray(encode_png(arr, "RGB")))],
                                   ["media_id", "payload"])
        tiles = tile_iterator(df, tile_size=(64, 64), overlap=overlap)
        out = stitch_tiles(tiles, width=100, height=70).collect()
        assert len(out) == 1
        got = decode(bytes(out[0]["image"]))
        assert got.size == (100, 70)
        assert (got.arr == arr).all()

    def test_two_images_grouped(self, spark):
        rows = [(i, bytearray(encode_png(_img(40, 30, seed=i), "RGB")))
                for i in (1, 2)]
        df = spark.createDataFrame(rows, ["media_id", "payload"])
        tiles = tile_iterator(df, tile_size=(32, 32))
        out = stitch_tiles(tiles, width=40, height=30)
        assert out.count() == 2

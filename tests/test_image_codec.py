"""Pure-stdlib image codec: real PNG/BMP/PPM pixel kernels without PIL
(functions/image_codec.py) and their wiring through the image-function
surface (functions/image.py) and multimodal operators."""

from __future__ import annotations

import base64
import json
import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pixeltable_spark.functions import image as pxi
from pixeltable_spark.functions import image_codec as ic


def _checker_png(w=8, h=6) -> bytes:
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[::2, ::2] = [255, 0, 0]
    arr[1::2, 1::2] = [0, 255, 0]
    return ic.encode_png(arr, "RGB")


class TestCodecCore:
    def test_png_roundtrip_all_modes(self):
        for mode, nch in (("L", 1), ("LA", 2), ("RGB", 3), ("RGBA", 4)):
            arr = (np.arange(5 * 4 * nch, dtype=np.uint8)
                   .reshape(4, 5, nch) * 7 % 256).astype(np.uint8)
            img = ic.decode(ic.encode_png(arr, mode))
            assert img.mode == mode and img.size == (5, 4)
            assert (img.arr == arr).all()

    def test_decodes_external_reference_png(self):
        # canonical 1x1 RGBA PNG (public test vector) — written by an
        # EXTERNAL encoder, so filters/chunks aren't our own dialect
        ext = base64.b64decode(
            "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk"
            "+M9QDwADhgGAWjR9awAAAABJRU5ErkJggg==")
        img = ic.decode(ext)
        assert img.size == (1, 1) and img.mode == "RGBA"

    def test_png_filter_types_decode(self):
        """Hand-build a PNG using each filter type and check unfiltering."""
        arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
        stride = 4 * 3
        rows = []
        # filter 0 (None), 2 (Up), 1 (Sub), 4 (Paeth) on successive rows
        prev = np.zeros(stride, dtype=int)
        raw = arr.reshape(4, stride)
        rows.append(b"\x00" + raw[0].tobytes())
        rows.append(b"\x02" + ((raw[1].astype(int) - raw[0]) % 256)
                    .astype(np.uint8).tobytes())
        sub = raw[2].astype(int).copy()
        sub[3:] = (sub[3:] - raw[2][:-3].astype(int)) % 256
        rows.append(b"\x01" + sub.astype(np.uint8).tobytes())
        paeth = raw[3].astype(int).copy()
        for x in range(stride):
            a = int(raw[3][x - 3]) if x >= 3 else 0
            b = int(raw[2][x])
            c = int(raw[2][x - 3]) if x >= 3 else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            paeth[x] = (paeth[x] - pred) % 256
        rows.append(b"\x04" + paeth.astype(np.uint8).tobytes())
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

        png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(b"".join(rows)))
               + chunk(b"IEND", b""))
        assert (ic.decode(png).arr == arr).all()

    def test_bmp_decode(self):
        # hand-build a 2x2 24-bit BMP (bottom-up, BGR, 4-byte padded rows)
        pixels = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
        rows = b""
        for y in (1, 0):  # bottom-up
            row = b"".join(bytes((b, g, r)) for r, g, b in pixels[y])
            rows += row + b"\x00" * ((4 - len(row) % 4) % 4)
        header = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
                  + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                                len(rows), 2835, 2835, 0, 0))
        img = ic.decode(header + rows)
        assert img.size == (2, 2) and img.mode == "RGB"
        assert tuple(img.arr[0, 0]) == (255, 0, 0)
        assert tuple(img.arr[1, 1]) == (255, 255, 255)

    def test_jpeg_and_gif_header_probe(self):
        # minimal JFIF: SOI + APP0 + SOF0 (public marker layout)
        sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 480, 640, 3) + b"\x01\x11\x00"
        jpeg = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof0
        info = ic.probe(jpeg)
        assert info == {"format": "JPEG", "width": 640, "height": 480,
                        "mode": "RGB"}
        gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
        assert ic.probe(gif)["width"] == 320

    def test_transforms(self):
        img = ic.decode(_checker_png(8, 6))
        assert img.resize((4, 3)).size == (4, 3)
        assert img.crop((2, 1, 6, 5)).size == (4, 4)
        assert img.rotate(90).size == (6, 8)
        assert img.convert("L").mode == "L"
        assert img.getchannel(0).mode == "L"
        assert len(img.histogram()) == 3 * 256
        assert img.getextrema()[0] == (0, 255)
        e = img.entropy()
        assert 0.0 < e < 8.0
        px = img.getpixel((0, 0))
        assert px == (255, 0, 0)

    def test_blend_and_composite(self):
        a = ic.MiniImage(np.full((2, 2, 3), 100, np.uint8), "RGB")
        b = ic.MiniImage(np.full((2, 2, 3), 200, np.uint8), "RGB")
        assert int(ic.blend(a, b, 0.5).arr[0, 0, 0]) == 150
        mask = ic.MiniImage(np.full((2, 2, 1), 255, np.uint8), "L")
        assert int(ic.composite(a, b, mask).arr[0, 0, 0]) == 100


class TestImageFunctionsReal:
    @pytest.fixture()
    def img_df(self, spark):
        return spark.createDataFrame(
            [(1, _checker_png(8, 6)), (2, b"not an image at all........")],
            "media_id long, payload binary")

    def test_metadata_real_vs_stub(self, img_df):
        rows = {r["media_id"]: r for r in img_df.select(
            "media_id",
            pxi.width(F.col("payload")).alias("w"),
            pxi.height(F.col("payload")).alias("h"),
            pxi.mode(F.col("payload")).alias("m")).collect()}
        assert (rows[1]["w"], rows[1]["h"], rows[1]["m"]) == (8, 6, "RGB")
        # non-image payload keeps the deterministic stub contract
        assert 64 <= rows[2]["w"] <= 255

    def test_resize_produces_real_png(self, img_df):
        rows = {r["media_id"]: r["out"] for r in img_df.select(
            "media_id", pxi.resize(F.col("payload"), 4, 3).alias("out")
        ).collect()}
        out = ic.decode(bytes(rows[1]))
        assert out.size == (4, 3)
        assert len(rows[2]) == 16  # md5 stub for the non-image payload

    def test_extract_real_values(self, img_df):
        rows = {r["media_id"]: r for r in img_df.select(
            "media_id",
            pxi.size(F.col("payload")).alias("sz"),
            pxi.getbands(F.col("payload")).alias("bands"),
            pxi.getextrema(F.col("payload")).alias("ext")).collect()}
        assert rows[1]["sz"] == [8, 6]
        assert rows[1]["bands"] == ["R", "G", "B"]
        assert json.loads(rows[1]["ext"])[0] == [0, 255]

    def test_multimodal_meta_real(self, spark):
        from pixeltable_spark.operators import multimodal as mm
        df = spark.createDataFrame(
            [(1, _checker_png(10, 4))], "media_id long, payload binary")
        out = mm.extract_image_metadata(df).collect()[0]["image_meta"]
        assert (out["width"], out["height"]) == (10, 4)

    def test_multimodal_resize_real(self, spark):
        from pixeltable_spark.operators import multimodal as mm
        df = spark.createDataFrame(
            [(1, _checker_png(10, 4))], "media_id long, payload binary")
        out = mm.resize_images(df, 5, 2).collect()[0]["resized"]
        assert ic.decode(bytes(out)).size == (5, 2)


class TestFunctionGapFill:
    def test_image_to_video_real(self, spark):
        from pixeltable_spark.functions import video_codec as vcodec
        df = spark.createDataFrame([(1, _checker_png(4, 3))],
                                   "media_id long, payload binary")
        out = df.select(pxi.to_video(F.col("payload"), duration=0.5,
                                     fps=8).alias("v")).collect()[0]["v"]
        frames, fps = vcodec.decode(bytes(out))
        assert frames.shape == (4, 3, 4, 3) and fps == 8.0

    def test_json_cell_reductions(self, spark):
        import pixeltable_spark as pxt
        t = pxt.table_from_rows(
            spark, [{"k": 0, "scores": "[1.0, 2.0, 3.5]"},
                    {"k": 1, "scores": "[]"}],
            "jm_docs", rowid_cols=["k"])
        from pixeltable_spark.functions import json as pxj
        rows = {r["k"]: r for r in t.select(
            t.k, s=pxj.sum(t.scores), mn=pxj.min(t.scores),
            mx=pxj.max(t.scores), av=pxj.mean(t.scores)).collect()}
        assert rows[0]["s"] == 6.5 and rows[0]["mn"] == 1.0
        assert rows[0]["mx"] == 3.5 and rows[0]["av"] == pytest.approx(6.5 / 3)
        assert rows[1]["s"] == 0.0 and rows[1]["mn"] is None

    def test_json_count_value(self, spark):
        import pixeltable_spark as pxt
        t = pxt.table_from_rows(
            spark, [{"k": 0, "labels": '["cat", "dog", "cat"]'}],
            "jc_docs", rowid_cols=["k"])
        from pixeltable_spark.functions import json as pxj
        r = t.select(c=pxj.count(t.labels, "cat")).collect()[0]
        assert r["c"] == 2

    def test_list_iterator_both_forms(self, spark):
        import pixeltable_spark as pxt
        from pixeltable_spark.functions.json import list_iterator
        df = spark.createDataFrame(
            [(1, '[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]',
              '[10, 20, 30]', '["p", "q"]')],
            "doc_id long, els string, l1 string, l2 string")
        out = list_iterator(df, elements="els",
                            fields={"a": pxt.Int(), "b": pxt.String()})
        rows = sorted((r["pos"], r["a"], r["b"]) for r in out.collect())
        assert rows == [(0, 1, "x"), (1, 2, "y")]
        padded = list_iterator(df, mode="padded", v1="l1", v2="l2").collect()
        assert len(padded) == 3
        last = max(padded, key=lambda r: r["pos"])
        assert last["v2"] is None
        import pytest as _pt
        with _pt.raises(Exception, match="different lengths"):
            list_iterator(df, mode="strict", v1="l1", v2="l2").collect()

    def test_bboxes_canvas_ops(self, spark):
        from pixeltable_spark.functions import vision
        df = spark.createDataFrame(
            [(1, [[ -5.0, 2.0, 15.0, 8.0], [100.0, 100.0, 120.0, 130.0],
                  [2.0, 2.0, 4.0, 4.0]],)],
            "k long, boxes array<array<double>>")
        out = df.select(vision.bboxes_clip_to_canvas(
            F.col("boxes"), "xyxy", width=10, height=10).alias("c")).collect()[0]["c"]
        assert [list(b) for b in out] == [[0.0, 2.0, 10.0, 8.0],
                                         [2.0, 2.0, 4.0, 4.0]]
        # min_visibility drops the heavily-clipped first box (10/20 wide -> 0.5 vis)
        out2 = df.select(vision.bboxes_clip_to_canvas(
            F.col("boxes"), "xyxy", width=10, height=10,
            min_visibility=0.6).alias("c")).collect()[0]["c"]
        assert [list(b) for b in out2] == [[2.0, 2.0, 4.0, 4.0]]
        crop = df.select(vision.bboxes_crop_canvas(
            F.col("boxes"), "xyxy", canvas_region=[2.0, 2.0, 12.0, 12.0],
            canvas_region_format="xyxy", canvas_width=10,
            canvas_height=10).alias("c")).collect()[0]["c"]
        assert list(crop[2]) == [0.0, 0.0, 2.0, 2.0]

    def test_uuid_and_util_extras(self, spark):
        from pixeltable_spark.functions import uuid_net_util as u
        v7a, v7b = u._uuid7_py(), u._uuid7_py()
        assert v7a[14] == "7" and v7a[:13] <= v7b[:13]  # ms-ordered prefix
        import uuid as _u
        x = _u.uuid4()
        assert u.hex.py_fn(str(x)) == x.hex
        assert u.to_string.py_fn(str(x)) == str(x)
        assert u.presigned_url("/local/file.png") == "/local/file.png"
        import pytest as _pt
        with _pt.raises(NotImplementedError, match="credentials"):
            u.presigned_url("s3://bucket/key.png")
        assert u.resolve_torch_device() == "cpu"
        meta = u.get_media_metadata(_checker_png(3, 2))
        assert meta["format"] == "PNG" and meta["width"] == 3


class TestAdam7:
    """Adam7-interlaced PNG decode (W3C PNG spec §8.2): each pass is an
    independently filtered sub-image placed back on the (dx, dy) grid."""

    @staticmethod
    def _make_interlaced_png(arr):
        import struct
        import zlib

        from pixeltable_spark.functions import image_codec as ic
        h, w, _nch = arr.shape

        def chunk(ctype, data):
            crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", crc))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
        body = b""
        for x0, y0, dx, dy in ic._ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            body += b"".join(b"\x00" + sub[y].tobytes()
                             for y in range(sub.shape[0]))
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(body)) + chunk(b"IEND", b""))

    def test_roundtrip_exact_various_dims(self):
        import numpy as np

        from pixeltable_spark.functions import image_codec as ic
        for h, w in [(13, 9), (1, 1), (8, 8), (17, 23), (2, 31)]:
            rng = np.random.default_rng(h * 100 + w)
            a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            img = ic.decode(self._make_interlaced_png(a))
            assert img.mode == "RGB" and np.array_equal(img.arr, a), (h, w)

    def test_probe_reports_dims(self):
        import numpy as np

        from pixeltable_spark.functions import image_codec as ic
        a = np.zeros((5, 7, 3), dtype=np.uint8)
        info = ic.probe(self._make_interlaced_png(a))
        assert info["width"] == 7 and info["height"] == 5


class TestPngBitDepths:
    """Bit depths beyond 8 (PNG spec table 11.1): 1/2/4-bit gray and
    palette, 16-bit gray and RGB — the most common real-world PNGs the
    previous 8-bit-only subset rejected."""

    @staticmethod
    def _chunk(ctype, data):
        import struct
        import zlib
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", crc))

    @classmethod
    def _png(cls, w, h, depth, ctype, scanlines, plte=None, filt=0):
        import struct
        import zlib
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
        body = b"".join(bytes([filt]) + ln for ln in scanlines)
        out = b"\x89PNG\r\n\x1a\n" + cls._chunk(b"IHDR", ihdr)
        if plte is not None:
            out += cls._chunk(b"PLTE", plte)
        return out + cls._chunk(b"IDAT", zlib.compress(body)) + \
            cls._chunk(b"IEND", b"")

    def test_1bit_gray(self):
        import numpy as np
        # 10x2: bits 1010101010 / 0101010101, MSB-first packed
        p = self._png(10, 2, 1, 0, [b"\xaa\x80", b"\x55\x40"])
        img = ic.decode(p)
        a = np.asarray(img.arr)[:, :, 0]
        assert a.shape == (2, 10)
        assert list(a[0]) == [255, 0] * 5      # scaled to 0/255
        assert list(a[1]) == [0, 255] * 5

    def test_2bit_and_4bit_gray_scaling(self):
        import numpy as np
        # 2-bit values 0,1,2,3 -> 0,85,170,255
        p2 = self._png(4, 1, 2, 0, [bytes([0b00011011])])
        a2 = np.asarray(ic.decode(p2).arr)[0, :, 0]
        assert list(a2) == [0, 85, 170, 255]
        # 4-bit values 0..3 in nibbles -> x*17
        p4 = self._png(4, 1, 4, 0, [bytes([0x01, 0x23])])
        a4 = np.asarray(ic.decode(p4).arr)[0, :, 0]
        assert list(a4) == [0, 17, 34, 51]

    def test_4bit_palette(self):
        import numpy as np
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
        # indices 0,1,2,3 per row of 4 pixels (two nibbles/byte)
        p = self._png(4, 2, 4, 3, [bytes([0x01, 0x23])] * 2, plte=plte)
        img = ic.decode(p)
        a = np.asarray(img.arr)
        assert img.mode == "RGB" and a.shape == (2, 4, 3)
        assert list(a[0, 0]) == [255, 0, 0] and list(a[1, 3]) == [9, 9, 9]

    def test_16bit_gray_and_rgb_high_byte(self):
        import numpy as np
        import struct
        # 16-bit gray 3x1: values 0x0000, 0x7fff, 0xffff -> 0,127,255
        ln = struct.pack(">HHH", 0, 0x7FFF, 0xFFFF)
        a = np.asarray(ic.decode(self._png(3, 1, 16, 0, [ln])).arr)
        assert list(a[0, :, 0]) == [0, 127, 255]
        # 16-bit RGB 2x1 with filter 2 (Up): second row adds byte-wise
        r1 = struct.pack(">HHHHHH", 0x1100, 0x2200, 0x3300,
                         0x4400, 0x5500, 0x6600)
        p = self._png(2, 2, 16, 2, [r1, b"\x00" * 12], filt=0)
        # rebuild manually: row2 filter=2 over zeros == row1 values
        import zlib as _z
        body = b"\x00" + r1 + b"\x02" + b"\x00" * 12
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        png = (b"\x89PNG\r\n\x1a\n" + self._chunk(b"IHDR", ihdr)
               + self._chunk(b"IDAT", _z.compress(body))
               + self._chunk(b"IEND", b""))
        arr = np.asarray(ic.decode(png).arr)
        assert arr.shape == (2, 2, 3)
        assert list(arr[0, 0]) == [0x11, 0x22, 0x33]
        assert (arr[1] == arr[0]).all()  # Up filter over zero row

    def test_illegal_combo_rejected(self):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="illegal PNG bit depth"):
            ic.decode(self._png(2, 1, 16, 3, [b"\x00\x00\x00\x00"],
                                plte=bytes(6)))

    def test_1bit_adam7_interlaced(self):
        import numpy as np
        import struct
        import zlib
        # 9x9 checkerboard, 1-bit gray, Adam7: build per-pass scanlines
        full = ((np.indices((9, 9)).sum(axis=0)) % 2).astype(np.uint8)
        body = b""
        for x0, y0, dx, dy in ic._ADAM7:
            sub = full[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for row in sub:
                body += b"\x00" + np.packbits(row).tobytes()
        ihdr = struct.pack(">IIBBBBB", 9, 9, 1, 0, 0, 0, 1)
        png = (b"\x89PNG\r\n\x1a\n" + self._chunk(b"IHDR", ihdr)
               + self._chunk(b"IDAT", zlib.compress(body))
               + self._chunk(b"IEND", b""))
        a = np.asarray(ic.decode(png).arr)[:, :, 0]
        assert (a == full * 255).all()


class TestPerceptualHashes:
    """aHash/dHash/pHash + hamming_pairs image near-dup."""

    def _png(self, arr):
        from pixeltable_spark.functions.image_codec import encode_png
        return bytearray(encode_png(arr, "RGB"))

    def _imgs(self):
        import numpy as np
        rng = np.random.RandomState(11)
        base = rng.randint(0, 256, size=(40, 40, 3), dtype="uint8")
        near = base.copy()
        near[:3, :3] = 255  # tiny corner change
        other = rng.randint(0, 256, size=(40, 40, 3), dtype="uint8")
        return base, near, other

    def test_hashes_stable_and_discriminative(self, spark):
        from pyspark.sql import functions as F

        from pixeltable_spark.functions.image import ahash, dhash, phash
        base, near, other = self._imgs()
        df = spark.createDataFrame(
            [(1, self._png(base)), (2, self._png(near)),
             (3, self._png(other)), (4, self._png(base))],
            ["doc_id", "payload"])
        for fn in (ahash, dhash, phash):
            h = {r["doc_id"]: r["h"] for r in
                 df.select("doc_id", fn(F.col("payload")).alias("h")).collect()}
            assert h[1] == h[4], fn.__name__  # identical -> identical
            ham_near = bin((h[1] ^ h[2]) & ((1 << 64) - 1)).count("1")
            ham_other = bin((h[1] ^ h[3]) & ((1 << 64) - 1)).count("1")
            assert ham_near <= 6 < ham_other, (fn.__name__, ham_near, ham_other)

    def test_brightness_invariance_dhash(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from pixeltable_spark.functions.image import dhash
        base, _, _ = self._imgs()
        brighter = np.clip(base.astype(np.int32) + 40, 0, 255).astype("uint8")
        df = spark.createDataFrame(
            [(1, self._png(base)), (2, self._png(brighter))],
            ["doc_id", "payload"])
        h = {r["doc_id"]: r["h"] for r in
             df.select("doc_id", dhash(F.col("payload")).alias("h")).collect()}
        ham = bin((h[1] ^ h[2]) & ((1 << 64) - 1)).count("1")
        assert ham <= 4  # uniform brightness shift barely moves dhash

    def test_hamming_pairs_banding(self, spark):
        from pyspark.sql import functions as F

        from pixeltable_spark.functions.image import ahash
        from pixeltable_spark.operators.dedup import hamming_pairs
        base, near, other = self._imgs()
        df = spark.createDataFrame(
            [(1, self._png(base)), (2, self._png(near)),
             (3, self._png(other))], ["doc_id", "payload"])
        hashes = df.select("doc_id", ahash(F.col("payload")).alias("h"))
        pairs = hamming_pairs(hashes, "h", bits=64, max_hamming=6).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 2) in got and (1, 3) not in got

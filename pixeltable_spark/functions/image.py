"""Image functions (reference functions/image.py, 30 fns).

Images are by-reference (path/URL string) or inline binary payloads
(SURVEY §1.3). Every function here is an Arrow-batched pandas UDF; the
pixel work is delegated to PIL when installed, else to the pure-stdlib
codec in functions/image_codec.py — REAL pixel kernels for PNG (8-bit),
BMP (24/32) and PPM, plus real header metadata for JPEG/GIF. Payloads
neither codec understands fall back to the deterministic md5 stub in
operators/multimodal.py, so offline pipelines on synthetic payloads stay
testable and nothing fails silently.
"""

from __future__ import annotations

import base64 as _b64
import hashlib
import io
from typing import Any, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - PIL not in this container
    from PIL import Image as _PILImage
    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False


def _load_image(payload: bytes):
    """The narrow waist: PIL when installed, else the pure-python codec
    (raises ValueError for formats outside its subset)."""
    if HAS_PIL:
        return _PILImage.open(io.BytesIO(payload))
    from . import image_codec
    return image_codec.decode(payload)


def _encode(img) -> bytes:
    if HAS_PIL:
        buf = io.BytesIO()
        img.save(buf, format=getattr(img, "format", None) or "PNG")
        return buf.getvalue()
    return img.save_bytes(getattr(img, "format", None))


def _stub_meta(payload: Optional[bytes]) -> dict:
    from ..operators.multimodal import _decode_image_stub
    return _decode_image_stub(payload)


def _real_meta(payload: bytes) -> Optional[dict]:
    """Header-derived metadata (no pixel decode needed) for any format the
    probe recognizes; None for non-image payloads."""
    if HAS_PIL:
        try:
            img = _load_image(payload)
            return {"width": img.width, "height": img.height,
                    "mode": img.mode, "n_bytes": len(payload)}
        except Exception:  # noqa: BLE001
            return None
    from . import image_codec
    info = image_codec.probe(payload)
    if info is None:
        return None
    return {"width": info["width"], "height": info["height"],
            "mode": info["mode"], "format": info.get("format"),
            "n_bytes": len(payload)}


def _meta_udf(field: str, ret: T.DataType):
    @F.pandas_udf(ret)
    def fn(s):
        import pandas as pd
        out = []
        for p in s:
            if p is None:
                out.append(None)
                continue
            vals = _real_meta(p) or _stub_meta(p)
            out.append(vals[field])
        return pd.Series(out)
    return fn


def width(col: Column) -> Column:
    return _meta_udf("width", T.IntegerType())(col)


def height(col: Column) -> Column:
    return _meta_udf("height", T.IntegerType())(col)


def mode(col: Column) -> Column:
    return _meta_udf("mode", T.StringType())(col)


def _metadata_json(p) -> str:
    """Spark-free metadata kernel: dims/mode (+EXIF for JPEG/TIFF)."""
    import json
    m = _real_meta(p)
    if m is None:
        return json.dumps(_stub_meta(p))
    d = {"width": m["width"], "height": m["height"], "mode": m["mode"]}
    if m.get("format") in ("JPEG", "TIFF"):
        from .tiff_codec import exif_from_jpeg, exif_from_tiff_body
        ex = (exif_from_jpeg(bytes(p)) if m["format"] == "JPEG"
              else exif_from_tiff_body(bytes(p)))
        if ex:
            d["exif"] = ex
    return json.dumps(d, sort_keys=True)


def get_metadata(col: Column) -> Column:
    """JSON metadata blob (reference functions/image.py get_metadata)."""
    @F.pandas_udf(T.StringType())
    def fn(s):
        import json
        import pandas as pd
        out = []
        for p in s:
            if p is None:
                out.append(None)
                continue
            out.append(_metadata_json(p))
        return pd.Series(out)
    return fn(col)


def b64_encode(col: Column) -> Column:
    """Pure-JVM base64 of the payload (reference functions/image.py
    b64_encode) — no Python needed."""
    return F.base64(col)


def _transform_udf(name: str, transform):
    """Payload->payload transform: real decode→transform→PNG-encode via
    PIL or the pure-python codec; payloads/ops outside either codec's
    subset fall back to a deterministic re-hash keyed by the operation
    (keeps pipelines on synthetic payloads testable offline)."""
    @F.pandas_udf(T.BinaryType())
    def fn(s):
        import pandas as pd
        out = []
        for p in s:
            if p is None:
                out.append(None)
                continue
            try:
                out.append(_encode(transform(_load_image(p))))
            except Exception:  # noqa: BLE001 — unsupported format/op
                out.append(hashlib.md5(p + name.encode()).digest())
        return pd.Series(out)
    return fn


def resize(col: Column, w: int, h: int,
           resample: "str | None" = None) -> Column:
    """Resize; `resample` picks the filter (nearest/bilinear/bicubic/
    lanczos/box — real separable convolutions in the stdlib codec;
    PIL's Resampling constants when PIL serves the decode). Default
    None keeps the engine's deterministic historical kernel."""
    def _do(img):
        if resample is None:
            return img.resize((w, h))
        try:  # PIL path: map the name onto its Resampling enum
            import PIL.Image as _PI
            if not hasattr(img, "arr"):
                return img.resize(
                    (w, h), getattr(_PI.Resampling, resample.upper()))
        except ImportError:
            pass
        return img.resize((w, h), resample=resample)
    tag = f"resize{w}x{h}" + (resample or "")
    return _transform_udf(tag, _do)(col)


def rotate(col: Column, degrees: float) -> Column:
    return _transform_udf(f"rotate{degrees}",
                          lambda img: img.rotate(degrees))(col)


def crop(col: Column, box: tuple) -> Column:
    return _transform_udf(f"crop{box}", lambda img: img.crop(box))(col)


def convert(col: Column, target_mode: str) -> Column:
    return _transform_udf(f"convert{target_mode}",
                          lambda img: img.convert(target_mode))(col)


def thumbnail(col: Column, size: tuple = (128, 128)) -> Column:
    def t(img):
        img = img.copy()
        img.thumbnail(size)
        return img
    return _transform_udf(f"thumb{size}", t)(col)


def getchannel(col: Column, channel: int) -> Column:
    return _transform_udf(f"getchannel{channel}",
                          lambda img: img.getchannel(channel))(col)


def point(col: Column, scale: float, offset: float = 0.0) -> Column:
    """Per-pixel linear map (reference functions/image.py point; the lut
    form reduces to scale/offset for the common case)."""
    return _transform_udf(f"point{scale},{offset}",
                          lambda img: img.point(lambda v: v * scale + offset))(col)


def effect_spread(col: Column, distance: int) -> Column:
    return _transform_udf(f"spread{distance}",
                          lambda img: img.effect_spread(distance))(col)


def transpose(col: Column, method: int = 0) -> Column:
    return _transform_udf(f"transpose{method}",
                          lambda img: img.transpose(method))(col)


def quantize(col: Column, colors: int = 256) -> Column:
    return _transform_udf(f"quantize{colors}",
                          lambda img: img.quantize(colors))(col)


def reduce(col: Column, factor: int) -> Column:
    return _transform_udf(f"reduce{factor}",
                          lambda img: img.reduce(factor))(col)


def _image_module():
    """The module providing alpha_composite/blend/composite: PIL.Image
    when installed, else the pure-python codec's implementations."""
    if HAS_PIL:
        return _PILImage
    from . import image_codec
    return image_codec


def _binary_transform_udf(name: str, transform):
    """Two-image transform (alpha_composite/blend/composite family);
    stub = deterministic hash of both payloads + op."""
    @F.pandas_udf(T.BinaryType())
    def fn(a, b):
        import pandas as pd
        out = []
        for p, q in zip(a, b):
            if p is None or q is None:
                out.append(None)
                continue
            try:
                out.append(_encode(transform(_load_image(p), _load_image(q))))
            except Exception:  # noqa: BLE001
                out.append(hashlib.md5(p + q + name.encode()).digest())
        return pd.Series(out)
    return fn


def alpha_composite(a: Column, b: Column) -> Column:
    return _binary_transform_udf(
        "alpha_composite",
        lambda x, y: _image_module().alpha_composite(x, y))(a, b)


def blend(a: Column, b: Column, alpha: float = 0.5) -> Column:
    return _binary_transform_udf(
        f"blend{alpha}", lambda x, y: _image_module().blend(x, y, alpha))(a, b)


def composite(a: Column, b: Column, mask: Column) -> Column:
    """Three-input composite; the mask participates in the stub hash too."""
    @F.pandas_udf(T.BinaryType())
    def fn(s1, s2, s3):
        import pandas as pd
        out = []
        for p, q, m in zip(s1, s2, s3):
            if p is None or q is None or m is None:
                out.append(None)
                continue
            try:
                out.append(_encode(_image_module().composite(
                    _load_image(p), _load_image(q), _load_image(m))))
            except Exception:  # noqa: BLE001
                out.append(hashlib.md5(p + q + m + b"composite").digest())
        return pd.Series(out)
    return fn(a, b, mask)


def _extract_udf(name: str, ret: T.DataType, pil_fn, stub_fn):
    """Image->scalar/array extraction; real decode via either codec,
    deterministic hash-derived stub for undecodable payloads."""
    @F.pandas_udf(ret)
    def fn(s):
        import pandas as pd
        out = []
        for p in s:
            if p is None:
                out.append(None)
                continue
            try:
                out.append(pil_fn(_load_image(p)))
            except Exception:  # noqa: BLE001
                out.append(stub_fn(p))
        return pd.Series(out)
    return fn


def entropy(col: Column) -> Column:
    return _extract_udf(
        "entropy", T.DoubleType(), lambda img: float(img.entropy()),
        lambda p: (int.from_bytes(hashlib.md5(p).digest()[:4], "big") % 8000)
        / 1000.0)(col)


def getbands(col: Column) -> Column:
    return _extract_udf(
        "getbands", T.ArrayType(T.StringType()),
        lambda img: list(img.getbands()),
        lambda p: list(_stub_meta(p)["mode"]))(col)


def getbbox(col: Column) -> Column:
    return _extract_udf(
        "getbbox", T.ArrayType(T.IntegerType()),
        lambda img: list(img.getbbox() or ()),
        lambda p: [0, 0, _stub_meta(p)["width"], _stub_meta(p)["height"]])(col)


def size(col: Column) -> Column:
    return _extract_udf(
        "size", T.ArrayType(T.IntegerType()),
        lambda img: [img.width, img.height],
        lambda p: [_stub_meta(p)["width"], _stub_meta(p)["height"]])(col)


def histogram(col: Column) -> Column:
    """Pixel histogram (256 bins per band); stub derives 16 deterministic
    pseudo-counts from the payload hash."""
    def stub(p):
        h = hashlib.md5(p).digest()
        return [int(b) for b in h]
    return _extract_udf(
        "histogram", T.ArrayType(T.IntegerType()),
        lambda img: list(img.histogram()), stub)(col)


def getextrema(col: Column) -> Column:
    import json as _json
    return _extract_udf(
        "getextrema", T.StringType(),
        lambda img: _json.dumps(img.getextrema()),
        lambda p: _json.dumps([[0, 255]] * len(_stub_meta(p)["mode"])))(col)


def getcolors(col: Column, maxcolors: int = 256) -> Column:
    import json as _json
    def stub(p):
        h = hashlib.md5(p).digest()
        return _json.dumps([[int(h[i]), [int(h[i + 1])] * 3] for i in range(0, 8, 2)])
    return _extract_udf(
        f"getcolors{maxcolors}", T.StringType(),
        lambda img: _json.dumps(img.getcolors(maxcolors)), stub)(col)


def getpalette(col: Column) -> Column:
    return _extract_udf(
        "getpalette", T.ArrayType(T.IntegerType()),
        lambda img: list(img.getpalette()) if img.getpalette() else None,
        lambda p: None)(col)


def getpixel(col: Column, xy: tuple) -> Column:
    def stub(p):
        h = hashlib.md5(p + f"{xy}".encode()).digest()
        return [int(h[0]), int(h[1]), int(h[2])]
    def pil(img):
        v = img.getpixel(xy)
        return list(v) if isinstance(v, tuple) else [v]
    return _extract_udf(f"getpixel{xy}", T.ArrayType(T.IntegerType()),
                        pil, stub)(col)


def getprojection(col: Column) -> Column:
    import json as _json
    def stub(p):
        m = _stub_meta(p)
        return _json.dumps([[1] * m["width"], [1] * m["height"]])
    return _extract_udf(
        "getprojection", T.StringType(),
        lambda img: _json.dumps([list(x) for x in img.getprojection()]),
        stub)(col)


def to_video(col: Column, duration: float, fps: int = 24) -> Column:
    """Loop a still image into a video of `duration` seconds (reference
    functions/image.py:656 to_video, ffmpeg -loop). REAL for payloads the
    pure-python codec decodes (output: uncompressed AVI); md5 stub
    otherwise."""
    def real(p: bytes) -> bytes:
        import numpy as np

        from . import video_codec
        from .image_codec import decode as img_decode
        frame = img_decode(p).convert("RGB").arr
        n = max(1, int(duration * fps))
        return video_codec.encode(
            np.repeat(frame[None, :, :, :], n, axis=0), float(fps))

    @F.pandas_udf(T.BinaryType())
    def fn(s):
        import pandas as pd
        out = []
        for p in s:
            if p is None:
                out.append(None)
                continue
            try:
                out.append(real(bytes(p)))
            except Exception:  # noqa: BLE001
                out.append(hashlib.md5(
                    p + f"to_video{duration}x{fps}".encode()).digest())
        return pd.Series(out)
    return fn(col)


# ---------------------------------------------------------------------------
# tile iterator + stitcher (reference functions/image.py:473 tile_iterator,
# :576 stitch_tiles) — REAL for payloads the pure-python codec decodes
# ---------------------------------------------------------------------------

def _tile_grid(w: int, h: int, tile_size: tuple, overlap: tuple):
    """Reference's exact grid formula (functions/image.py:527-529):
    xlen such that widths t, 2t-o, 3t-2o, ... fit 1, 2, 3, ... tiles."""
    tw, th = tile_size
    ox, oy = overlap
    xlen = (w - ox - 1) // (tw - ox) + 1
    ylen = (h - oy - 1) // (th - oy) + 1
    return xlen, ylen


def tile_iterator(df: DataFrame, tile_size: tuple, overlap: tuple = (0, 0),
                  payload_col: str = "payload",
                  id_col: str = "media_id") -> DataFrame:
    """Explode each image into fixed-size tiles in row-major order
    (reference functions/image.py:473 tile_iterator): one row per tile
    with `pos`, `tile` (PNG payload), `tile_coord` (i, j grid cell) and
    `tile_box` (x1, y1, x2, y2 source pixels). Edge tiles are padded with
    blackspace to exactly `tile_size`, matching PIL crop semantics.

    A narrow mapInPandas transformation — tiles of one image never leave
    the partition that scanned it, so at 100 TB the operator adds zero
    shuffle; downstream per-tile UDFs (detection, overlay) parallelize
    over the exploded rows. Validation mirrors the reference's errors."""
    tw, th = int(tile_size[0]), int(tile_size[1])
    ox, oy = int(overlap[0]), int(overlap[1])
    if tw <= 0 or th <= 0:
        raise ValueError(f"`tile_size` dimensions must be positive; got {tile_size}")
    if ox < 0 or oy < 0:
        raise ValueError(f"`overlap` dimensions must be non-negative; got {overlap}")
    if ox >= tw or oy >= th:
        raise ValueError(
            f"`overlap` dimensions {overlap!r} are not strictly smaller "
            f"than `tile_size` {tile_size!r}")

    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("pos", T.IntegerType()),
        T.StructField("tile", T.BinaryType()),
        T.StructField("tile_coord", T.ArrayType(T.IntegerType())),
        T.StructField("tile_box", T.ArrayType(T.IntegerType())),
    ])

    def op(batches):
        import numpy as np
        import pandas as pd

        from .image_codec import encode_png
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                p = r[payload_col]
                if p is None:
                    continue
                try:
                    img = _load_image(bytes(p))
                    arr = (np.asarray(img) if HAS_PIL else img.arr)
                    mode = img.mode
                except Exception:  # noqa: BLE001
                    continue
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                h, w = arr.shape[:2]
                xlen, ylen = _tile_grid(w, h, (tw, th), (ox, oy))
                pos = 0
                for j in range(ylen):
                    for i in range(xlen):
                        x1, y1 = i * (tw - ox), j * (th - oy)
                        x2, y2 = x1 + tw, y1 + th
                        tile = np.zeros((th, tw, arr.shape[2]), dtype=np.uint8)
                        sub = arr[y1:min(y2, h), x1:min(x2, w)]
                        tile[:sub.shape[0], :sub.shape[1]] = sub
                        rows.append({
                            id_col: r[id_col], "pos": pos,
                            "tile": encode_png(
                                tile if tile.shape[2] > 1 else tile[:, :, 0],
                                mode),
                            "tile_coord": [i, j],
                            "tile_box": [x1, y1, x2, y2],
                        })
                        pos += 1
            yield pd.DataFrame(
                rows, columns=[id_col, "pos", "tile", "tile_coord", "tile_box"])

    return df.mapInPandas(op, out_schema)


def stitch_tiles(tiles_df: DataFrame, width, height,
                 tile_col: str = "tile", box_col: str = "tile_box",
                 id_col: str = "media_id",
                 with_count: bool = False) -> DataFrame:
    """Reconstruct one image per group by pasting tiles back at their
    `tile_box` origin, later tiles overwriting earlier ones in overlap
    regions; edge-tile padding is clipped by the canvas bounds — the
    reference's stitch_tiles aggregate (functions/image.py:576), as a
    grouped applyInPandas (one shuffle keyed by image id; each group holds
    one image's tiles, so executor memory is one canvas + one tile).

    `width`/`height` are ints (one size for every group, the reference
    aggregate's shape) or column names carrying the per-image size.
    `with_count=True` adds an `n_tiles` column — counting inside the one
    grouped pass instead of forcing callers to aggregate the (recomputed)
    tile table a second time."""
    fields = [tiles_df.schema[id_col], T.StructField("image", T.BinaryType())]
    if with_count:
        fields.append(T.StructField("n_tiles", T.LongType()))
    out_schema = T.StructType(fields)

    def op(batches):
        import numpy as np
        import pandas as pd

        from .image_codec import decode as img_decode
        from .image_codec import encode_png
        cols = [id_col, "image"] + (["n_tiles"] if with_count else [])
        for pdf in batches:
            rows = []
            for gkey, g in pdf.groupby(id_col, sort=False):
                if isinstance(width, str):
                    gw, gh = int(g[width].iloc[0]), int(g[height].iloc[0])
                else:
                    gw, gh = int(width), int(height)
                if "pos" in g:
                    g = g.sort_values("pos")
                canvas = None
                mode = "RGB"
                for _, r in g.iterrows():
                    try:
                        img = img_decode(bytes(r[tile_col]))
                    except Exception:  # noqa: BLE001
                        continue
                    if canvas is None:
                        canvas = np.zeros((gh, gw, img.arr.shape[2]),
                                          dtype=np.uint8)
                        mode = img.mode
                    x1, y1 = int(r[box_col][0]), int(r[box_col][1])
                    sub = img.arr[:max(0, min(gh - y1, img.height)),
                                  :max(0, min(gw - x1, img.width))]
                    canvas[y1:y1 + sub.shape[0], x1:x1 + sub.shape[1]] = sub
                if canvas is None:
                    continue
                payload = encode_png(
                    canvas if canvas.shape[2] > 1 else canvas[:, :, 0], mode)
                row = {id_col: gkey, "image": payload}
                if with_count:
                    row["n_tiles"] = len(g)
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    # ONE hash shuffle co-locates each image's tiles; the python-side
    # pandas groupby then walks groups at C speed instead of paying
    # Spark's per-group applyInPandas batch + call overhead (thousands of
    # tiny groups is the common case)
    return tiles_df.repartition(F.col(id_col)).mapInPandas(op, out_schema)


# ---------------------------------------------------------------------------
# perceptual hashes (public aHash/dHash/pHash designs, e.g. the
# imagehash library) — the image-side analog of the text dedup family;
# near-dup pairs come from dedup.hamming_pairs banding on the 64-bit
# hash
# ---------------------------------------------------------------------------

def _gray_resized(payload: bytes, w: int, h: int):
    """Decode -> luma grayscale -> deterministic nearest-neighbor
    resize."""
    import numpy as np
    img = _load_image(payload)
    arr = (np.asarray(img) if HAS_PIL else img.arr).astype(np.float64)
    if arr.ndim == 2:
        g = arr
    elif arr.shape[2] == 1:
        g = arr[:, :, 0]
    else:
        g = (arr[:, :, 0] * 0.299 + arr[:, :, 1] * 0.587
             + arr[:, :, 2] * 0.114)
    H, W = g.shape
    yi = (np.arange(h) * H // h)
    xi = (np.arange(w) * W // w)
    return g[yi][:, xi]


def _hash_udf(name: str, kernel):
    @F.pandas_udf(T.LongType())
    def fn(s):
        import pandas as pd

        def one(p):
            if p is None:
                return None
            try:
                bits = kernel(bytes(p))
            except Exception:  # noqa: BLE001
                return int.from_bytes(
                    hashlib.md5(bytes(p) + name.encode()).digest()[:8],
                    "big", signed=True)
            v = 0
            for b in bits:
                v = (v << 1) | int(b)
            # to signed 64-bit for LongType
            return v - (1 << 64) if v >= (1 << 63) else v
        return pd.Series([one(p) for p in s], dtype="object")
    return fn


def ahash(col: Column, hash_size: int = 8) -> Column:
    """Average hash: bit = pixel > mean of the hash_size^2 thumbnail."""
    def kern(p):
        g = _gray_resized(p, hash_size, hash_size)
        return (g > g.mean()).flatten()
    return _hash_udf(f"ahash{hash_size}", kern)(col)


def dhash(col: Column, hash_size: int = 8) -> Column:
    """Difference hash: bit = pixel brighter than its right neighbor on a
    (hash_size+1) x hash_size thumbnail — robust to global brightness."""
    def kern(p):
        g = _gray_resized(p, hash_size + 1, hash_size)
        return (g[:, 1:] > g[:, :-1]).flatten()
    return _hash_udf(f"dhash{hash_size}", kern)(col)


def phash(col: Column, hash_size: int = 8, highfreq_factor: int = 4) -> Column:
    """Perceptual hash: 2D DCT of a 32x32 thumbnail, bit = low-frequency
    coefficient > median (DC excluded) — robust to resize/compression."""
    def kern(p):
        import numpy as np
        n = hash_size * highfreq_factor
        g = _gray_resized(p, n, n)
        k = np.arange(n)
        dct_m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        low = (dct_m @ g @ dct_m.T)[:hash_size, :hash_size]
        flat = low.flatten()[1:]  # drop DC
        med = np.median(flat)
        return np.concatenate([[False], flat > med])
    return _hash_udf(f"phash{hash_size}x{highfreq_factor}", kern)(col)


def _pair_metric_udf(name: str, kern) -> Column:
    """Arrow-batched metric over two image payload columns: decode both
    through the narrow-waist loader, compute kern(gray_a, gray_b) as
    float64 luma arrays (b resized to a's geometry when they differ)."""
    @F.pandas_udf(T.DoubleType())
    def fn(a, b):
        import numpy as np
        import pandas as pd
        out = []
        for pa, pb in zip(a, b):
            if pa is None or pb is None:
                out.append(None)
                continue
            try:
                ia = _load_image(bytes(pa)).convert("L")
                ib = _load_image(bytes(pb)).convert("L")
                ga = np.squeeze(np.asarray(
                    ia.arr if hasattr(ia, "arr") else ia)) \
                    .astype(np.float64)
                gb_img = ib if (ib.width, ib.height) \
                    == (ia.width, ia.height) \
                    else ib.resize((ia.width, ia.height))
                gb = np.squeeze(np.asarray(
                    gb_img.arr if hasattr(gb_img, "arr") else gb_img)) \
                    .astype(np.float64)
                out.append(float(kern(ga, gb)))
            except Exception:  # noqa: BLE001 — undecodable payload
                out.append(None)
        return pd.Series(out, dtype="float64")
    return fn


def psnr(a: Column, b: Column, max_val: float = 255.0) -> Column:
    """Peak signal-to-noise ratio in dB between two images (grayscale
    luma; b resampled to a's geometry). Identical images -> +inf is
    capped at 100 dB so the column stays finite/orderable."""
    def kern(ga, gb):
        import numpy as np
        mse = float(np.mean((ga - gb) ** 2))
        if mse <= 0:
            return 100.0
        return min(100.0, 20 * np.log10(max_val) - 10 * np.log10(mse))
    return _pair_metric_udf("psnr", kern)(a, b)


def ssim(a: Column, b: Column, max_val: float = 255.0) -> Column:
    """Structural similarity (Wang et al. 2004, the standard global
    form with K1=0.01/K2=0.03 over 8x8 windows, mean-pooled): 1.0 for
    identical images, falling with luminance/contrast/structure
    differences. Real windowed statistics in numpy — no external
    imaging dependency."""
    def kern(ga, gb):
        import numpy as np
        c1 = (0.01 * max_val) ** 2
        c2 = (0.03 * max_val) ** 2
        h, w = ga.shape
        bs = 8
        hh, ww = (h // bs) * bs, (w // bs) * bs
        if hh == 0 or ww == 0:   # tiny image: single global window
            mua, mub = ga.mean(), gb.mean()
            va, vb = ga.var(), gb.var()
            cov = ((ga - mua) * (gb - mub)).mean()
            return ((2 * mua * mub + c1) * (2 * cov + c2)
                    / ((mua ** 2 + mub ** 2 + c1) * (va + vb + c2)))
        A = ga[:hh, :ww].reshape(hh // bs, bs, ww // bs, bs)
        B = gb[:hh, :ww].reshape(hh // bs, bs, ww // bs, bs)
        mua = A.mean(axis=(1, 3))
        mub = B.mean(axis=(1, 3))
        va = A.var(axis=(1, 3))
        vb = B.var(axis=(1, 3))
        cov = (A * B).mean(axis=(1, 3)) - mua * mub
        s = ((2 * mua * mub + c1) * (2 * cov + c2)
             / ((mua ** 2 + mub ** 2 + c1) * (va + vb + c2)))
        return float(s.mean())
    return _pair_metric_udf("ssim", kern)(a, b)

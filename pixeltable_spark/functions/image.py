"""Image functions (reference functions/image.py, 30 fns).

Images are by-reference (path/URL string) or inline binary payloads
(SURVEY §1.3). Every function here is an Arrow-batched pandas UDF; the
pixel work is delegated to PIL when installed. This container has no PIL,
so decode falls back to the deterministic md5 stub in
operators/multimodal.py — the Spark plumbing (schema, batching, UDF
signatures) is identical either way, and swapping in PIL changes only
``_load_image``.
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
    if not HAS_PIL:
        raise NotImplementedError(
            "PIL is not installed in this environment; metadata functions "
            "use the deterministic stub instead")
    return _PILImage.open(io.BytesIO(payload))


def _stub_meta(payload: Optional[bytes]) -> dict:
    from ..operators.multimodal import _decode_image_stub
    return _decode_image_stub(payload)


def _meta_udf(field: str, ret: T.DataType):
    @F.pandas_udf(ret)
    def fn(s):
        import pandas as pd
        out = []
        for p in s:
            if p is None:
                out.append(None)
                continue
            if HAS_PIL:
                img = _load_image(p)
                vals = {"width": img.width, "height": img.height,
                        "mode": img.mode, "n_bytes": len(p)}
            else:
                vals = _stub_meta(p)
            out.append(vals[field])
        return pd.Series(out)
    return fn


def width(col: Column) -> Column:
    return _meta_udf("width", T.IntegerType())(col)


def height(col: Column) -> Column:
    return _meta_udf("height", T.IntegerType())(col)


def mode(col: Column) -> Column:
    return _meta_udf("mode", T.StringType())(col)


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
            if HAS_PIL:
                img = _load_image(p)
                out.append(json.dumps({"width": img.width, "height": img.height,
                                       "mode": img.mode}))
            else:
                out.append(json.dumps(_stub_meta(p)))
        return pd.Series(out)
    return fn(col)


def b64_encode(col: Column) -> Column:
    """Pure-JVM base64 of the payload (reference functions/image.py
    b64_encode) — no Python needed."""
    return F.base64(col)


def _transform_udf(name: str, transform):
    """Payload->payload transform; without PIL, a deterministic re-hash
    keyed by the operation (keeps pipelines testable offline)."""
    @F.pandas_udf(T.BinaryType())
    def fn(s):
        import pandas as pd
        out = []
        for p in s:
            if p is None:
                out.append(None)
            elif HAS_PIL:
                img = _load_image(p)
                buf = io.BytesIO()
                transform(img).save(buf, format=img.format or "PNG")
                out.append(buf.getvalue())
            else:
                out.append(hashlib.md5(p + name.encode()).digest())
        return pd.Series(out)
    return fn


def resize(col: Column, w: int, h: int) -> Column:
    return _transform_udf(f"resize{w}x{h}",
                          lambda img: img.resize((w, h)))(col)


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

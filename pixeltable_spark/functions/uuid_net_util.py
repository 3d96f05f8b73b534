"""uuid / net / util function modules (reference functions/uuid.py,
net.py, util.py) — small helpers, native Spark where possible."""

from __future__ import annotations

import urllib.parse as _up
import uuid as _uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exprs import Function
from ..type_system import ColumnType

_STR = ColumnType.string()
_JSON = ColumnType.json()

# uuid --------------------------------------------------------------------
uuid4 = Function("uuid4", ColumnType.uuid(), spark_fn=lambda: F.expr("uuid()"))
uuid5 = Function(
    "uuid5", ColumnType.uuid(), spark_fn=None,
    py_fn=lambda name, namespace=None: str(
        _uuid.uuid5(_uuid.UUID(namespace) if namespace else _uuid.NAMESPACE_DNS, name)),
)
is_uuid = Function(
    "is_uuid", ColumnType.bool_(),
    spark_fn=lambda s: s.rlike(
        "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
    py_fn=lambda s: _is_uuid_py(s),
)


def _is_uuid_py(s: str) -> bool:
    try:
        _uuid.UUID(s)
        return True
    except (ValueError, AttributeError, TypeError):
        return False


# net ---------------------------------------------------------------------
url_host = Function("url_host", _STR,
                    spark_fn=lambda u: F.parse_url(u, F.lit("HOST")),
                    py_fn=lambda u: _up.urlparse(u).hostname)
url_path = Function("url_path", _STR,
                    spark_fn=lambda u: F.parse_url(u, F.lit("PATH")),
                    py_fn=lambda u: _up.urlparse(u).path)
url_query = Function("url_query", _STR,
                     spark_fn=lambda u: F.parse_url(u, F.lit("QUERY")),
                     py_fn=lambda u: _up.urlparse(u).query)
url_scheme = Function("url_scheme", _STR,
                      spark_fn=lambda u: F.parse_url(u, F.lit("PROTOCOL")),
                      py_fn=lambda u: _up.urlparse(u).scheme)
url_encode = Function("url_encode", _STR, spark_fn=None,
                      py_fn=lambda s: _up.quote(s, safe=""))
url_decode = Function("url_decode", _STR,
                      spark_fn=lambda s: F.url_decode(s),
                      py_fn=lambda s: _up.unquote(s))

# util --------------------------------------------------------------------
coalesce = Function("coalesce", _JSON, spark_fn=lambda *cols: F.coalesce(*cols),
                    py_fn=lambda *vals: next((v for v in vals if v is not None), None))
greatest = Function("greatest", ColumnType.float_(),
                    spark_fn=lambda *cols: F.greatest(*cols),
                    py_fn=lambda *vals: max(vals))
least = Function("least", ColumnType.float_(),
                 spark_fn=lambda *cols: F.least(*cols),
                 py_fn=lambda *vals: min(vals))
ifnull = Function("ifnull", _JSON, spark_fn=lambda a, b: F.coalesce(a, b),
                  py_fn=lambda a, b: a if a is not None else b)
md5_hex = Function("md5_hex", _STR, spark_fn=lambda c: F.md5(c.cast(T.StringType())),
                   py_fn=lambda v: __import__("hashlib").md5(str(v).encode()).hexdigest())


# uuid extras (reference functions/uuid.py: uuid7:30, to_string:40, hex:64)
def _uuid7_py() -> str:
    """RFC 9562 UUIDv7 (time-ordered): 48-bit unix-ms + random — stdlib
    construction (python's uuid.uuid7 lands in 3.14; reference requires it)."""
    import os
    import time
    ms = time.time_ns() // 1_000_000
    rand = os.urandom(10)
    b = ms.to_bytes(6, "big") + rand
    b = bytearray(b)
    b[6] = (b[6] & 0x0F) | 0x70  # version 7
    b[8] = (b[8] & 0x3F) | 0x80  # RFC variant
    return str(_uuid.UUID(bytes=bytes(b)))


uuid7 = Function("uuid7", ColumnType.uuid(), spark_fn=None,
                 py_fn=lambda: _uuid7_py())
to_string = Function("to_string", _STR,
                     spark_fn=lambda u: u.cast(T.StringType()),
                     py_fn=lambda u: str(_uuid.UUID(str(u))))
hex = Function("hex", _STR,  # noqa: A001
               spark_fn=lambda u: F.lower(F.regexp_replace(
                   u.cast(T.StringType()), "-", "")),
               py_fn=lambda u: _uuid.UUID(str(u)).hex)


# net extras (reference functions/net.py presigned_url)
def presigned_url(path: str, expiration_secs: int = 3600) -> str:
    """Presigned GET URL for an s3:// object (reference functions/net.py
    presigned_url). Requires configured AWS credentials; local paths pass
    through unchanged (the reference's non-S3 behavior)."""
    if not str(path).startswith("s3://"):
        return path
    from ._provider_util import have_package
    if not have_package("boto3"):
        raise NotImplementedError("presigned_url for s3:// requires boto3")
    import boto3
    session = boto3.session.Session()
    if session.get_credentials() is None:
        raise NotImplementedError(
            "presigned_url requires configured AWS credentials")
    bucket, _, key = str(path)[5:].partition("/")
    return session.client("s3").generate_presigned_url(
        "get_object", Params={"Bucket": bucket, "Key": key},
        ExpiresIn=expiration_secs)


# util extras (reference functions/util.py get_metadata,
# normalize_image_mode, resolve_torch_device)
def get_media_metadata(payload: bytes) -> dict:
    """Dispatch metadata across every stdlib codec: image (PNG/JPEG/GIF/
    BMP/PPM), WAV audio, AVI video, PDF — the analog of the reference's
    container probe (functions/util.py get_metadata)."""
    from .audio_codec import probe as audio_probe
    from .image_codec import probe as image_probe
    from .pdf_codec import probe as pdf_probe
    from .video_codec import probe as video_probe
    for probe in (image_probe, video_probe, audio_probe, pdf_probe):
        try:
            info = probe(payload)
        except Exception:  # noqa: BLE001
            info = None
        if info is not None:
            info["n_bytes"] = len(payload)
            return info
    return {"format": None, "n_bytes": len(payload) if payload else None}


def normalize_image_mode(img):
    """L/LA/palette → RGB(A) canonicalization (reference functions/util.py
    normalize_image_mode) for either PIL images or MiniImage."""
    if img.mode in ("RGB", "RGBA"):
        return img
    return img.convert("RGBA" if img.mode == "LA" else "RGB")


def resolve_torch_device(device: str = "auto") -> str:
    """'auto' → cuda/mps when available, else cpu (reference
    functions/util.py resolve_torch_device)."""
    if device != "auto":
        return device
    from ._provider_util import have_package
    if have_package("torch"):
        import torch
        if torch.cuda.is_available():
            return "cuda"
        if getattr(torch.backends, "mps", None) and torch.backends.mps.is_available():
            return "mps"
    return "cpu"

"""Twelve Labs provider functions (reference functions/twelvelabs.py:
embed:71 with text/image/audio/video overloads).

Text embedding works offline (deterministic fake); image/audio/video
inputs need media codecs absent from this container.
"""

from __future__ import annotations

from typing import Any, Optional

from ..type_system import ArrayType, ColumnType
from ._provider_util import ClientCache, fake_unit_vector, offline_rpm
from .udf import async_udf

_RPM = offline_rpm("twelvelabs")


def _make_client() -> Any:
    import twelvelabs
    return twelvelabs.AsyncTwelveLabs()


_cache = ClientCache("twelvelabs", _make_client)


@async_udf(return_type=ArrayType(ColumnType.float_()),
           requests_per_minute=_RPM, concurrency=16)
async def embed(text: str, *, model_name: str) -> list:
    """Text embedding — the Twelve Labs `embed` endpoint
    (reference functions/twelvelabs.py:71; the image/video overloads need
    media support absent here)."""
    client = _cache.get()
    if client is not None:
        res = await client.embed.create(model_name=model_name, text=text)
        return list(res.text_embedding.segments[0].float_)
    return fake_unit_vector(f"{model_name}|{text}", 16)


@async_udf(return_type=ArrayType(ColumnType.float_()),
           requests_per_minute=_RPM, concurrency=8)
async def embed_image(image: bytes, *, model_name: str) -> list:
    """Image embedding (reference functions/twelvelabs.py:135) — real
    client when the SDK is importable; offline, a deterministic unit
    vector seeded by the ACTUAL image content (probed via the in-repo
    codec so non-images raise like the real endpoint would)."""
    client = _cache.get()
    if client is not None:
        res = await client.embed.create(model_name=model_name,
                                        image_file=bytes(image))
        return list(res.image_embedding.segments[0].embeddings_float)
    from .image_codec import probe
    if probe(bytes(image)) is None:
        raise ValueError("embed_image: payload is not a decodable image")
    from ._provider_util import digest, fake_unit_vector
    return fake_unit_vector(
        digest("twelvelabs-img", model_name, bytes(image).hex()[:128]), 16)

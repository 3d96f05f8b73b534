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


def embed_image(*args: Any, **kwargs: Any):
    """Image embedding overload (reference functions/twelvelabs.py:135) —
    needs image codecs absent from this container."""
    raise NotImplementedError(
        "twelvelabs image/video embedding requires media support (no codec "
        "in this environment); text embed is fully functional")

"""Microsoft Fabric AI provider functions (reference functions/fabric.py:
chat_completions:73, embeddings:188). Fabric hosts OpenAI models behind a
workspace endpoint; offline, deterministic OpenAI-shaped fakes.
"""

from __future__ import annotations

import os
from typing import Any, Optional

from ..type_system import ArrayType, ColumnType
from ._provider_util import ClientCache, fake_openai_chat, fake_unit_vector, norm_messages
from .udf import async_udf

_RPM = 600.0 if os.environ.get("FABRIC_ENDPOINT") else 1e12


def _make_client() -> Any:
    endpoint = os.environ.get("FABRIC_ENDPOINT")
    if not endpoint:
        return None
    import openai
    return openai.AsyncOpenAI(base_url=endpoint)


_cache = ClientCache("openai", _make_client)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def chat_completions(messages: list, *, model: str,
                           model_kwargs: Optional[dict] = None) -> dict:
    """Chat completion via a Fabric-hosted model
    (reference functions/fabric.py:73)."""
    messages = norm_messages(messages)
    client = _cache.get()
    if client is not None:
        resp = await client.chat.completions.create(
            messages=messages, model=model, **(model_kwargs or {}))
        return resp.model_dump()
    return fake_openai_chat(model, messages)


@async_udf(return_type=ArrayType(ColumnType.float_()),
           requests_per_minute=_RPM, concurrency=32)
async def embeddings(input: str, *, model: str,
                     model_kwargs: Optional[dict] = None) -> list:
    """Embedding via a Fabric-hosted model
    (reference functions/fabric.py:188)."""
    client = _cache.get()
    if client is not None:
        resp = await client.embeddings.create(
            input=input, model=model, **(model_kwargs or {}))
        return list(resp.data[0].embedding)
    dim = int((model_kwargs or {}).get("dimensions", 16))
    return fake_unit_vector(f"{model}|{input}", dim)

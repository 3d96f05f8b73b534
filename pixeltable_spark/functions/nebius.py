"""Nebius AI Studio provider functions (reference functions/nebius.py:
chat_completions:40, embeddings:159). OpenAI wire protocol against
api.studio.nebius.com; offline, deterministic fakes.
"""

from __future__ import annotations

from typing import Any, Optional

from ..type_system import ArrayType, ColumnType
from ._provider_util import ClientCache, fake_openai_chat, fake_unit_vector, norm_messages, offline_rpm
from .udf import async_udf

_RPM = offline_rpm("openai")


def _make_client() -> Any:
    import openai
    return openai.AsyncOpenAI(base_url="https://api.studio.nebius.com/v1")


_cache = ClientCache("openai", _make_client)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def chat_completions(messages: list, *, model: str,
                           model_kwargs: Optional[dict] = None,
                           tools: Optional[list] = None,
                           tool_choice: Optional[dict] = None) -> dict:
    """Chat completion — the Nebius `chat/completions` endpoint
    (reference functions/nebius.py:40)."""
    messages = norm_messages(messages)
    client = _cache.get()
    if client is not None:
        kw: dict[str, Any] = dict(model_kwargs or {})
        if tools is not None:
            kw["tools"] = tools
        if tool_choice is not None:
            kw["tool_choice"] = tool_choice
        resp = await client.chat.completions.create(
            messages=messages, model=model, **kw)
        return resp.model_dump()
    return fake_openai_chat(model, messages)


@async_udf(return_type=ArrayType(ColumnType.float_()),
           requests_per_minute=_RPM, concurrency=32)
async def embeddings(input: str, *, model: str,
                     model_kwargs: Optional[dict] = None) -> list:
    """Embedding — the Nebius `embeddings` endpoint
    (reference functions/nebius.py:159)."""
    client = _cache.get()
    if client is not None:
        resp = await client.embeddings.create(
            input=input, model=model, **(model_kwargs or {}))
        return list(resp.data[0].embedding)
    dim = int((model_kwargs or {}).get("dimensions", 16))
    return fake_unit_vector(f"{model}|{input}", dim)

"""Mistral AI provider functions (reference functions/mistralai.py:
chat_completions:35, fim_completions:83, embeddings:129). Offline,
deterministic OpenAI-shaped fakes.
"""

from __future__ import annotations

from typing import Any, Optional

from ..type_system import ArrayType, ColumnType
from ._provider_util import ClientCache, digest, fake_openai_chat, fake_unit_vector, norm_messages, offline_rpm, token_words
from .udf import async_udf

_RPM = offline_rpm("mistralai")


def _make_client() -> Any:
    from mistralai import Mistral
    import os
    return Mistral(api_key=os.environ.get("MISTRAL_API_KEY", ""))


_cache = ClientCache("mistralai", _make_client)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def chat_completions(messages: list, *, model: str,
                           model_kwargs: Optional[dict] = None) -> dict:
    """Chat completion — the Mistral `chat/completions` endpoint
    (reference functions/mistralai.py:35)."""
    messages = norm_messages(messages)
    client = _cache.get()
    if client is not None:
        resp = await client.chat.complete_async(
            messages=messages, model=model, **(model_kwargs or {}))
        return resp.model_dump()
    return fake_openai_chat(model, messages)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def fim_completions(prompt: str, *, model: str,
                          model_kwargs: Optional[dict] = None) -> dict:
    """Fill-in-the-middle completion — the Mistral `fim/completions`
    endpoint (reference functions/mistralai.py:83)."""
    client = _cache.get()
    if client is not None:
        resp = await client.fim.complete_async(
            prompt=prompt, model=model, **(model_kwargs or {}))
        return resp.model_dump()
    h = digest(model, prompt, "fim")
    return {
        "id": f"fim-{h[:24]}",
        "object": "chat.completion",
        "model": model,
        "choices": [{"index": 0, "finish_reason": "stop",
                     "message": {"role": "assistant",
                                 "content": f"fill[{h[:12]}]"}}],
        "usage": {"prompt_tokens": len(token_words(prompt)),
                  "completion_tokens": 1,
                  "total_tokens": len(token_words(prompt)) + 1},
    }


@async_udf(return_type=ArrayType(ColumnType.float_()),
           requests_per_minute=_RPM, concurrency=32)
async def embeddings(input: str, *, model: str) -> list:
    """Embedding — the Mistral `embeddings` endpoint
    (reference functions/mistralai.py:129)."""
    client = _cache.get()
    if client is not None:
        resp = await client.embeddings.create_async(inputs=[input], model=model)
        return list(resp.data[0].embedding)
    return fake_unit_vector(f"{model}|{input}", 16)

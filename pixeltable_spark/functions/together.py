"""Together AI provider functions (reference functions/together.py:
completions:40, chat_completions:80, embeddings:135,
image_generations:181). Offline, deterministic OpenAI-shaped fakes.
"""

from __future__ import annotations

from typing import Any, Optional

from ..type_system import ArrayType, ColumnType
from ._provider_util import ClientCache, digest, fake_openai_chat, fake_unit_vector, norm_messages, offline_rpm, token_words
from .udf import async_udf

_RPM = offline_rpm("together")


def _make_client() -> Any:
    import together
    return together.AsyncTogether()


_cache = ClientCache("together", _make_client)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def completions(prompt: str, *, model: str,
                      model_kwargs: Optional[dict] = None) -> dict:
    """Text completion — the Together `completions` endpoint
    (reference functions/together.py:40)."""
    client = _cache.get()
    if client is not None:
        resp = await client.completions.create(
            prompt=prompt, model=model, **(model_kwargs or {}))
        return resp.model_dump()
    h = digest(model, prompt)
    return {
        "id": f"cmpl-{h[:24]}",
        "object": "text.completion",
        "model": model,
        "choices": [{"index": 0, "finish_reason": "stop",
                     "text": f"response[{h[:12]}]"}],
        "usage": {"prompt_tokens": len(token_words(prompt)),
                  "completion_tokens": 1,
                  "total_tokens": len(token_words(prompt)) + 1},
    }


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def chat_completions(messages: list, *, model: str,
                           model_kwargs: Optional[dict] = None) -> dict:
    """Chat completion — the Together `chat/completions` endpoint
    (reference functions/together.py:80)."""
    messages = norm_messages(messages)
    client = _cache.get()
    if client is not None:
        resp = await client.chat.completions.create(
            messages=messages, model=model, **(model_kwargs or {}))
        return resp.model_dump()
    return fake_openai_chat(model, messages)


@async_udf(return_type=ArrayType(ColumnType.float_()),
           requests_per_minute=_RPM, concurrency=32)
async def embeddings(input: str, *, model: str) -> list:
    """Embedding — the Together `embeddings` endpoint
    (reference functions/together.py:135)."""
    client = _cache.get()
    if client is not None:
        resp = await client.embeddings.create(input=input, model=model)
        return list(resp.data[0].embedding)
    return fake_unit_vector(f"{model}|{input}", 16)


def image_generations(*args: Any, **kwargs: Any):
    """Image generation (reference functions/together.py:181) — needs image
    codecs absent from this container."""
    raise NotImplementedError(
        "together.image_generations requires image support (no codec in "
        "this environment); completions/chat/embeddings are functional")

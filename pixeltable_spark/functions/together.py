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


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM,
           concurrency=4)
async def image_generations(prompt: str, *, model: str,
                            model_kwargs: Optional[dict] = None) -> dict:
    """Image generation (reference functions/together.py:181) — real
    client when the SDK is importable; offline, a deterministic
    procedural image (REAL decodable PNG) in the API's b64 shape."""
    import base64
    client = _cache.get()
    if client is not None:
        res = await client.images.generate(
            prompt=prompt, model=model, response_format="b64_json",
            **(model_kwargs or {}))
        return {"data": [{"b64_json": d.b64_json} for d in res.data]}
    from ._provider_util import digest, procedural_image
    img = procedural_image(digest("together-img", model, prompt), 96, 96)
    return {"data": [{"b64_json": base64.b64encode(img).decode()}],
            "model": model}

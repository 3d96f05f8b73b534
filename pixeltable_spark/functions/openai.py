"""OpenAI provider functions with the reference's public signatures
(reference functions/openai.py: chat_completions:542, embeddings:862,
speech:243, transcriptions:377, moderations:1316, image_generations:1020).

All calls route through the async rate-limited runtime
(functions/llm.py run_async_batch / RateLimiter / retries): one event loop
per worker batch, a shared token bucket per function pool, bounded
in-flight requests, exponential backoff on RetryableError.

When the ``openai`` library is installed the real AsyncOpenAI client is
used; otherwise every function falls back to a deterministic md5-derived
response with the SAME shape as the real API payload, so pipelines (and
the DuckDB oracle) run offline and reproducibly.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Optional

from ..type_system import ArrayType, ColumnType
from .udf import async_udf

_client_singleton: Any = None
_HAVE_OPENAI: Optional[bool] = None

try:  # resolved at import: rate limits only apply to a REAL endpoint —
    import openai as _openai_lib  # noqa: F401 — the offline fake is local math
    _RPM_CHAT, _RPM_EMBED = 600.0, 3000.0
except ImportError:
    _RPM_CHAT = _RPM_EMBED = 1e12


def _openai_client() -> Any:
    """Cached AsyncOpenAI client, or None when the library is absent
    (reference functions/openai.py:77 _openai_client)."""
    global _client_singleton, _HAVE_OPENAI
    if _HAVE_OPENAI is None:
        try:
            import openai  # noqa: F401
            _HAVE_OPENAI = True
        except ImportError:
            _HAVE_OPENAI = False
    if _HAVE_OPENAI and _client_singleton is None:
        import openai
        _client_singleton = openai.AsyncOpenAI()
    return _client_singleton


def _digest(*parts: Any) -> str:
    return hashlib.md5("|".join(
        p if isinstance(p, str) else json.dumps(p, sort_keys=True, default=str)
        for p in parts).encode()).hexdigest()


def _norm_messages(messages: Any) -> list:
    if isinstance(messages, str):
        try:
            parsed = json.loads(messages)
            return parsed if isinstance(parsed, list) else [
                {"role": "user", "content": messages}]
        except (ValueError, TypeError):
            return [{"role": "user", "content": messages}]
    return messages


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM_CHAT, concurrency=16)
async def chat_completions(messages: list, *, model: str,
                           model_kwargs: Optional[dict] = None,
                           tools: Optional[list] = None,
                           tool_choice: Optional[dict] = None) -> dict:
    """Chat completion — the OpenAI `chat/completions` endpoint
    (reference functions/openai.py:542). Returns the full response dict."""
    messages = _norm_messages(messages)
    client = _openai_client()
    if client is not None:
        kw: dict[str, Any] = dict(model_kwargs or {})
        if tools is not None:
            kw["tools"] = tools
        if tool_choice is not None:
            kw["tool_choice"] = tool_choice
        resp = await client.chat.completions.create(
            messages=messages, model=model, **kw)
        return resp.model_dump()
    h = _digest(model, messages)
    n_in = sum(len(str(m.get("content", "")).split()) for m in messages)
    return {
        "id": f"chatcmpl-{h[:24]}",
        "object": "chat.completion",
        "model": model,
        "choices": [{
            "index": 0,
            "finish_reason": "stop",
            "message": {"role": "assistant", "content": f"response[{h[:12]}]"},
        }],
        "usage": {"prompt_tokens": n_in, "completion_tokens": 1,
                  "total_tokens": n_in + 1},
    }


@async_udf(return_type=ArrayType(ColumnType.float_()),
           requests_per_minute=_RPM_EMBED, concurrency=32)
async def embeddings(input: str, *, model: str,
                     model_kwargs: Optional[dict] = None) -> list:
    """Embedding vector for the input text — the OpenAI `embeddings`
    endpoint (reference functions/openai.py:862)."""
    client = _openai_client()
    if client is not None:
        resp = await client.embeddings.create(
            input=input, model=model, **(model_kwargs or {}))
        return list(resp.data[0].embedding)
    from .llm import DeterministicFakeClient
    dim = int((model_kwargs or {}).get("dimensions", 16))
    return await DeterministicFakeClient().embed(input, model, dim=dim)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM_CHAT, concurrency=8)
async def moderations(input: str, *, model: str = "omni-moderation-latest") -> dict:
    """Content moderation (reference functions/openai.py:1316)."""
    client = _openai_client()
    if client is not None:
        resp = await client.moderations.create(input=input, model=model)
        return resp.model_dump()
    h = _digest(model, input)
    flagged = int(h[0], 16) == 0  # deterministic ~6% flag rate
    return {"id": f"modr-{h[:24]}", "model": model,
            "results": [{"flagged": flagged, "categories": {},
                         "category_scores": {}}]}


def speech(*args: Any, **kwargs: Any):
    """Text-to-speech (reference functions/openai.py:243) — needs audio
    codecs absent from this container."""
    raise NotImplementedError(
        "openai.speech requires audio output support (no codec in this "
        "environment); the chat/embedding surface is fully functional")


def transcriptions(*args: Any, **kwargs: Any):
    """Speech-to-text (reference functions/openai.py:377) — needs audio
    codecs absent from this container."""
    raise NotImplementedError(
        "openai.transcriptions requires audio decode support (no codec in "
        "this environment)")


def image_generations(*args: Any, **kwargs: Any):
    """Image generation (reference functions/openai.py:1020) — needs image
    codecs absent from this container."""
    raise NotImplementedError(
        "openai.image_generations requires image support (no codec in this "
        "environment)")

"""OpenRouter provider functions (reference functions/openrouter.py:
chat_completions:39). OpenRouter speaks the OpenAI wire protocol via an
AsyncOpenAI client pointed at openrouter.ai; offline, a deterministic
OpenAI-shaped fake is returned.
"""

from __future__ import annotations

from typing import Any, Optional

from ..type_system import ColumnType
from ._provider_util import ClientCache, fake_openai_chat, norm_messages, offline_rpm
from .udf import async_udf

_RPM = offline_rpm("openai")


def _make_client() -> Any:
    import openai
    return openai.AsyncOpenAI(base_url="https://openrouter.ai/api/v1")


_cache = ClientCache("openai", _make_client)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def chat_completions(messages: list, *, model: str,
                           model_kwargs: Optional[dict] = None,
                           tools: Optional[list] = None,
                           tool_choice: Optional[dict] = None,
                           extra_headers: Optional[dict] = None) -> dict:
    """Chat completion — the OpenRouter `chat/completions` endpoint
    (reference functions/openrouter.py:39). extra_headers carries the
    optional HTTP-Referer / X-Title attribution headers."""
    messages = norm_messages(messages)
    client = _cache.get()
    if client is not None:
        kw: dict[str, Any] = dict(model_kwargs or {})
        if tools is not None:
            kw["tools"] = tools
        if tool_choice is not None:
            kw["tool_choice"] = tool_choice
        if extra_headers is not None:
            kw["extra_headers"] = extra_headers
        resp = await client.chat.completions.create(
            messages=messages, model=model, **kw)
        return resp.model_dump()
    return fake_openai_chat(model, messages)

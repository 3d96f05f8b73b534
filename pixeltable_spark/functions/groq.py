"""Groq provider functions (reference functions/groq.py:
chat_completions:34, invoke_tools:102). OpenAI-compatible response shape;
offline, a deterministic fake is returned.
"""

from __future__ import annotations

from typing import Any, Optional

from ..type_system import ColumnType
from ._provider_util import ClientCache, fake_openai_chat, norm_messages, offline_rpm
from .udf import async_udf

_RPM = offline_rpm("groq")


def _make_client() -> Any:
    import groq
    return groq.AsyncGroq()


_cache = ClientCache("groq", _make_client)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def chat_completions(messages: list, *, model: str,
                           model_kwargs: Optional[dict] = None,
                           tools: Optional[list] = None,
                           tool_choice: Optional[dict] = None) -> dict:
    """Chat completion — the Groq `chat/completions` endpoint
    (reference functions/groq.py:34)."""
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


def invoke_tools(tools: list, response: Any) -> list:
    """Execute the tool calls in an OpenAI-shaped Groq response
    (reference functions/groq.py:102 invoke_tools)."""
    import json as _json
    from .query_template import invoke_tools as _invoke
    if isinstance(response, str):
        response = _json.loads(response)
    calls = []
    for choice in (response or {}).get("choices", []):
        for tc in (choice.get("message") or {}).get("tool_calls") or []:
            calls.append(tc)
    return _invoke(tools, {"tool_calls": calls})

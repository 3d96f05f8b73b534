"""Anthropic provider functions with the reference's public signatures
(reference functions/anthropic.py: messages:147, invoke_tools:267).

Routed through the async rate-limited runtime (functions/llm.py); when the
``anthropic`` library is installed the real AsyncAnthropic client is used,
otherwise a deterministic md5-derived response with the real API's payload
shape is returned (offline + oracle-reproducible).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Optional

from ..type_system import ColumnType
from .udf import async_udf

_client_singleton: Any = None
_HAVE_ANTHROPIC: Optional[bool] = None

try:  # rate limits only apply to a REAL endpoint; the offline fake is local
    import anthropic as _anthropic_lib  # noqa: F401
    _RPM = 600.0
except ImportError:
    _RPM = 1e12


def _anthropic_client() -> Any:
    """Cached AsyncAnthropic client, or None when the library is absent
    (reference functions/anthropic.py:39 _anthropic_client)."""
    global _client_singleton, _HAVE_ANTHROPIC
    if _HAVE_ANTHROPIC is None:
        try:
            import anthropic  # noqa: F401
            _HAVE_ANTHROPIC = True
        except ImportError:
            _HAVE_ANTHROPIC = False
    if _HAVE_ANTHROPIC and _client_singleton is None:
        import anthropic
        _client_singleton = anthropic.AsyncAnthropic()
    return _client_singleton


def _digest(*parts: Any) -> str:
    return hashlib.md5("|".join(
        p if isinstance(p, str) else json.dumps(p, sort_keys=True, default=str)
        for p in parts).encode()).hexdigest()


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def messages(messages: list, *, model: str, max_tokens: int = 1024,
                   model_kwargs: Optional[dict] = None,
                   tools: Optional[list] = None,
                   tool_choice: Optional[dict] = None) -> dict:
    """Create a Message — the Anthropic `messages` endpoint
    (reference functions/anthropic.py:147). Returns the response dict."""
    if isinstance(messages, str):
        try:
            parsed = json.loads(messages)
            messages = parsed if isinstance(parsed, list) else [
                {"role": "user", "content": messages}]
        except (ValueError, TypeError):
            messages = [{"role": "user", "content": messages}]
    client = _anthropic_client()
    if client is not None:
        kw: dict[str, Any] = dict(model_kwargs or {})
        if tools is not None:
            kw["tools"] = tools
        if tool_choice is not None:
            kw["tool_choice"] = tool_choice
        resp = await client.messages.create(
            messages=messages, model=model, max_tokens=max_tokens, **kw)
        return resp.model_dump()
    h = _digest(model, messages)
    n_in = sum(len(str(m.get("content", "")).split()) for m in messages)
    return {
        "id": f"msg_{h[:24]}",
        "type": "message",
        "role": "assistant",
        "model": model,
        "content": [{"type": "text", "text": f"response[{h[:12]}]"}],
        "stop_reason": "end_turn",
        "stop_sequence": None,
        "usage": {"input_tokens": n_in, "output_tokens": 1},
    }


def _anthropic_response_to_tool_calls(response):
    """Anthropic tool_use content blocks → the generic {'tool_calls': ...}
    shape the shared executor runs (reference functions/anthropic.py:273
    _anthropic_response_to_pxt_tool_calls)."""
    import json as _json
    if isinstance(response, str):
        try:
            response = _json.loads(response)
        except (ValueError, TypeError):
            return {"tool_calls": []}
    calls = [{"name": blk.get("name"), "arguments": blk.get("input", {})}
             for blk in (response or {}).get("content", [])
             if isinstance(blk, dict) and blk.get("type") == "tool_use"]
    return {"tool_calls": calls}


def invoke_tools(tools: list, response: Any) -> list:
    """Execute the tool calls named in a messages() response
    (reference functions/anthropic.py:267 invoke_tools)."""
    from .query_template import invoke_tools as _invoke
    return _invoke(tools, _anthropic_response_to_tool_calls(response))

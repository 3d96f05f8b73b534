"""Fireworks AI provider functions (reference functions/fireworks.py:
chat_completions:32). OpenAI-compatible response shape; offline, a
deterministic fake is returned.
"""

from __future__ import annotations

from typing import Any, Optional

from ..type_system import ColumnType
from ._provider_util import ClientCache, fake_openai_chat, norm_messages, offline_rpm
from .udf import async_udf

_RPM = offline_rpm("fireworks")


def _make_client() -> Any:
    from fireworks import client as fw_client
    return fw_client.Fireworks()


_cache = ClientCache("fireworks", _make_client)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def chat_completions(messages: list, *, model: str,
                           model_kwargs: Optional[dict] = None) -> dict:
    """Chat completion — the Fireworks `chat/completions` endpoint
    (reference functions/fireworks.py:32)."""
    messages = norm_messages(messages)
    client = _cache.get()
    if client is not None:
        import asyncio
        resp = await asyncio.to_thread(
            client.chat.completions.create,
            messages=messages, model=model, **(model_kwargs or {}))
        return resp.dict()
    return fake_openai_chat(model, messages)

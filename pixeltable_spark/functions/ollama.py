"""Ollama provider functions with the reference's public signatures
(reference functions/ollama.py: generate:37, chat:84, embed:113).

Routed through the async rate-limited runtime (functions/llm.py); when the
``ollama`` library is installed a real client is used (host from
OLLAMA_HOST, matching reference functions/ollama.py:23), otherwise a
deterministic md5-derived response with the real API's payload shape is
returned. Ollama is a LOCAL inference server, so the fake carries no
simulated rate limit either way.
"""

from __future__ import annotations

import asyncio
from typing import Any, Optional

from ..type_system import ArrayType, ColumnType
from ._provider_util import ClientCache, digest, fake_unit_vector, norm_messages, token_words
from .udf import async_udf


def _make_client() -> Any:
    import ollama
    return ollama.Client()


_cache = ClientCache("ollama", _make_client)


def _ollama_client() -> Any:
    """Cached ollama.Client, or None when the library is absent
    (reference functions/ollama.py:29 _ollama_client)."""
    return _cache.get()


@async_udf(return_type=ColumnType.json(), requests_per_minute=1e12, concurrency=8)
async def generate(prompt: str, *, model: str, suffix: str = "",
                   system: str = "", template: str = "",
                   context: Optional[list] = None, raw: bool = False,
                   format: Optional[str] = None,
                   options: Optional[dict] = None) -> dict:
    """Generate a response for a prompt
    (reference functions/ollama.py:37 generate)."""
    client = _ollama_client()
    if client is not None:
        resp = await asyncio.to_thread(
            client.generate, model=model, prompt=prompt, suffix=suffix,
            system=system, template=template, context=context, raw=raw,
            format=format, options=options)
        return dict(resp)
    h = digest(model, prompt, system, suffix)
    return {
        "model": model,
        "response": f"response[{h[:12]}]",
        "done": True,
        "done_reason": "stop",
        "context": context or [],
        "prompt_eval_count": len(token_words(prompt)),
        "eval_count": 1,
    }


@async_udf(return_type=ColumnType.json(), requests_per_minute=1e12, concurrency=8)
async def chat(messages: list, *, model: str, tools: Optional[list] = None,
               format: Optional[str] = None,
               options: Optional[dict] = None) -> dict:
    """Generate the next message in a chat
    (reference functions/ollama.py:84 chat)."""
    messages = norm_messages(messages)
    client = _ollama_client()
    if client is not None:
        resp = await asyncio.to_thread(
            client.chat, model=model, messages=messages, tools=tools,
            format=format, options=options)
        return dict(resp)
    h = digest(model, messages)
    n_in = sum(len(token_words(str(m.get("content", "")))) for m in messages)
    msg: dict[str, Any] = {"role": "assistant",
                           "content": f"response[{h[:12]}]"}
    if tools:
        fn = tools[int(h[0], 16) % len(tools)]
        name = fn.get("function", {}).get("name", fn.get("name", "tool"))
        msg = {"role": "assistant", "content": "",
               "tool_calls": [{"function": {"name": name, "arguments": {}}}]}
    return {
        "model": model,
        "message": msg,
        "done": True,
        "done_reason": "stop",
        "prompt_eval_count": n_in,
        "eval_count": 1,
    }


@async_udf(return_type=ArrayType(ColumnType.float_()),
           requests_per_minute=1e12, concurrency=16)
async def embed(input: str, *, model: str, truncate: bool = True,
                options: Optional[dict] = None) -> list:
    """Generate an embedding (reference functions/ollama.py:113 embed)."""
    client = _ollama_client()
    if client is not None:
        resp = await asyncio.to_thread(
            client.embed, model=model, input=input, truncate=truncate,
            options=options)
        return list(dict(resp)["embeddings"][0])
    return fake_unit_vector(f"{model}|{input}", 16)

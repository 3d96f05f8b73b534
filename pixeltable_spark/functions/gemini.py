"""Google Gemini provider functions with the reference's public signatures
(reference functions/gemini.py: generate_content:96, embed_content:723,
invoke_tools:233, generate_images:258, generate_videos:364,
generate_speech:495, transcribe:643).

Routed through the async rate-limited runtime (functions/llm.py); when the
``google-genai`` library is installed the real async client is used,
otherwise a deterministic md5-derived response with the real API's payload
shape is returned (offline + oracle-reproducible).
"""

from __future__ import annotations

from typing import Any, Optional

from ..type_system import ArrayType, ColumnType
from ._provider_util import ClientCache, digest, fake_unit_vector, offline_rpm, token_words
from .udf import async_udf

_RPM = offline_rpm("google.genai")


def _make_client() -> Any:
    from google import genai
    return genai.Client()


_cache = ClientCache("google.genai", _make_client)


def _genai_client() -> Any:
    """Cached genai.Client, or None when the library is absent
    (reference functions/gemini.py:75 _genai_client)."""
    return _cache.get()


def _convert_pxt_tool(tool: dict) -> dict:
    """Pixeltable tool spec → Gemini function declaration
    (reference functions/gemini.py:221 __convert_pxt_tool)."""
    return {
        "name": tool["name"],
        "description": tool.get("description", ""),
        "parameters": tool.get("parameters", {}),
    }


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def generate_content(contents: Any, *, model: str,
                           config: Optional[dict] = None,
                           tools: Optional[list] = None) -> dict:
    """Generate content from the specified model
    (reference functions/gemini.py:96 generate_content).
    Returns the response dict (candidates / usage_metadata shape)."""
    client = _genai_client()
    if client is not None:
        from google.genai import types
        config_ = None
        if config is not None or tools is not None:
            config_ = types.GenerateContentConfig(**(config or {}))
            if tools is not None:
                config_.tools = [types.Tool(
                    function_declarations=[_convert_pxt_tool(t) for t in tools])]
        resp = await client.aio.models.generate_content(
            model=model, contents=contents, config=config_)
        return resp.model_dump()
    h = digest(model, contents, config)
    n_in = len(token_words(contents if isinstance(contents, str)
                           else str(contents)))
    parts: list[dict] = [{"text": f"response[{h[:12]}]"}]
    if tools:
        # deterministic tool-call response: pick the tool by hash
        tool = tools[int(h[0], 16) % len(tools)]
        parts = [{"function_call": {"name": tool["name"], "args": {}}}]
    return {
        "candidates": [{
            "content": {"role": "model", "parts": parts},
            "finish_reason": "STOP",
            "index": 0,
        }],
        "model_version": model,
        "usage_metadata": {"prompt_token_count": n_in,
                           "candidates_token_count": 1,
                           "total_token_count": n_in + 1},
    }


@async_udf(return_type=ArrayType(ColumnType.float_()),
           requests_per_minute=_RPM, concurrency=32)
async def embed_content(content: str, *, model: str,
                        config: Optional[dict] = None) -> list:
    """Embedding vector for the content
    (reference functions/gemini.py:723 embed_content)."""
    client = _genai_client()
    if client is not None:
        from google.genai import types
        cfg = types.EmbedContentConfig(**(config or {})) if config else None
        resp = await client.aio.models.embed_content(
            model=model, contents=content, config=cfg)
        return list(resp.embeddings[0].values)
    dim = int((config or {}).get("output_dimensionality", 16))
    return fake_unit_vector(f"{model}|{content}", dim)


def _gemini_response_to_tool_calls(response: Any) -> dict:
    """Gemini response → OpenAI-style {'tool_calls': [...]} so the shared
    invoke_tools executor can run it
    (reference functions/gemini.py:239 _gemini_response_to_pxt_tool_calls)."""
    import json as _json
    if isinstance(response, str):
        try:
            response = _json.loads(response)
        except (ValueError, TypeError):
            return {"tool_calls": []}
    calls = []
    for cand in (response or {}).get("candidates", []):
        for part in (cand.get("content") or {}).get("parts", []):
            fc = part.get("function_call")
            if fc:
                calls.append({"name": fc["name"],
                              "arguments": fc.get("args", {})})
    return {"tool_calls": calls}


def invoke_tools(tools: list, response: Any) -> list:
    """Execute the tool calls named in a generate_content response
    (reference functions/gemini.py:233 invoke_tools)."""
    from .query_template import invoke_tools as _invoke
    return _invoke(tools, _gemini_response_to_tool_calls(response))


def generate_images(*args: Any, **kwargs: Any):
    """Image generation (reference functions/gemini.py:258) — needs image
    codecs absent from this container."""
    raise NotImplementedError(
        "gemini.generate_images requires image support (no codec in this "
        "environment); generate_content/embed_content are fully functional")


def generate_videos(*args: Any, **kwargs: Any):
    """Video generation (reference functions/gemini.py:364) — needs video
    codecs absent from this container."""
    raise NotImplementedError(
        "gemini.generate_videos requires video support (no codec in this "
        "environment)")


def generate_speech(*args: Any, **kwargs: Any):
    """Text-to-speech (reference functions/gemini.py:495) — needs audio
    codecs absent from this container."""
    raise NotImplementedError(
        "gemini.generate_speech requires audio support (no codec in this "
        "environment)")


def transcribe(*args: Any, **kwargs: Any):
    """Audio transcription (reference functions/gemini.py:643) — needs audio
    decode support absent from this container."""
    raise NotImplementedError(
        "gemini.transcribe requires audio decode support (no codec in this "
        "environment)")

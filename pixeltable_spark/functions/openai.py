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


@async_udf(return_type=ColumnType.audio(), requests_per_minute=_RPM_CHAT,
           concurrency=4)
async def speech(input: str, *, model: str, voice: str,
                 model_kwargs: Optional[dict] = None) -> bytes:
    """Text-to-speech (reference functions/openai.py:243) — real client
    when the openai library is importable, else a deterministic
    synthesized WAV (length scales with the text) from the in-repo
    codec."""
    client = _openai_client()
    if client is not None:
        resp = await client.audio.speech.create(
            input=input, model=model, voice=voice, **(model_kwargs or {}))
        return resp.content
    from ._provider_util import procedural_wav
    dur = min(8.0, 0.25 + 0.05 * len(input.split()))
    return procedural_wav(_digest("oa-tts", model, voice, input), dur)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM_CHAT,
           concurrency=4)
async def transcriptions(audio: bytes, *, model: str,
                         model_kwargs: Optional[dict] = None) -> dict:
    """Speech-to-text (reference functions/openai.py:377) — real client
    when the openai library is importable; offline, a deterministic
    transcript derived from the REAL decoded audio (duration via the
    in-repo codec)."""
    client = _openai_client()
    if client is not None:
        import io
        f = io.BytesIO(bytes(audio))
        f.name = "audio.wav"
        resp = await client.audio.transcriptions.create(
            file=f, model=model, **(model_kwargs or {}))
        return resp.model_dump()
    from .audio_codec import probe
    info = probe(bytes(audio)) or {}
    h = _digest("oa-stt", model, _digest(bytes(audio).hex()[:128]))
    return {"text": f"transcript[{h[:12]}]",
            "duration": info.get("duration_s"), "language": "en"}


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM_CHAT,
           concurrency=4)
async def translations(audio: bytes, *, model: str,
                       model_kwargs: Optional[dict] = None) -> dict:
    """Speech-to-English-text (reference functions/openai.py:423) — same
    contract as transcriptions."""
    client = _openai_client()
    if client is not None:
        import io
        f = io.BytesIO(bytes(audio))
        f.name = "audio.wav"
        resp = await client.audio.translations.create(
            file=f, model=model, **(model_kwargs or {}))
        return resp.model_dump()
    from .audio_codec import probe
    info = probe(bytes(audio)) or {}
    h = _digest("oa-xlate", model, _digest(bytes(audio).hex()[:128]))
    return {"text": f"translation[{h[:12]}]",
            "duration": info.get("duration_s"), "language": "en"}


@async_udf(return_type=ColumnType.image(), requests_per_minute=_RPM_CHAT,
           concurrency=4)
async def image_generations(prompt: str, *, model: str = "dall-e-2",
                            model_kwargs: Optional[dict] = None) -> bytes:
    """Image generation (reference functions/openai.py:1020) — real client
    when the openai library is importable, else a deterministic procedural
    image from the in-repo codec."""
    import base64
    client = _openai_client()
    if client is not None:
        resp = await client.images.generate(
            prompt=prompt, model=model, response_format="b64_json",
            **(model_kwargs or {}))
        return base64.b64decode(resp.data[0].b64_json)
    from ._provider_util import procedural_image
    return procedural_image(_digest("oa-img", model, prompt), 96, 96)


@async_udf(return_type=ColumnType.image(), requests_per_minute=_RPM_CHAT,
           concurrency=4)
async def image_edits(image: bytes, *, prompt: str, model: str = "dall-e-2",
                      mask: Optional[bytes] = None,
                      model_kwargs: Optional[dict] = None) -> bytes:
    """Prompt-guided image edit (reference functions/openai.py:1085) —
    offline, a deterministic procedural image seeded by (image, prompt)."""
    import base64
    client = _openai_client()
    if client is not None:
        import io
        f = io.BytesIO(bytes(image))
        f.name = "image.png"
        kw: dict = dict(model_kwargs or {})
        if mask is not None:
            m = io.BytesIO(bytes(mask))
            m.name = "mask.png"
            kw["mask"] = m
        resp = await client.images.edit(
            image=f, prompt=prompt, model=model,
            response_format="b64_json", **kw)
        return base64.b64decode(resp.data[0].b64_json)
    from ._provider_util import procedural_image
    return procedural_image(
        _digest("oa-edit", model, prompt, _digest(bytes(image).hex()[:64])),
        96, 96)


@async_udf(return_type=ColumnType.image(), requests_per_minute=_RPM_CHAT,
           concurrency=4)
async def image_variations(image: bytes, *, model: str = "dall-e-2",
                           model_kwargs: Optional[dict] = None) -> bytes:
    """Image variations (reference functions/openai.py:1171) — offline, a
    deterministic procedural image seeded by the input image."""
    import base64
    client = _openai_client()
    if client is not None:
        import io
        f = io.BytesIO(bytes(image))
        f.name = "image.png"
        resp = await client.images.create_variation(
            image=f, model=model, response_format="b64_json",
            **(model_kwargs or {}))
        return base64.b64decode(resp.data[0].b64_json)
    from ._provider_util import procedural_image
    return procedural_image(
        _digest("oa-var", model, _digest(bytes(image).hex()[:64])), 96, 96)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM_CHAT,
           concurrency=16)
async def responses(input: list, *, model: str,
                    model_kwargs: Optional[dict] = None,
                    tools: Optional[list] = None,
                    tool_choice: Optional[dict] = None) -> dict:
    """The OpenAI Responses API (reference functions/openai.py:668) —
    offline, a deterministic response in the Responses output shape."""
    client = _openai_client()
    if client is not None:
        kw: dict[str, Any] = dict(model_kwargs or {})
        if tools is not None:
            kw["tools"] = tools
        if tool_choice is not None:
            kw["tool_choice"] = tool_choice
        resp = await client.responses.create(input=input, model=model, **kw)
        return resp.model_dump()
    h = _digest(model, input)
    return {"id": f"resp_{h[:24]}", "object": "response", "model": model,
            "status": "completed",
            "output": [{"type": "message", "role": "assistant",
                        "content": [{"type": "output_text",
                                     "text": f"response[{h[:12]}]"}]}],
            "usage": {"input_tokens": len(str(input).split()),
                      "output_tokens": 1}}


@async_udf(return_type=ColumnType.string(), requests_per_minute=_RPM_CHAT,
           concurrency=8)
async def vision(prompt: str, image: bytes, *, model: str,
                 model_kwargs: Optional[dict] = None) -> str:
    """Image question-answering over chat/completions (reference
    functions/openai.py:792 vision); offline, a deterministic answer
    seeded by (prompt, image) with REAL probed dims appended."""
    import base64
    b64 = base64.b64encode(bytes(image)).decode()
    client = _openai_client()
    if client is not None:
        resp = await client.chat.completions.create(
            messages=[{"role": "user", "content": [
                {"type": "text", "text": prompt},
                {"type": "image_url",
                 "image_url": {"url": f"data:image/png;base64,{b64}"}}]}],
            model=model, **(model_kwargs or {}))
        return resp.choices[0].message.content
    from .image_codec import probe
    info = probe(bytes(image)) or {}
    h = _digest("oa-vision", model, prompt, _digest(b64[:256]))
    dims = (f"{info.get('width')}x{info.get('height')}"
            if info.get("width") else "unknown")
    return f"vision[{h[:12]}] {dims}"


def _openai_response_to_tool_calls(response: Any) -> dict:
    """Chat-completions OR Responses-API response → the generic
    {'tool_calls': [...]} shape the shared executor runs
    (reference functions/openai.py:1375)."""
    if isinstance(response, str):
        try:
            response = json.loads(response)
        except (ValueError, TypeError):
            return {"tool_calls": []}
    response = response or {}
    calls = []
    if "output" in response:               # Responses API
        for item in response.get("output", []):
            if item.get("type") == "function_call":
                calls.append({"name": item.get("name"),
                              "arguments": item.get("arguments", "{}")})
    elif "choices" in response:            # Chat Completions
        msg = (response["choices"][0] or {}).get("message", {})
        for tc in msg.get("tool_calls") or []:
            fn = tc.get("function", {})
            calls.append({"name": fn.get("name"),
                          "arguments": fn.get("arguments", "{}")})
    return {"tool_calls": calls}


def invoke_tools(tools: list, response: Any) -> list:
    """Execute the tool calls named in a chat_completions/responses
    response (reference functions/openai.py:1369 invoke_tools)."""
    from .query_template import invoke_tools as _invoke
    return _invoke(tools, _openai_response_to_tool_calls(response))

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


@async_udf(return_type=ColumnType.image(), requests_per_minute=_RPM,
           concurrency=4)
async def generate_images(prompt: str, *,
                          model: str = "imagen-3.0-generate-002",
                          config: Any = None) -> bytes:
    """Image generation (reference functions/gemini.py:258) — real client
    when google-genai is importable, else a deterministic procedural image
    from the in-repo codec."""
    client = _cache.get()
    if client is not None:
        res = await client.aio.models.generate_images(
            model=model, prompt=prompt, config=config)
        return res.generated_images[0].image.image_bytes
    from ._provider_util import procedural_image
    return procedural_image(digest("gemini-img", model, prompt), 96, 96)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM,
           concurrency=2)
async def generate_videos(prompt: str, *, model: str = "veo-2.0-generate-001",
                          config: Any = None) -> dict:
    """Video generation (reference functions/gemini.py:364) — real client
    when google-genai is importable, else a deterministic procedural AVI
    from the in-repo codec in the operation-result shape."""
    import base64
    client = _cache.get()
    if client is not None:
        op = await client.aio.models.generate_videos(
            model=model, prompt=prompt, config=config)
        while not op.done:
            import asyncio
            await asyncio.sleep(2)
            op = await client.aio.operations.get(op)
        vid = op.response.generated_videos[0]
        return {"video": base64.b64encode(vid.video.video_bytes).decode()}
    from ._provider_util import procedural_video
    h = digest("gemini-vid", model, prompt)
    return {"video": base64.b64encode(procedural_video(h)).decode(),
            "operation": f"operations/{h[:16]}", "done": True}


@async_udf(return_type=ColumnType.audio(), requests_per_minute=_RPM,
           concurrency=4)
async def generate_speech(text: str, *,
                          model: str = "gemini-2.5-flash-preview-tts",
                          voice: str = "Kore") -> bytes:
    """Text-to-speech (reference functions/gemini.py:495) — real client
    when google-genai is importable, else a deterministic synthesized WAV
    (length scales with the text) from the in-repo codec."""
    client = _cache.get()
    if client is not None:
        res = await client.aio.models.generate_content(
            model=model, contents=text,
            config={"response_modalities": ["AUDIO"],
                    "speech_config": {"voice_config": {
                        "prebuilt_voice_config": {"voice_name": voice}}}})
        return res.candidates[0].content.parts[0].inline_data.data
    from ._provider_util import procedural_wav
    dur = min(8.0, 0.25 + 0.05 * len(text.split()))
    return procedural_wav(digest("gemini-tts", model, voice, text), dur)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM,
           concurrency=4)
async def transcribe(audio: bytes, *, model: str = "gemini-2.0-flash",
                     prompt: str = "Transcribe this audio.") -> dict:
    """Audio transcription (reference functions/gemini.py:643) — real
    client when google-genai is importable; offline, a deterministic
    transcript derived from the REAL decoded audio (duration/fingerprint
    via the in-repo codec)."""
    client = _cache.get()
    if client is not None:
        res = await client.aio.models.generate_content(
            model=model,
            contents=[{"inline_data": {"mime_type": "audio/wav",
                                       "data": bytes(audio)}},
                      prompt])
        return {"text": res.text}
    from .audio_codec import probe
    info = probe(bytes(audio)) or {}
    h = digest("gemini-stt", model, digest(bytes(audio).hex()[:128]))
    return {"text": f"transcript[{h[:12]}]",
            "duration_s": info.get("duration_s"),
            "sample_rate": info.get("sample_rate")}

"""AWS Bedrock provider functions with the reference's public signatures
(reference functions/bedrock.py: invoke_model:325, converse:498, embed:597,
invoke_tools:742).

Routed through the async rate-limited runtime (functions/llm.py); when
``boto3`` is installed the real bedrock-runtime client is used (sync boto3
calls are pushed to a thread, matching the reference's asyncio.to_thread
pattern at functions/bedrock.py:301), otherwise a deterministic md5-derived
response with the real API's payload shape is returned.
"""

from __future__ import annotations

import asyncio
from typing import Any, Optional

from ..type_system import ArrayType, ColumnType
from ._provider_util import ClientCache, digest, fake_unit_vector, norm_messages, token_words
from .udf import async_udf

def _bedrock_available() -> bool:
    """boto3 can be importable with no AWS config at all (this container) —
    only a resolvable credential + region pair means a REAL endpoint, and
    only a real endpoint gets a rate limit."""
    from ._provider_util import have_package
    if not have_package("boto3"):
        return False
    try:
        import boto3
        s = boto3.session.Session()
        return s.get_credentials() is not None and s.region_name is not None
    except Exception:  # noqa: BLE001
        return False


_RPM = 600.0 if _bedrock_available() else 1e12

# default embedding dimensions for known models
# (reference functions/bedrock.py:226 _embedding_dimensions)
_EMBEDDING_DIMENSIONS: dict[str, int] = {
    "amazon.titan-embed-text-v1": 1536,
    "amazon.titan-embed-text-v2:0": 1024,
    "amazon.titan-embed-image-v1": 1024,
    "cohere.embed-english-v3": 1024,
    "cohere.embed-multilingual-v3": 1024,
    "cohere.embed-v4": 1536,
}


def _make_client() -> Any:
    import boto3
    session = boto3.session.Session()
    # boto3 may be importable without any AWS config (this container):
    # require resolvable credentials AND a region, else use the fake
    if session.get_credentials() is None or session.region_name is None:
        return None
    return session.client(service_name="bedrock-runtime")


_cache = ClientCache("boto3", _make_client)


def _bedrock_client() -> Any:
    """Cached bedrock-runtime client, or None when boto3 is absent
    (reference functions/bedrock.py:97 _bedrock_client)."""
    return _cache.get()


def _model_dim(model_id: str, dimensions: Optional[int]) -> int:
    if dimensions is not None:
        return dimensions
    for key, dim in _EMBEDDING_DIMENSIONS.items():
        if key in model_id:  # substring match handles region prefixes
            return dim
    return 16


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def invoke_model(body: dict, *, model_id: str) -> dict:
    """Invoke a Bedrock model with a raw request body
    (reference functions/bedrock.py:325 invoke_model)."""
    import json as _json
    client = _bedrock_client()
    if client is not None:
        resp = await asyncio.to_thread(
            client.invoke_model, body=_json.dumps(body), modelId=model_id)
        return _json.loads(resp["body"].read())
    h = digest(model_id, body)
    return {
        "id": f"bdrk-{h[:24]}",
        "model": model_id,
        "output": {"text": f"response[{h[:12]}]"},
        "stop_reason": "end_turn",
    }


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def converse(messages: list, *, model_id: str,
                   system: Optional[list] = None,
                   inference_config: Optional[dict] = None,
                   additional_model_request_fields: Optional[dict] = None,
                   tool_config: Optional[dict] = None) -> dict:
    """The Bedrock Converse API
    (reference functions/bedrock.py:498 converse). Returns the response
    dict (output.message / stopReason / usage shape)."""
    messages = norm_messages(messages)
    client = _bedrock_client()
    if client is not None:
        kw: dict[str, Any] = {}
        if system is not None:
            kw["system"] = system
        if inference_config is not None:
            kw["inferenceConfig"] = inference_config
        if additional_model_request_fields is not None:
            kw["additionalModelRequestFields"] = additional_model_request_fields
        if tool_config is not None:
            kw["toolConfig"] = tool_config
        return await asyncio.to_thread(
            client.converse, modelId=model_id, messages=messages, **kw)
    h = digest(model_id, messages, system)
    n_in = sum(len(token_words(str(m.get("content", "")))) for m in messages)
    content: list[dict] = [{"text": f"response[{h[:12]}]"}]
    stop = "end_turn"
    if tool_config and tool_config.get("tools"):
        tool = tool_config["tools"][int(h[0], 16) % len(tool_config["tools"])]
        name = tool.get("toolSpec", {}).get("name", "tool")
        content = [{"toolUse": {"toolUseId": f"tooluse_{h[:12]}",
                                "name": name, "input": {}}}]
        stop = "tool_use"
    return {
        "output": {"message": {"role": "assistant", "content": content}},
        "stopReason": stop,
        "usage": {"inputTokens": n_in, "outputTokens": 1,
                  "totalTokens": n_in + 1},
        "metrics": {"latencyMs": 0},
    }


@async_udf(return_type=ArrayType(ColumnType.float_()),
           requests_per_minute=_RPM, concurrency=32)
async def embed(text: str, *, model_id: str,
                dimensions: Optional[int] = None) -> list:
    """Text embedding via Bedrock (Titan/Cohere models)
    (reference functions/bedrock.py:597 embed)."""
    import json as _json
    client = _bedrock_client()
    if client is not None:
        body: dict[str, Any] = {"inputText": text}
        if dimensions is not None:
            body["dimensions"] = dimensions
        resp = await asyncio.to_thread(
            client.invoke_model, body=_json.dumps(body), modelId=model_id)
        payload = _json.loads(resp["body"].read())
        return list(payload.get("embedding", payload.get("embeddings", [[]])[0]))
    return fake_unit_vector(f"{model_id}|{text}",
                            _model_dim(model_id, dimensions))


def _bedrock_response_to_tool_calls(response: Any) -> dict:
    """Converse response → OpenAI-style {'tool_calls': [...]}
    (reference functions/bedrock.py:748)."""
    import json as _json
    if isinstance(response, str):
        try:
            response = _json.loads(response)
        except (ValueError, TypeError):
            return {"tool_calls": []}
    calls = []
    msg = ((response or {}).get("output") or {}).get("message") or {}
    for part in msg.get("content", []):
        tu = part.get("toolUse")
        if tu:
            calls.append({"name": tu["name"], "arguments": tu.get("input", {})})
    return {"tool_calls": calls}


def invoke_tools(tools: list, response: Any) -> list:
    """Execute the tool calls named in a converse response
    (reference functions/bedrock.py:742 invoke_tools)."""
    from .query_template import invoke_tools as _invoke
    return _invoke(tools, _bedrock_response_to_tool_calls(response))

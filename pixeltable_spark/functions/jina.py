"""Jina AI provider functions (reference functions/jina.py:
embeddings:106, rerank:203). The reference talks to Jina over plain HTTPS
JSON (its own _JinaClient, reference functions/jina.py:54); offline, a
deterministic fake with the real response shapes is returned.
"""

from __future__ import annotations

import os
from typing import Any, Optional

from ..type_system import ArrayType, ColumnType
from ._provider_util import fake_unit_vector, offline_rpm
from .udf import async_udf

_API_URL = "https://api.jina.ai/v1"
_RPM = 1e12 if not os.environ.get("JINA_API_KEY") else 600.0


def _api_key() -> Optional[str]:
    return os.environ.get("JINA_API_KEY")


async def _post(path: str, payload: dict) -> dict:
    """Async HTTPS JSON-RPC to the Jina API via stdlib urllib in a thread
    (the reference uses its own aiohttp-less client the same way)."""
    import asyncio
    import json as _json
    import urllib.request

    def call() -> dict:
        req = urllib.request.Request(
            f"{_API_URL}/{path}",
            data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {_api_key()}"})
        with urllib.request.urlopen(req, timeout=60) as resp:
            return _json.loads(resp.read())

    return await asyncio.to_thread(call)


@async_udf(return_type=ArrayType(ColumnType.float_()),
           requests_per_minute=_RPM, concurrency=32)
async def embeddings(input: str, *, model: str,
                     task: Optional[str] = None,
                     dimensions: Optional[int] = None,
                     late_chunking: Optional[bool] = None) -> list:
    """Embedding — the Jina `embeddings` endpoint
    (reference functions/jina.py:106)."""
    if _api_key():
        payload: dict[str, Any] = {"model": model, "input": [input]}
        if task is not None:
            payload["task"] = task
        if dimensions is not None:
            payload["dimensions"] = dimensions
        if late_chunking is not None:
            payload["late_chunking"] = late_chunking
        resp = await _post("embeddings", payload)
        return list(resp["data"][0]["embedding"])
    return fake_unit_vector(f"{model}|{task or ''}|{input}", dimensions or 16)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def rerank(query: str, documents: list, *, model: str,
                 top_n: Optional[int] = None,
                 return_documents: Optional[bool] = None) -> dict:
    """Rerank documents by relevance to a query
    (reference functions/jina.py:203 rerank). Returns
    {"results": [{"index", "relevance_score"}], "usage"}."""
    if _api_key():
        payload: dict[str, Any] = {
            "model": model, "query": query, "documents": documents}
        if top_n is not None:
            payload["top_n"] = top_n
        if return_documents is not None:
            payload["return_documents"] = return_documents
        return await _post("rerank", payload)
    from .voyageai import _fake_rerank
    return _fake_rerank(query, documents, model, top_n,
                        return_documents=bool(return_documents))

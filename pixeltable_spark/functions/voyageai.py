"""Voyage AI provider functions (reference functions/voyageai.py:
embeddings:52, rerank:155, multimodal_embed:225). Offline, deterministic
fakes with the real response shapes.
"""

from __future__ import annotations

from typing import Any, Optional

from ..type_system import ArrayType, ColumnType
from ._provider_util import ClientCache, digest, fake_unit_vector, offline_rpm, token_words
from .udf import async_udf

_RPM = offline_rpm("voyageai")


def _make_client() -> Any:
    import voyageai
    return voyageai.AsyncClient()


_cache = ClientCache("voyageai", _make_client)


@async_udf(return_type=ArrayType(ColumnType.float_()),
           requests_per_minute=_RPM, concurrency=32)
async def embeddings(input: str, *, model: str,
                     input_type: Optional[str] = None,
                     truncation: Optional[bool] = None,
                     output_dimension: Optional[int] = None) -> list:
    """Embedding — the Voyage `embeddings` endpoint
    (reference functions/voyageai.py:52)."""
    client = _cache.get()
    if client is not None:
        kw: dict[str, Any] = {}
        if input_type is not None:
            kw["input_type"] = input_type
        if truncation is not None:
            kw["truncation"] = truncation
        if output_dimension is not None:
            kw["output_dimension"] = output_dimension
        resp = await client.embed([input], model=model, **kw)
        return list(resp.embeddings[0])
    dim = output_dimension or 16
    # input_type changes the embedding (query vs document prefix), so it
    # participates in the seed — matching the real API's behavior
    return fake_unit_vector(f"{model}|{input_type or ''}|{input}", dim)


def _fake_rerank(query: str, documents: list, model: str,
                 top_k: Optional[int], return_documents: bool) -> dict:
    """Deterministic rerank: score = md5-derived pseudo-relevance, stable
    in (model, query, document)."""
    scored = []
    for i, doc in enumerate(documents):
        h = digest(model, query, doc)
        score = int(h[:8], 16) / 0xFFFFFFFF
        entry = {"index": i, "relevance_score": round(score, 8)}
        if return_documents:
            entry["document"] = doc
        scored.append(entry)
    scored.sort(key=lambda e: (-e["relevance_score"], e["index"]))
    if top_k is not None:
        scored = scored[:top_k]
    total = len(token_words(query)) + sum(
        len(token_words(d)) for d in documents)
    return {"results": scored, "usage": {"total_tokens": total}}


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=16)
async def rerank(query: str, documents: list, *, model: str,
                 top_k: Optional[int] = None, truncation: bool = True) -> dict:
    """Rerank documents by relevance to a query
    (reference functions/voyageai.py:155 rerank). Returns
    {"results": [{"index", "relevance_score", "document"}], "usage"}."""
    client = _cache.get()
    if client is not None:
        resp = await client.rerank(
            query=query, documents=documents, model=model, top_k=top_k,
            truncation=truncation)
        return {"results": [{"index": r.index,
                             "relevance_score": r.relevance_score,
                             "document": r.document}
                            for r in resp.results],
                "usage": {"total_tokens": resp.total_tokens}}
    return _fake_rerank(query, documents, model, top_k, return_documents=True)


@async_udf(return_type=ArrayType(ColumnType.float_()),
           requests_per_minute=_RPM, concurrency=8)
async def multimodal_embed(inputs: list, *, model: str) -> list:
    """Multimodal (text+image) embedding (reference
    functions/voyageai.py:225) — real client when the SDK is importable;
    offline, a deterministic unit vector seeded by the text parts and the
    ACTUAL image bytes (images are validated via the in-repo codec)."""
    client = _cache.get()
    if client is not None:
        res = await client.multimodal_embed(inputs=[inputs], model=model)
        return list(res.embeddings[0])
    from ._provider_util import digest, fake_unit_vector
    from .image_codec import probe
    parts = []
    for item in inputs if isinstance(inputs, list) else [inputs]:
        if isinstance(item, (bytes, bytearray)):
            if probe(bytes(item)) is None:
                raise ValueError(
                    "multimodal_embed: payload is not a decodable image")
            parts.append(bytes(item).hex()[:128])
        else:
            parts.append(str(item))
    return fake_unit_vector(digest("voyage-mm", model, *parts), 16)

"""Replicate provider functions (reference functions/replicate.py: run:31).
Offline, a deterministic fake prediction output is returned.
"""

from __future__ import annotations

from typing import Any

from ..type_system import ColumnType
from ._provider_util import ClientCache, digest, offline_rpm
from .udf import async_udf

_RPM = offline_rpm("replicate")


def _make_client() -> Any:
    import replicate
    return replicate.Client()


_cache = ClientCache("replicate", _make_client)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=8)
async def run(input: dict, *, ref: str) -> dict:
    """Run a model on Replicate (reference functions/replicate.py:31 run).
    `ref` is a model reference like 'owner/name' or
    'owner/name:version'."""
    client = _cache.get()
    if client is not None:
        import asyncio
        out = await asyncio.to_thread(client.run, ref, input=input)
        return {"output": out}
    h = digest(ref, input)
    return {"output": f"response[{h[:12]}]", "model": ref,
            "status": "succeeded"}

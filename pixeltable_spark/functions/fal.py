"""fal.ai provider functions (reference functions/fal.py: run:31).
Offline, a deterministic fake app result is returned.
"""

from __future__ import annotations

from typing import Any

from ..type_system import ColumnType
from ._provider_util import ClientCache, digest, offline_rpm
from .udf import async_udf

_RPM = offline_rpm("fal_client")


def _make_client() -> Any:
    import fal_client
    return fal_client.AsyncClient()


_cache = ClientCache("fal_client", _make_client)


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM, concurrency=8)
async def run(input: dict, *, app: str) -> dict:
    """Run a fal.ai application (reference functions/fal.py:31 run)."""
    client = _cache.get()
    if client is not None:
        handle = await client.submit(app, arguments=input)
        return await handle.get()
    h = digest(app, input)
    return {"request_id": f"fal-{h[:24]}", "app": app,
            "output": f"response[{h[:12]}]", "status": "COMPLETED"}

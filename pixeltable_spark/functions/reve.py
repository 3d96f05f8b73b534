"""Reve image generation (reference functions/reve.py: create:141 over the
api.reve.com/v2 endpoint; ImageResponse = {'image', 'layout'}).

House provider contract: reference signature on the async runtime; real
HTTP client when REVE_API_KEY is set, else a deterministic procedural
image from the in-repo codec wrapped in the ImageResponse shape.
"""

from __future__ import annotations

import os
from typing import Any, Optional

from ..type_system import ColumnType
from ._provider_util import digest, procedural_image
from .udf import async_udf


class ReveRateLimitedError(Exception):
    pass


class ReveContentViolationError(Exception):
    pass


class ReveUnexpectedError(Exception):
    pass


_RPM = 600.0 if os.environ.get("REVE_API_KEY") else 1e12


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM,
           concurrency=4)
async def create(prompt: str, *, references: Optional[list] = None,
                 aspect_ratio: Optional[str] = None,
                 postprocessing: Optional[list] = None,
                 version: Optional[str] = None,
                 model_kwargs: Optional[dict] = None) -> dict:
    """Create an image from a text prompt, optionally guided by reference
    images (reference functions/reve.py:141 create). Returns
    {'image': <b64 payload>, 'layout': {...}}."""
    import base64
    if os.environ.get("REVE_API_KEY"):
        import asyncio
        import json as _json
        import urllib.request

        payload: dict = {"prompt": prompt, **(model_kwargs or {})}
        if aspect_ratio:
            payload["aspect_ratio"] = aspect_ratio
        if postprocessing:
            payload["postprocessing"] = postprocessing
        if version:
            payload["version"] = version
        if references:
            payload["references"] = [
                base64.b64encode(bytes(r)).decode() for r in references]

        def _post():
            req = urllib.request.Request(
                "https://api.reve.com/v2/image/create",
                data=_json.dumps(payload).encode(),
                headers={"Authorization":
                         f"Bearer {os.environ['REVE_API_KEY']}",
                         "Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                if r.status == 429:
                    raise ReveRateLimitedError(r.reason)
                return _json.loads(r.read())
        res = await asyncio.get_event_loop().run_in_executor(None, _post)
        return {"image": res.get("image"), "layout": res.get("layout", {})}
    ref_sig = digest(*[bytes(r).hex()[:64] for r in references or []])
    img = procedural_image(
        digest("reve", prompt, aspect_ratio, version, ref_sig), 96, 96)
    return {"image": base64.b64encode(img).decode(),
            "layout": {"aspect_ratio": aspect_ratio or "1:1",
                       "version": version or "latest",
                       "n_references": len(references or [])}}


def generate_image(*args: Any, **kwargs: Any):
    """Back-compat alias for the round-4 surface; use create()."""
    return create(*args, **kwargs)


def edit_image(prompt: str, image: bytes, **kwargs: Any):
    """Prompt-guided edit — create() with the input as a reference image
    (the reference routes edits through the same endpoint's <frame> tag
    mechanism)."""
    return create(prompt, references=[image], **kwargs)

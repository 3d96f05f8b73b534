"""Black Forest Labs (FLUX) image generation (reference functions/bfl.py:
generate:174, edit:248, fill:339, expand:405 — the submit/poll _BflClient).

House provider contract: reference-matching signatures on the async
runtime; a real HTTP client when `requests` + BFL_API_KEY are available,
otherwise a deterministic md5-seeded procedural image from the in-repo
codec (a REAL decodable payload, pure function of the inputs).
"""

from __future__ import annotations

import os
from typing import Any, Optional

from ..type_system import ColumnType
from ._provider_util import digest, procedural_image
from .udf import async_udf


def _live() -> bool:
    return bool(os.environ.get("BFL_API_KEY"))


# rate-limit only when a real endpoint is reachable (house pattern)
_RPM = 600.0 if os.environ.get("BFL_API_KEY") else 1e12


async def _bfl_task(endpoint: str, payload: dict) -> bytes:
    """Submit + poll a BFL task and download the result image."""
    import asyncio
    import urllib.request

    def _post():
        import json as _json
        req = urllib.request.Request(
            f"https://api.bfl.ai/v1/{endpoint}",
            data=_json.dumps(payload).encode(),
            headers={"x-key": os.environ["BFL_API_KEY"],
                     "Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            return _json.loads(r.read())
    task = await asyncio.get_event_loop().run_in_executor(None, _post)
    poll_url = task["polling_url"]

    def _poll():
        import json as _json
        with urllib.request.urlopen(poll_url) as r:
            return _json.loads(r.read())
    for _ in range(120):
        res = await asyncio.get_event_loop().run_in_executor(None, _poll)
        if res.get("status") == "Ready":
            url = res["result"]["sample"]

            def _get():
                with urllib.request.urlopen(url) as r:
                    return r.read()
            return await asyncio.get_event_loop().run_in_executor(None, _get)
        await asyncio.sleep(0.5)
    raise TimeoutError(f"BFL task did not complete: {poll_url}")


def _fmt(output_format: Optional[str]) -> str:
    return "JPEG" if (output_format or "jpeg") == "jpeg" else "PNG"


@async_udf(return_type=ColumnType.image(), requests_per_minute=_RPM,
           concurrency=4)
async def generate(prompt: str, *, model: str = "flux-2-pro",
                   width: Optional[int] = None, height: Optional[int] = None,
                   seed: Optional[int] = None,
                   safety_tolerance: Optional[int] = None,
                   output_format: Optional[str] = None,
                   steps: Optional[int] = None,
                   guidance: Optional[float] = None) -> bytes:
    """Text-to-image (reference functions/bfl.py:174 generate)."""
    w, h = width or 1024, height or 1024
    if _live():
        return await _bfl_task(model, {
            "prompt": prompt, "width": w, "height": h, "seed": seed,
            "safety_tolerance": safety_tolerance,
            "output_format": output_format, "steps": steps,
            "guidance": guidance})
    return procedural_image(digest("bfl", model, prompt, seed),
                            min(w, 128), min(h, 128), _fmt(output_format))


@async_udf(return_type=ColumnType.image(), requests_per_minute=_RPM,
           concurrency=4)
async def edit(prompt: str, input_image: bytes, *,
               model: str = "flux-2-pro", seed: Optional[int] = None,
               safety_tolerance: Optional[int] = None,
               output_format: Optional[str] = None) -> bytes:
    """Prompt-guided image edit (reference functions/bfl.py:248 edit)."""
    import base64
    if _live():
        return await _bfl_task(model, {
            "prompt": prompt, "seed": seed,
            "input_image": base64.b64encode(bytes(input_image)).decode(),
            "safety_tolerance": safety_tolerance,
            "output_format": output_format})
    return procedural_image(
        digest("bfl-edit", model, prompt, seed,
               digest(base64.b64encode(bytes(input_image)).decode())),
        128, 128, _fmt(output_format))


@async_udf(return_type=ColumnType.image(), requests_per_minute=_RPM,
           concurrency=4)
async def fill(image: bytes, *, prompt: Optional[str] = None,
               mask: Optional[bytes] = None, seed: Optional[int] = None,
               output_format: Optional[str] = None) -> bytes:
    """Mask-guided inpainting (reference functions/bfl.py:339 fill)."""
    import base64
    if _live():
        payload = {"image": base64.b64encode(bytes(image)).decode(),
                   "prompt": prompt, "seed": seed,
                   "output_format": output_format}
        if mask is not None:
            payload["mask"] = base64.b64encode(bytes(mask)).decode()
        return await _bfl_task("flux-pro-1.0-fill", payload)
    return procedural_image(
        digest("bfl-fill", prompt, seed, digest(bytes(image).hex()[:64])),
        128, 128, _fmt(output_format))


@async_udf(return_type=ColumnType.image(), requests_per_minute=_RPM,
           concurrency=4)
async def expand(image: bytes, *, top: int = 0, bottom: int = 0,
                 left: int = 0, right: int = 0,
                 prompt: Optional[str] = None, seed: Optional[int] = None,
                 output_format: Optional[str] = None) -> bytes:
    """Outpainting/canvas expansion (reference functions/bfl.py:405
    expand)."""
    import base64
    if _live():
        return await _bfl_task("flux-pro-1.0-expand", {
            "image": base64.b64encode(bytes(image)).decode(),
            "top": top, "bottom": bottom, "left": left, "right": right,
            "prompt": prompt, "seed": seed,
            "output_format": output_format})
    return procedural_image(
        digest("bfl-expand", prompt, seed, top, bottom, left, right,
               digest(bytes(image).hex()[:64])),
        128, 128, _fmt(output_format))


def generate_image(*args: Any, **kwargs: Any):
    """Back-compat alias for the round-4 surface; use generate()."""
    return generate(*args, **kwargs)

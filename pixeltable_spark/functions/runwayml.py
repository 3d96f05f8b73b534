"""RunwayML generation functions (reference functions/runwayml.py:
text_to_image:56, text_to_video:123, image_to_video:184,
video_to_video:258 over the AsyncRunwayML SDK).

House provider contract: reference signatures on the async runtime; real
SDK when `runwayml` is importable, else deterministic procedural media
from the in-repo codecs, returned in the reference's JSON task shape.
"""

from __future__ import annotations

import base64
from typing import Any, Optional

from ..type_system import ColumnType
from ._provider_util import (ClientCache, digest, offline_rpm,
                             procedural_image, procedural_video)
from .udf import async_udf

_RPM = offline_rpm("runwayml")


def _make_client() -> Any:
    import runwayml
    return runwayml.AsyncRunwayML()


_cache = ClientCache("runwayml", _make_client)


def _task_json(kind: str, seed: str, payload: bytes, fmt: str) -> dict:
    return {"id": f"task-{seed[:24]}", "status": "SUCCEEDED",
            "kind": kind, "output_format": fmt,
            "output": [base64.b64encode(payload).decode()]}


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM,
           concurrency=4)
async def text_to_image(prompt_text: str, *, model: str = "gen4_image",
                        ratio: str = "1024:1024",
                        model_kwargs: Optional[dict] = None) -> dict:
    """Text-to-image (reference functions/runwayml.py:56)."""
    client = _cache.get()
    if client is not None:
        task = await client.text_to_image.create(
            prompt_text=prompt_text, model=model, ratio=ratio,
            **(model_kwargs or {}))
        out = await task.wait_for_task_output()
        return out.to_dict() if hasattr(out, "to_dict") else dict(out)
    h = digest("runway-t2i", model, prompt_text, ratio)
    return _task_json("text_to_image", h, procedural_image(h, 96, 96), "png")


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM,
           concurrency=4)
async def text_to_video(prompt_text: str, *, model: str = "veo3",
                        ratio: str = "1280:720",
                        duration: Optional[int] = None,
                        model_kwargs: Optional[dict] = None) -> dict:
    """Text-to-video (reference functions/runwayml.py:123)."""
    client = _cache.get()
    if client is not None:
        task = await client.text_to_video.create(
            prompt_text=prompt_text, model=model, ratio=ratio,
            duration=duration, **(model_kwargs or {}))
        out = await task.wait_for_task_output()
        return out.to_dict() if hasattr(out, "to_dict") else dict(out)
    h = digest("runway-t2v", model, prompt_text, ratio, duration)
    return _task_json("text_to_video", h,
                      procedural_video(h, n_frames=max(2, (duration or 1) * 4)),
                      "avi")


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM,
           concurrency=4)
async def image_to_video(prompt_image: bytes, *, model: str = "gen4_turbo",
                         ratio: str = "1280:720",
                         prompt_text: Optional[str] = None,
                         duration: Optional[int] = None,
                         model_kwargs: Optional[dict] = None) -> dict:
    """First-frame-conditioned video generation (reference
    functions/runwayml.py:184 image_to_video)."""
    client = _cache.get()
    if client is not None:
        uri = ("data:image/png;base64,"
               + base64.b64encode(bytes(prompt_image)).decode())
        task = await client.image_to_video.create(
            prompt_image=uri, model=model, ratio=ratio,
            prompt_text=prompt_text, duration=duration,
            **(model_kwargs or {}))
        out = await task.wait_for_task_output()
        return out.to_dict() if hasattr(out, "to_dict") else dict(out)
    h = digest("runway-i2v", model, prompt_text, ratio, duration,
               digest(bytes(prompt_image).hex()[:64]))
    return _task_json("image_to_video", h,
                      procedural_video(h, n_frames=max(2, (duration or 1) * 4)),
                      "avi")


@async_udf(return_type=ColumnType.json(), requests_per_minute=_RPM,
           concurrency=4)
async def video_to_video(video_uri: Any, *, model: str = "gen4_aleph",
                         ratio: str = "1280:720",
                         prompt_text: Optional[str] = None,
                         references: Optional[list] = None,
                         model_kwargs: Optional[dict] = None) -> dict:
    """Prompt-guided video restyling (reference functions/runwayml.py:258
    video_to_video)."""
    client = _cache.get()
    if client is not None:
        task = await client.video_to_video.create(
            video_uri=video_uri, model=model, ratio=ratio,
            prompt_text=prompt_text, references=references or [],
            **(model_kwargs or {}))
        out = await task.wait_for_task_output()
        return out.to_dict() if hasattr(out, "to_dict") else dict(out)
    vid_sig = (digest(bytes(video_uri).hex()[:64])
               if isinstance(video_uri, (bytes, bytearray))
               else digest(str(video_uri)))
    h = digest("runway-v2v", model, prompt_text, ratio, vid_sig)
    return _task_json("video_to_video", h, procedural_video(h), "avi")

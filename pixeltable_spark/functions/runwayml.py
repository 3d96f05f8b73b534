"""RunwayML generation (reference functions/runwayml.py: text_to_image:56,
text_to_video:123). Gated: image/video outputs need codecs absent from
this container.
"""

from __future__ import annotations

from typing import Any


def text_to_image(*args: Any, **kwargs: Any):
    """RunwayML text-to-image (reference functions/runwayml.py:56) — needs
    image codecs absent from this container."""
    raise NotImplementedError(
        "runwayml.text_to_image requires image support (no codec in this "
        "environment)")


def text_to_video(*args: Any, **kwargs: Any):
    """RunwayML text-to-video (reference functions/runwayml.py:123) — needs
    video codecs absent from this container."""
    raise NotImplementedError(
        "runwayml.text_to_video requires video support (no codec in this "
        "environment)")

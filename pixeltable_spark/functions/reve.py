"""Reve image generation (reference functions/reve.py: the HTTPS
_ReveClient returning ImageResponse). Gated: image outputs need a codec
absent from this container.
"""

from __future__ import annotations

from typing import Any


def generate_image(*args: Any, **kwargs: Any):
    """Reve image generation (reference functions/reve.py _ReveClient) —
    needs image codecs absent from this container."""
    raise NotImplementedError(
        "reve.generate_image requires image support (no codec in this "
        "environment)")


def edit_image(*args: Any, **kwargs: Any):
    """Reve image editing — same codec gate."""
    raise NotImplementedError(
        "reve.edit_image requires image support (no codec in this "
        "environment)")

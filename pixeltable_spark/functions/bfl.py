"""Black Forest Labs (FLUX) image generation
(reference functions/bfl.py: generate_image via the task-polling
_BflClient). Image generation returns PIL images — gated here because no
image codec is available in this container.
"""

from __future__ import annotations

from typing import Any


def generate_image(*args: Any, **kwargs: Any):
    """FLUX image generation (reference functions/bfl.py submit/poll
    client) — needs image codecs absent from this container."""
    raise NotImplementedError(
        "bfl.generate_image requires image support (no codec in this "
        "environment)")

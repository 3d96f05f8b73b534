"""Shared helpers for the provider modules (gemini, bedrock, ollama, …).

Each provider module follows the same contract as functions/openai.py:
reference-matching public signatures routed through the async rate-limited
runtime (functions/llm.py); when the provider's SDK is importable a real
client is used, otherwise a deterministic md5-derived response with the
real API's payload shape is returned (offline + oracle-reproducible).
"""

from __future__ import annotations

import hashlib
import json
import math
from typing import Any, Optional


def digest(*parts: Any) -> str:
    """Stable md5 over arbitrary JSON-serializable parts."""
    return hashlib.md5("|".join(
        p if isinstance(p, str) else json.dumps(p, sort_keys=True, default=str)
        for p in parts).encode()).hexdigest()


def norm_messages(messages: Any) -> list:
    """Accept a raw string, a JSON-encoded list, or a message list."""
    if isinstance(messages, str):
        try:
            parsed = json.loads(messages)
            return parsed if isinstance(parsed, list) else [
                {"role": "user", "content": messages}]
        except (ValueError, TypeError):
            return [{"role": "user", "content": messages}]
    return messages


def have_package(name: str) -> bool:
    import importlib.util
    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ValueError, ModuleNotFoundError):
        return False


def offline_rpm(package: str) -> float:
    """Rate limit applies only when a REAL endpoint is reachable; the
    deterministic offline fake is pure local math, so no throttle."""
    return 600.0 if have_package(package) else 1e12


def fake_unit_vector(seed: str, dim: int) -> list[float]:
    """Deterministic unit-norm embedding from an md5 seed (same math as
    llm.DeterministicFakeClient.embed, shared so provider fakes and the
    DuckDB oracle agree)."""
    h = hashlib.md5(seed.encode()).digest()
    raw = [(h[i % 16] - 127.5) / 127.5 for i in range(dim)]
    n = math.sqrt(sum(x * x for x in raw)) or 1.0
    return [x / n for x in raw]


def fake_openai_chat(model: str, messages: list, *, id_prefix: str = "chatcmpl",
                     object_name: str = "chat.completion") -> dict:
    """OpenAI-compatible chat-completion payload, deterministic in
    (model, messages). Shared by the OpenAI-compatible providers
    (deepseek/fireworks/groq/together/vllm/llama_cpp fakes)."""
    h = digest(model, messages)
    n_in = sum(len(str(m.get("content", "")).split()) for m in messages)
    return {
        "id": f"{id_prefix}-{h[:24]}",
        "object": object_name,
        "model": model,
        "choices": [{
            "index": 0,
            "finish_reason": "stop",
            "message": {"role": "assistant", "content": f"response[{h[:12]}]"},
        }],
        "usage": {"prompt_tokens": n_in, "completion_tokens": 1,
                  "total_tokens": n_in + 1},
    }


def token_words(text: str) -> list[str]:
    return [w for w in str(text).split() if w]


class ClientCache:
    """Per-module lazy singleton: returns a real client when `package` is
    importable (via `factory`), else None (providers then use the fake)."""

    def __init__(self, package: str, factory: Any):
        self._package = package
        self._factory = factory
        self._have: Optional[bool] = None
        self._client: Any = None

    def get(self) -> Any:
        if self._have is None:
            self._have = have_package(self._package)
        if self._have and self._client is None:
            try:
                self._client = self._factory()
            except Exception:  # noqa: BLE001 — unconfigured SDK → offline fake
                self._client = None
            if self._client is None:
                # SDK present but not usable (no credentials/endpoint):
                # fall back to the deterministic fake permanently
                self._have = False
        return self._client


def procedural_image(seed: str, width: int = 64, height: int = 64,
                     fmt: str = "PNG"):
    """Deterministic md5-seeded image payload, encoded with the in-repo
    codec — the offline stand-in for provider image generation (a REAL
    decodable image whose pixels are a pure function of the inputs)."""
    import numpy as np

    from .image_codec import MiniImage
    h = hashlib.md5(seed.encode()).digest()
    y, x = np.mgrid[0:height, 0:width].astype(np.float64)
    arr = np.empty((height, width, 3), dtype=np.uint8)
    for c in range(3):
        fx = 1 + h[c * 3] % 5
        fy = 1 + h[c * 3 + 1] % 5
        phase = h[c * 3 + 2] / 255.0 * 2 * math.pi
        wave = np.sin(2 * math.pi * (fx * x / width + fy * y / height)
                      + phase)
        arr[:, :, c] = ((wave + 1) * 127.5).astype(np.uint8)
    return MiniImage(arr, "RGB").save_bytes(fmt)


def procedural_wav(seed: str, duration_s: float = 1.0, rate: int = 8000):
    """Deterministic md5-seeded sine-chord WAV (offline TTS/audio-gen
    stand-in; decodable by the in-repo audio codec)."""
    import numpy as np

    from . import audio_codec
    h = hashlib.md5(seed.encode()).digest()
    n = max(1, int(duration_s * rate))
    t = np.arange(n) / rate
    sig = np.zeros(n, dtype=np.float64)
    for k in range(3):
        freq = 110.0 * (1 + h[k] % 24)
        amp = 2000 + (h[k + 3] % 64) * 100
        sig += amp * np.sin(2 * math.pi * freq * t)
    return audio_codec.encode(
        np.clip(sig, -32768, 32767).astype(np.int16)[:, None], rate, 2)


def procedural_video(seed: str, n_frames: int = 8, width: int = 32,
                     height: int = 24, fps: float = 8.0):
    """Deterministic md5-seeded AVI (offline video-gen stand-in; decodable
    by the in-repo video codec): a procedural frame panned per frame."""
    import numpy as np

    from . import image_codec, video_codec
    base = image_codec.decode(procedural_image(seed, width * 2, height * 2))
    frames = np.stack([
        base.arr[i % height:i % height + height,
                 i % width:i % width + width] for i in range(n_frames)])
    return video_codec.encode(frames, fps)

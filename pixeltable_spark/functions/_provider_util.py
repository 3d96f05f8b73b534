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

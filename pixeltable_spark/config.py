"""Layered configuration — the reference's ``config.py`` Config
(precedence: environment > user config file > pyproject section),
re-expressed on stdlib ``tomllib``.

Sources, highest precedence first:

1. Environment: ``PIXELTABLE_SPARK_<SECTION>_<KEY>`` (e.g.
   ``PIXELTABLE_SPARK_SPARK_SHUFFLE_PARTITIONS=64``); the engine's
   legacy ``SPARK_GRAFT_*`` names keep working where they exist.
2. The file named by ``$PIXELTABLE_SPARK_CONFIG`` (TOML).
3. ``~/.pixeltable_spark/config.toml``.
4. ``[tool.pixeltable_spark]`` of ``./pyproject.toml``.

Known sections mirror the reference's layout: ``core`` (home),
``spark`` (cpus, shuffle_partitions, driver_memory, java_opts), plus a
free section per provider (``[openai] api_key = ...``) that the provider
modules consult after their native env vars.
"""

from __future__ import annotations

import os
import threading
import tomllib
from typing import Any, Optional, TypeVar

T = TypeVar("T")

_lock = threading.Lock()
_cached: Optional["Config"] = None


class Config:
    def __init__(self, file_values: dict[str, dict[str, Any]],
                 source: Optional[str]):
        self._values = file_values
        self.source = source

    @classmethod
    def load(cls) -> "Config":
        path = os.environ.get("PIXELTABLE_SPARK_CONFIG")
        if path and not os.path.exists(path):
            # a typo'd explicit path silently falling through to
            # ~/.pixeltable_spark or pyproject.toml loads the WRONG settings
            import warnings

            from .exceptions import EngineWarning
            warnings.warn(
                f"$PIXELTABLE_SPARK_CONFIG points at nonexistent file "
                f"{path!r}; falling back to default config locations",
                EngineWarning, stacklevel=2)
        candidates = [path] if path else []
        candidates.append(os.path.join(os.path.expanduser("~"),
                                       ".pixeltable_spark", "config.toml"))
        for p in candidates:
            if p and os.path.exists(p):
                with open(p, "rb") as f:
                    data = tomllib.load(f)
                return cls(cls._sectionize(data), p)
        pp = os.path.join(os.getcwd(), "pyproject.toml")
        if os.path.exists(pp):
            with open(pp, "rb") as f:
                data = tomllib.load(f)
            section = data.get("tool", {}).get("pixeltable_spark")
            if isinstance(section, dict):
                return cls(cls._sectionize(section), pp)
        return cls({}, None)

    @staticmethod
    def _sectionize(data: dict) -> dict[str, dict[str, Any]]:
        """Bare top-level keys relocate into the 'core' section (the
        reference does the same with its default section)."""
        out: dict[str, dict[str, Any]] = {}
        for k, v in data.items():
            if isinstance(v, dict):
                out.setdefault(k, {}).update(v)
            else:
                out.setdefault("core", {})[k] = v
        return out

    def get(self, section: str, key: str, default: Optional[T] = None,
            env: Optional[str] = None) -> Any:
        """Typed lookup with env-first precedence. ``env`` adds a legacy
        environment alias checked before the canonical name."""
        canonical = f"PIXELTABLE_SPARK_{section}_{key}".upper()
        for name in ([env] if env else []) + [canonical]:
            if name and name in os.environ:
                raw: Any = os.environ[name]
                break
        else:
            raw = self._values.get(section, {}).get(key, default)
        if raw is None or default is None or isinstance(raw, type(default)):
            return raw
        try:
            if isinstance(default, bool):
                return str(raw).strip().lower() in ("1", "true", "yes", "on")
            return type(default)(raw)
        except (TypeError, ValueError):
            return default


def get_config(reload: bool = False) -> Config:
    global _cached
    with _lock:
        if _cached is None or reload:
            _cached = Config.load()
        return _cached

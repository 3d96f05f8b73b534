"""llama.cpp local-inference functions (reference functions/llama_cpp.py:
create_chat_completion:22, _lookup_local_model:108, cleanup:140).

Runs LOCALLY when ``llama_cpp`` is installed (model loaded once per
(path, n_gpu_layers, chat_format) and cached); here it is absent, so a
deterministic OpenAI-shaped fake is produced.
"""

from __future__ import annotations

import threading
from typing import Any, Optional

from ..type_system import ColumnType
from ._provider_util import fake_openai_chat, have_package, norm_messages
from .udf import udf

_cache_lock = threading.Lock()
_model_cache: dict[tuple, Any] = {}


def _lookup_local_model(model_path: str, n_gpu_layers: int,
                        chat_format: Optional[str]) -> Any:
    """Load-once model cache (reference functions/llama_cpp.py:108)."""
    import llama_cpp
    key = (model_path, n_gpu_layers, chat_format)
    with _cache_lock:
        if key not in _model_cache:
            _model_cache[key] = llama_cpp.Llama(
                model_path=model_path, n_gpu_layers=n_gpu_layers,
                chat_format=chat_format, verbose=False)
        return _model_cache[key]


def cleanup() -> None:
    """Release cached models (reference functions/llama_cpp.py:140)."""
    with _cache_lock:
        _model_cache.clear()


@udf(return_type=ColumnType.json())
def create_chat_completion(messages: list, *,
                           model_path: Optional[str] = None,
                           repo_id: Optional[str] = None,
                           repo_filename: Optional[str] = None,
                           model_kwargs: Optional[dict] = None) -> dict:
    """Local chat completion via llama.cpp
    (reference functions/llama_cpp.py:22 create_chat_completion).
    Exactly one of model_path or repo_id must be given."""
    if (model_path is None) == (repo_id is None):
        raise ValueError(
            "exactly one of model_path or repo_id must be specified")
    messages = norm_messages(messages)
    if have_package("llama_cpp"):
        if model_path is not None:
            llm = _lookup_local_model(model_path, 0, None)
        else:
            import llama_cpp
            llm = llama_cpp.Llama.from_pretrained(
                repo_id=repo_id, filename=repo_filename, verbose=False)
        return llm.create_chat_completion(messages, **(model_kwargs or {}))
    return fake_openai_chat(model_path or repo_id or "llama", messages)

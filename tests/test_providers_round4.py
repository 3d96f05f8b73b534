"""Round-4 provider modules (gemini/bedrock/ollama/whisper + breadth):
reference-matching signatures, deterministic offline fakes, async-runtime
integration (reference tests/functions/test_gemini.py / test_bedrock.py /
test_ollama.py / test_whisper.py shape — mock/offline transport)."""

from __future__ import annotations

import json

import pytest

import pixeltable_spark as pxt
from pixeltable_spark.exprs import InlineArray, InlineDict
from pixeltable_spark.functions import (
    bedrock, deepseek, fireworks, gemini, groq, jina, llama_cpp, mistralai,
    ollama, replicate, together, vllm, voyageai, whisper,
)


@pytest.fixture()
def docs(spark):
    return pxt.table_from_rows(
        spark, [{"doc_id": i, "text": f"document body number {i}"}
                for i in range(6)],
        "r4prov_docs", rowid_cols=["doc_id"])


def _msgs(t):
    return InlineArray([InlineDict({"role": "user", "content": t.text})])


class TestGemini:
    def test_generate_content_shape_and_determinism(self, docs):
        q = docs.select(docs.doc_id,
                        r=gemini.generate_content(docs.text, model="gem-test"))
        a = {r["doc_id"]: json.loads(r["r"]) for r in q.collect()}
        b = {r["doc_id"]: json.loads(r["r"]) for r in q.collect()}
        assert a == b
        resp = a[0]
        cand = resp["candidates"][0]
        assert cand["content"]["role"] == "model"
        assert cand["content"]["parts"][0]["text"].startswith("response[")
        assert cand["finish_reason"] == "STOP"
        um = resp["usage_metadata"]
        assert um["total_token_count"] == um["prompt_token_count"] + 1

    def test_embed_content_unit_norm_and_dim(self, docs):
        q = docs.select(e=gemini.embed_content(
            docs.text, model="emb", config={"output_dimensionality": 8}))
        rows = q.collect()
        assert all(len(r["e"]) == 8 for r in rows)
        for r in rows:
            assert sum(x * x for x in r["e"]) == pytest.approx(1.0, abs=1e-9)

    def test_invoke_tools_executes_function_call(self):
        from pixeltable_spark.functions import tools as make_tools

        def add(a: int, b: int) -> int:
            return a + b

        ts = make_tools(add)
        resp = {"candidates": [{"content": {"role": "model", "parts": [
            {"function_call": {"name": "add", "args": {"a": 2, "b": 3}}}]}}]}
        out = gemini.invoke_tools(ts, resp)
        assert out == [{"name": "add", "result": 5}]

    def test_media_endpoints_codec_backed(self):
        # round 5: the stdlib codecs exist, so media endpoints return REAL
        # deterministic payloads offline instead of raising
        import asyncio
        from pixeltable_spark.functions import audio_codec as ac
        from pixeltable_spark.functions import image_codec as ic
        img = asyncio.run(gemini.generate_images.async_fn("x"))
        assert ic.probe(img)["format"] == "PNG"
        wav = asyncio.run(gemini.generate_speech.async_fn("hello there"))
        assert ac.probe(wav)["format"] == "WAV"
        tr = asyncio.run(gemini.transcribe.async_fn(wav))
        assert tr["text"].startswith("transcript[")


class TestBedrock:
    def test_converse_shape(self, docs):
        q = docs.select(docs.doc_id,
                        r=bedrock.converse(_msgs(docs), model_id="amazon.nova"))
        rows = {r["doc_id"]: json.loads(r["r"]) for r in q.collect()}
        resp = rows[2]
        msg = resp["output"]["message"]
        assert msg["role"] == "assistant"
        assert msg["content"][0]["text"].startswith("response[")
        assert resp["stopReason"] == "end_turn"
        assert resp["usage"]["totalTokens"] == resp["usage"]["inputTokens"] + 1

    def test_invoke_model_shape(self, docs):
        q = docs.select(r=bedrock.invoke_model(
            InlineDict({"inputText": docs.text}), model_id="amazon.titan"))
        rows = q.collect()
        assert len({json.loads(r["r"])["id"] for r in rows}) == 6

    def test_embed_known_model_dims(self, docs):
        q = docs.select(e=bedrock.embed(
            docs.text, model_id="amazon.titan-embed-text-v2:0"))
        rows = q.collect()
        assert all(len(r["e"]) == 1024 for r in rows)

    def test_tool_call_roundtrip(self):
        from pixeltable_spark.functions import tools as make_tools

        def mul(a: int, b: int) -> int:
            return a * b

        ts = make_tools(mul)
        resp = {"output": {"message": {"role": "assistant", "content": [
            {"toolUse": {"toolUseId": "t1", "name": "mul",
                         "input": {"a": 4, "b": 5}}}]}},
                "stopReason": "tool_use"}
        assert bedrock.invoke_tools(ts, resp) == [{"name": "mul", "result": 20}]


class TestOllama:
    def test_generate_shape(self, docs):
        rows = docs.select(r=ollama.generate(docs.text, model="llama-test")).collect()
        resp = json.loads(rows[0]["r"])
        assert resp["done"] and resp["response"].startswith("response[")
        assert resp["prompt_eval_count"] == 4

    def test_chat_shape(self, docs):
        rows = docs.select(r=ollama.chat(_msgs(docs), model="llama-test")).collect()
        resp = json.loads(rows[0]["r"])
        assert resp["message"]["role"] == "assistant"
        assert resp["done_reason"] == "stop"

    def test_embed_unit_norm(self, docs):
        rows = docs.select(e=ollama.embed(docs.text, model="nomic")).collect()
        for r in rows:
            assert sum(x * x for x in r["e"]) == pytest.approx(1.0, abs=1e-9)


class TestWhisper:
    def test_transcribe_shape(self, spark):
        t = pxt.table_from_rows(
            spark, [{"media_id": i, "payload": bytes(range(50)) * (1 + i)}
                    for i in range(3)],
            "r4wh", rowid_cols=["media_id"])
        rows = t.select(t.media_id,
                        r=whisper.transcribe(t.payload, model="base.en")).collect()
        out = {r["media_id"]: json.loads(r["r"]) for r in rows}
        for r in out.values():
            assert r["language"] == "en"
            assert r["segments"][0]["text"].strip().startswith("segment[")
            assert r["text"].startswith(r["segments"][0]["text"])
        # deterministic in payload bytes
        rows2 = t.select(t.media_id,
                         r=whisper.transcribe(t.payload, model="base.en")).collect()
        assert {r["media_id"]: r["r"] for r in rows2} == {
            r["media_id"]: r["r"] for r in rows}


class TestOpenAICompatible:
    @pytest.mark.parametrize("mod", [deepseek, groq, fireworks])
    def test_chat_completions_shape(self, docs, mod):
        q = docs.select(docs.doc_id,
                        r=mod.chat_completions(_msgs(docs), model="m-test"))
        rows = {r["doc_id"]: json.loads(r["r"]) for r in q.collect()}
        resp = rows[1]
        assert resp["object"] == "chat.completion"
        assert resp["choices"][0]["message"]["content"].startswith("response[")
        assert resp["usage"]["total_tokens"] == resp["usage"]["prompt_tokens"] + 1

    def test_together_surfaces(self, docs):
        rows = docs.select(
            c=together.completions(docs.text, model="m"),
            cc=together.chat_completions(_msgs(docs), model="m"),
            e=together.embeddings(docs.text, model="m"),
        ).collect()
        assert json.loads(rows[0]["c"])["choices"][0]["text"].startswith("response[")
        assert len(rows[0]["e"]) == 16
        import asyncio, base64
        from pixeltable_spark.functions import image_codec as ic
        r = asyncio.run(together.image_generations.async_fn("x", model="m"))
        assert ic.probe(base64.b64decode(r["data"][0]["b64_json"])) is not None

    def test_mistral_surfaces(self, docs):
        rows = docs.select(
            cc=mistralai.chat_completions(_msgs(docs), model="m"),
            fim=mistralai.fim_completions(docs.text, model="codestral"),
            e=mistralai.embeddings(docs.text, model="m"),
        ).collect()
        assert json.loads(rows[0]["fim"])["choices"][0]["message"][
            "content"].startswith("fill[")
        assert len(rows[0]["e"]) == 16

    def test_replicate_run(self, docs):
        rows = docs.select(r=replicate.run(
            InlineDict({"prompt": docs.text}), ref="owner/model")).collect()
        resp = json.loads(rows[0]["r"])
        assert resp["status"] == "succeeded" and resp["model"] == "owner/model"


class TestLocalEngines:
    def test_vllm_generate_and_chat(self, docs):
        rows = docs.select(
            g=vllm.generate(docs.text, model="meta-llama/test"),
            c=vllm.chat_completions(_msgs(docs), model="meta-llama/test"),
        ).collect()
        g = json.loads(rows[0]["g"])
        assert g["finished"] and g["outputs"][0]["text"].startswith("response[")

    def test_llama_cpp_requires_one_source(self, docs):
        with pytest.raises(ValueError, match="exactly one"):
            llama_cpp.create_chat_completion.py_fn(
                [{"role": "user", "content": "x"}])
        rows = docs.select(r=llama_cpp.create_chat_completion(
            _msgs(docs), model_path="/models/q4.gguf")).collect()
        resp = json.loads(rows[0]["r"])
        assert resp["choices"][0]["message"]["content"].startswith("response[")


class TestRerankers:
    def test_voyage_rerank_sorted_and_topk(self, docs):
        fake = voyageai._fake_rerank(
            "query", [f"doc {i}" for i in range(5)], "rerank-2.5", 3, True)
        scores = [r["relevance_score"] for r in fake["results"]]
        assert scores == sorted(scores, reverse=True) and len(scores) == 3
        assert all("document" in r for r in fake["results"])

    def test_voyage_embeddings_input_type_changes_vector(self, docs):
        a = docs.select(e=voyageai.embeddings(
            docs.text, model="voyage-3", input_type="query")).collect()
        b = docs.select(e=voyageai.embeddings(
            docs.text, model="voyage-3", input_type="document")).collect()
        assert a[0]["e"] != b[0]["e"]

    def test_jina_surfaces(self, docs):
        rows = docs.select(e=jina.embeddings(
            docs.text, model="jina-embeddings-v3", dimensions=8)).collect()
        assert all(len(r["e"]) == 8 for r in rows)
        rr = jina.rerank.async_fn
        import asyncio
        out = asyncio.run(rr("q", ["a", "b"], model="jina-reranker"))
        assert {r["index"] for r in out["results"]} == {0, 1}
        assert "document" not in out["results"][0]


class TestBreadthWave2:
    @pytest.mark.parametrize("mod", ["openrouter", "nebius", "fabric"])
    def test_openai_compatible_chat(self, docs, mod):
        import importlib
        m = importlib.import_module(f"pixeltable_spark.functions.{mod}")
        rows = docs.select(r=m.chat_completions(_msgs(docs), model="m")).collect()
        resp = json.loads(rows[0]["r"])
        assert resp["object"] == "chat.completion"
        assert resp["choices"][0]["message"]["content"].startswith("response[")

    def test_nebius_and_twelvelabs_embeddings(self, docs):
        from pixeltable_spark.functions import nebius, twelvelabs
        rows = docs.select(
            a=nebius.embeddings(docs.text, model="m"),
            b=twelvelabs.embed(docs.text, model_name="marengo"),
        ).collect()
        for r in rows:
            assert sum(x * x for x in r["a"]) == pytest.approx(1.0, abs=1e-9)
            assert sum(x * x for x in r["b"]) == pytest.approx(1.0, abs=1e-9)

    def test_fal_run(self, docs):
        from pixeltable_spark.functions import fal
        rows = docs.select(r=fal.run(
            InlineDict({"prompt": docs.text}), app="fal-ai/flux")).collect()
        resp = json.loads(rows[0]["r"])
        assert resp["status"] == "COMPLETED" and resp["app"] == "fal-ai/flux"

    def test_image_gen_codec_backed(self):
        # round 5: generation providers return real procedural media
        import asyncio
        from pixeltable_spark.functions import bfl, twelvelabs
        from pixeltable_spark.functions import image_codec as ic
        img = asyncio.run(bfl.generate.async_fn("x"))
        assert ic.probe(img) is not None
        vec = asyncio.run(twelvelabs.embed_image.async_fn(img, model_name="m"))
        assert len(vec) == 16


class TestYolox:
    @pytest.fixture()
    def imgs(self, spark):
        return pxt.table_from_rows(
            spark, [{"media_id": i, "payload": bytes([i]) * 100}
                    for i in range(8)],
            "r4yolo", rowid_cols=["media_id"])

    def test_detection_shape_and_determinism(self, imgs):
        from pixeltable_spark.functions import yolox as yx
        q = imgs.select(imgs.media_id,
                        d=yx.yolox(imgs.payload, model_id="yolox_s"))
        a = {r["media_id"]: r["d"] for r in q.collect()}
        b = {r["media_id"]: r["d"] for r in q.collect()}
        assert a == b
        dets = [json.loads(v) for v in a.values()]
        assert any(d["bboxes"] for d in dets)  # some payloads produce boxes
        for d in dets:
            assert len(d["bboxes"]) == len(d["scores"]) == len(d["labels"])
            assert all(s >= 0.5 for s in d["scores"])
            assert all(0 <= lab < 80 for lab in d["labels"])

    def test_threshold_filters(self, imgs):
        from pixeltable_spark.functions import yolox as yx
        lo = imgs.select(d=yx.yolox(imgs.payload, model_id="yolox_s",
                                    threshold=0.5)).collect()
        hi = imgs.select(d=yx.yolox(imgs.payload, model_id="yolox_s",
                                    threshold=0.95)).collect()
        n_lo = sum(len(json.loads(r["d"])["bboxes"]) for r in lo)
        n_hi = sum(len(json.loads(r["d"])["bboxes"]) for r in hi)
        assert n_hi <= n_lo

    def test_bad_model_id_raises(self, imgs):
        from pixeltable_spark.functions import yolox as yx
        with pytest.raises(Exception, match="unknown model_id"):
            imgs.select(d=yx.yolox(imgs.payload, model_id="nope")).collect()

    def test_yolo_to_coco_pure_math(self):
        from pixeltable_spark.functions import yolox as yx
        dets = {"bboxes": [[10.2, 5.8, 30.4, 25.1]], "scores": [0.9],
                "labels": [17]}
        out = yx.yolo_to_coco.py_fn(dets)
        assert out == [{"bbox": [10, 6, 20, 19], "category": 17}]


class TestWhisperX:
    def test_alignment_and_diarization_shapes(self, spark):
        from pixeltable_spark.functions import whisperx as wx
        t = pxt.table_from_rows(
            spark, [{"media_id": 0, "payload": bytes(range(64)) * 1500}],
            "r4wx", rowid_cols=["media_id"])
        r = t.select(x=wx.transcribe(t.payload, model="large-v2",
                                     alignment=True,
                                     diarization=True)).collect()[0]
        res = json.loads(r["x"])
        assert res["language"] == "en"
        seg = res["segments"][0]
        assert seg["words"][0]["word"].startswith("segment[")
        assert seg["speaker"].startswith("SPEAKER_")

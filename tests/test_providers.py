"""Provider-module tests (reference tests/functions/test_openai.py /
test_anthropic.py shape — mock/offline transport): public signatures,
deterministic fake responses, async-runtime integration."""

from __future__ import annotations

import json

import pytest

import pixeltable_spark as pxt
from pixeltable_spark.exprs import InlineArray, InlineDict
from pixeltable_spark.functions import anthropic as apx
from pixeltable_spark.functions import huggingface as hf
from pixeltable_spark.functions import openai as oai


@pytest.fixture()
def docs(spark):
    rows = [(i, f"document body number {i}") for i in range(6)]
    return pxt.table_from_rows(
        spark, [{"doc_id": i, "text": t} for i, t in rows], "prov_docs",
        rowid_cols=["doc_id"])


def _msgs(t):
    return InlineArray([InlineDict({"role": "user", "content": t.text})])


class TestOpenAI:
    def test_chat_completions_shape_and_determinism(self, docs):
        q = docs.select(docs.doc_id,
                        r=oai.chat_completions(_msgs(docs), model="gpt-test"))
        a = {r["doc_id"]: json.loads(r["r"]) for r in q.collect()}
        b = {r["doc_id"]: json.loads(r["r"]) for r in q.collect()}
        assert a == b  # deterministic across runs
        resp = a[0]
        assert resp["object"] == "chat.completion"
        assert resp["model"] == "gpt-test"
        assert resp["choices"][0]["message"]["content"].startswith("response[")
        assert resp["usage"]["total_tokens"] == resp["usage"]["prompt_tokens"] + 1

    def test_embeddings_unit_norm(self, docs):
        q = docs.select(docs.doc_id, e=oai.embeddings(docs.text, model="emb-test"))
        rows = q.collect()
        assert all(len(r["e"]) == 16 for r in rows)
        for r in rows:
            assert sum(x * x for x in r["e"]) == pytest.approx(1.0, abs=1e-9)

    def test_moderations_shape(self, docs):
        r = docs.select(m=oai.moderations(docs.text)).limit(1).collect()[0]
        m = json.loads(r["m"])
        assert "results" in m and isinstance(m["results"][0]["flagged"], bool)

    def test_media_endpoints_codec_backed(self):
        import asyncio
        from pixeltable_spark.functions import audio_codec as ac
        wav = asyncio.run(oai.speech.async_fn("hi", model="tts-1", voice="alloy"))
        assert ac.probe(wav)["format"] == "WAV"


class TestAnthropic:
    def test_messages_shape(self, docs):
        q = docs.select(docs.doc_id,
                        r=apx.messages(_msgs(docs), model="claude-test",
                                       max_tokens=64))
        rows = {r["doc_id"]: json.loads(r["r"]) for r in q.collect()}
        resp = rows[3]
        assert resp["type"] == "message" and resp["role"] == "assistant"
        assert resp["content"][0]["type"] == "text"
        assert resp["content"][0]["text"].startswith("response[")
        assert resp["usage"]["input_tokens"] == 4

    def test_distinct_inputs_distinct_outputs(self, docs):
        rows = docs.select(r=apx.messages(_msgs(docs), model="claude-test")).collect()
        texts = {json.loads(r["r"])["content"][0]["text"] for r in rows}
        assert len(texts) == 6


class TestHuggingFaceLocal:
    def test_sentence_transformer_fallback_deterministic(self, docs):
        q = docs.select(docs.doc_id,
                        e=hf.sentence_transformer(docs.text, model_id="m1"))
        a = {r["doc_id"]: r["e"] for r in q.collect()}
        b = {r["doc_id"]: r["e"] for r in q.collect()}
        assert a == b and len(a[0]) == 16
        # model_id keys the embedding space
        c = docs.select(docs.doc_id,
                        e=hf.sentence_transformer(docs.text, model_id="m2")).collect()
        assert c[0]["e"] != a[0]

    def test_cross_encoder_returns_float(self, docs):
        rows = docs.select(s=hf.cross_encoder(docs.text, docs.text,
                                              model_id="ce1")).collect()
        assert all(isinstance(r["s"], float) for r in rows)

    def test_image_models_codec_backed(self):
        # round 5: detr runs offline as a deterministic geometric fake
        # over REAL probed dims (see tests/test_providers_round5.py)
        from pixeltable_spark.functions import _provider_util as pu
        img = pu.procedural_image("gate", 20, 10)
        det = hf.detr_for_object_detection.py_fn(img, model_id="x")
        assert det["boxes"] and all(b[2] <= 20 and b[3] <= 10
                                    for b in det["boxes"])


class TestAsyncRuntimeIntegration:
    def test_async_composes_with_downstream_exprs(self, docs):
        from pixeltable_spark.functions import string as pxs
        r = oai.chat_completions(_msgs(docs), model="m")
        content = r["choices"][0]["message"]["content"]
        q = docs.select(docs.doc_id, c=pxs.upper(content.astype(pxt.String())))
        rows = q.collect()
        assert len(rows) == 6
        assert all(row["c"].startswith("RESPONSE[") for row in rows)

    def test_async_in_computed_column(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh"))
        t = cat.create_table("d", {"k": pxt.Int(False), "txt": pxt.String()},
                             primary_key=["k"])
        t.insert([{"k": 1, "txt": "hello"}, {"k": 2, "txt": "world"}])
        from pixeltable_spark.exprs import ColumnRef
        txt = ColumnRef("txt", t.schema["txt"])
        t.add_computed_column(
            "emb", oai.embeddings(txt, model="emb-cc"),
            col_type=pxt.ColumnType.array(pxt.ColumnType.float_()))
        rows = t.collect()
        assert all(len(r["emb"]) == 16 for r in rows)

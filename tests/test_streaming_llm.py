"""Streaming incremental ingest + async inference runtime + tools tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import pixeltable_spark as pxt
from pixeltable_spark import streaming
from pixeltable_spark.exprs import ColumnRef
from pixeltable_spark.functions import llm, query, tools, invoke_tools
from pixeltable_spark.functions import vision


EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Write the sf0.001 events as a landing directory in two file drops."""
    src = pxt.table_from_parquet(spark, "/root/testdata/sf0.001/events.parquet").df()
    src = src.select("event_id", "ts", "user_id", "event_type", "value")
    d = str(tmp_path / "landing")
    src.filter(F.col("event_id") < 500).coalesce(1).write.mode("append").parquet(d)
    return d, src


class TestStreamingIngest:
    def test_incremental_ingest_into_table(self, spark, tmp_path, events_dir):
        d, src = events_dir
        cat = pxt.Catalog(spark, str(tmp_path / "wh"))
        t = cat.create_table("events", {
            "event_id": pxt.Int(False), "ts": pxt.Timestamp(True),
            "user_id": pxt.Int(True), "event_type": pxt.String(True),
            "value": pxt.Float(True),
        })
        t.add_computed_column("value2", ColumnRef("value", pxt.Float()) * 2)

        stream = streaming.stream_from_directory(spark, d, EVENTS_SCHEMA)
        q = streaming.incremental_ingest(stream, t, str(tmp_path / "ckpt"))
        q.awaitTermination()
        n1 = t.count()
        assert n1 == 500
        v1 = t.version

        # second file drop -> only the delta is processed (checkpoint)
        src.filter(F.col("event_id") >= 500).coalesce(1).write.mode("append").parquet(d)
        q = streaming.incremental_ingest(stream, t, str(tmp_path / "ckpt"))
        q.awaitTermination()
        assert t.count() == 1000
        assert t.version == v1 + 1  # exactly one more insert version
        # computed column evaluated on the streamed slices
        got = t.ref().df().filter(F.col("event_id") == 999).select("value", "value2").collect()[0]
        assert got.value2 == pytest.approx(got.value * 2)

    def test_windowed_counts_memory_sink(self, spark, events_dir):
        d, _ = events_dir
        stream = streaming.stream_from_directory(spark, d, EVENTS_SCHEMA)
        agg = streaming.windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        streaming.run_stream_to_memory(agg, "win_counts", output_mode="append")
        # append-mode emits only closed windows; just check the query ran and
        # the complete-mode run below yields real data
        agg2 = streaming.windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        q = (agg2.writeStream.outputMode("complete").format("memory")
             .queryName("win_all").trigger(availableNow=True).start())
        q.awaitTermination()
        rows = spark.sql("SELECT * FROM win_all").collect()
        assert len(rows) > 0
        assert sum(r.n for r in rows) == 500


class TestLLMRuntime:
    def test_chat_deterministic_and_repeatable(self, documents_df):
        df = documents_df.limit(20)
        out1 = {r.doc_id: r.response for r in
                llm.chat_completions(df, "text").select("doc_id", "response").collect()}
        out2 = {r.doc_id: r.response for r in
                llm.chat_completions(df, "text").select("doc_id", "response").collect()}
        assert out1 == out2
        assert all(v.startswith("response[") for v in out1.values())

    def test_chat_retry_on_transient_failure(self, documents_df):
        df = documents_df.limit(10)
        out = llm.chat_completions(
            df, "text",
            client_factory=lambda: llm.DeterministicFakeClient(fail_every=3),
        ).select("doc_id", "response", "_cellmd_response").collect()
        # retries recover every simulated 429 -> all rows succeed
        assert all(r.response is not None for r in out)
        assert all(r["_cellmd_response"].errortype is None for r in out)

    def test_embeddings_unit_norm(self, documents_df):
        import math
        df = documents_df.limit(5)
        out = llm.embeddings(df, "text", dim=8).select("doc_id", "embedding").collect()
        for r in out:
            assert len(r.embedding) == 8
            assert math.sqrt(sum(x * x for x in r.embedding)) == pytest.approx(1.0)


class TestQueryTemplateTools:
    def test_query_template_batch_join(self, spark, documents_df):
        documents_df.createOrReplaceTempView("docs_tpl")

        @query
        def docs_by_lang(lang: str):
            return (spark.table("docs_tpl").filter(F.col("lang") == lang)
                    .groupBy("lang").agg(F.count(F.lit(1)).alias("lang_docs")))

        probe = spark.createDataFrame([{"id": 1, "language": "en"},
                                       {"id": 2, "language": "de"}])
        joined = docs_by_lang.batch_join(probe, {"lang": "language"})
        got = {r.id: r.lang_docs for r in joined.collect()}
        en = documents_df.filter(F.col("lang") == "en").count()
        de = documents_df.filter(F.col("lang") == "de").count()
        assert got == {1: en, 2: de}

    def test_tools_spec_and_invoke(self):
        @pxt.udf
        def add(a: int, b: int) -> int:
            """Add two integers."""
            return a + b

        ts = tools(add)
        spec = ts[0].spec()
        assert spec["name"] == "add"
        assert spec["parameters"]["properties"]["a"]["type"] == "integer"
        resp = {"tool_calls": [
            {"name": "add", "arguments": json.dumps({"a": 2, "b": 40})},
            {"name": "missing", "arguments": "{}"},
        ]}
        out = invoke_tools(ts, resp)
        assert out[0]["result"] == 42
        assert "unknown tool" in out[1]["error"]


class TestVision:
    def test_bbox_iou_native(self, spark):
        df = spark.createDataFrame([{
            "a": [0.0, 0.0, 2.0, 2.0], "b": [1.0, 1.0, 3.0, 3.0],
        }])
        got = df.select(vision.bbox_iou(F.col("a"), F.col("b")).alias("iou")).collect()[0]
        assert got.iou == pytest.approx(1.0 / 7.0)

    def test_eval_detections(self, spark):
        df = spark.createDataFrame([{
            "image_id": 1,
            "pred_boxes": [[0.0, 0.0, 2.0, 2.0], [5.0, 5.0, 6.0, 6.0]],
            "pred_labels": [1, 2],
            "pred_scores": [0.9, 0.8],
            "gt_boxes": [[0.1, 0.1, 2.0, 2.0], [9.0, 9.0, 10.0, 10.0]],
            "gt_labels": [1, 3],
        }])
        got = vision.eval_detections(df).collect()[0]
        assert (got.tp, got.fp, got.fn) == (1, 1, 1)
        assert got.precision == pytest.approx(0.5)
        assert got.recall == pytest.approx(0.5)


class TestLLMBatching:
    def test_batched_embeddings_equal_unbatched(self, documents_df):
        df = documents_df.limit(30)
        single = {r.doc_id: r.embedding for r in
                  llm.embeddings(df, "text", dim=8).select("doc_id", "embedding").collect()}
        batched = {r.doc_id: r.embedding for r in
                   llm.embeddings(df, "text", dim=8, batch_size=7)
                   .select("doc_id", "embedding").collect()}
        assert single == batched

    def test_batched_failure_marks_whole_batch(self, documents_df):
        class FailOnce:
            def __init__(self):
                self.calls = 0

            async def embed_many(self, texts, model, dim=16, **kw):
                self.calls += 1
                raise llm.RetryableError("perma")

        out = llm.embeddings(documents_df.limit(6).coalesce(1), "text",
                             batch_size=3, client_factory=FailOnce)
        rows = out.select("embedding").collect()
        assert all(r.embedding is None for r in rows)


class TestMediaSurface:
    """New image/video/audio/vision fns: schema + determinism + null safety."""

    def _payload_df(self, spark):
        return spark.createDataFrame(
            [(1, b"\x89PNG-fake-payload-one"), (2, b"\x89PNG-other-payload"),
             (3, None)], "media_id long, payload binary")

    def test_image_extractors(self, spark):
        from pixeltable_spark.functions import image as img
        df = self._payload_df(spark)
        out = df.select(
            "media_id",
            img.entropy(F.col("payload")).alias("ent"),
            img.getbands(F.col("payload")).alias("bands"),
            img.getbbox(F.col("payload")).alias("bbox"),
            img.size(F.col("payload")).alias("sz"),
            img.histogram(F.col("payload")).alias("hist"),
        ).orderBy("media_id").collect()
        assert out[0].ent is not None and 0 <= out[0].ent < 8.0
        assert out[0].bbox[0] == 0 and out[0].bbox[2] == out[0].sz[0]
        assert len(out[0].hist) == 16
        assert all(v is None for v in (out[2].ent, out[2].bands, out[2].sz))

    def test_image_two_input_transforms(self, spark):
        from pixeltable_spark.functions import image as img
        df = self._payload_df(spark).withColumn("p2", F.col("payload"))
        out = df.select(
            "media_id",
            img.alpha_composite(F.col("payload"), F.col("p2")).alias("ac"),
            img.blend(F.col("payload"), F.col("p2"), 0.3).alias("bl"),
            img.composite(F.col("payload"), F.col("p2"), F.col("p2")).alias("cp"),
        ).orderBy("media_id").collect()
        assert out[0].ac is not None and out[0].ac != out[0].bl
        assert out[2].ac is None  # null payload propagates

    def test_video_edit_chain_deterministic(self, spark):
        from pixeltable_spark.functions import video as vid
        df = self._payload_df(spark)
        sel = df.select(
            "media_id",
            vid.resize(vid.fade_in(F.col("payload")), 64, 64).alias("v"),
            vid.get_duration(F.col("payload")).alias("dur"),
            vid.scene_detect(F.col("payload")).alias("cuts"),
        )
        a = {r.media_id: r.v for r in sel.collect()}
        b = {r.media_id: r.v for r in sel.collect()}
        assert a == b and a[1] is not None and a[3] is None
        row = sel.orderBy("media_id").first()
        assert row.dur > 0 and row.cuts == sorted(row.cuts)

    def test_video_segment_and_make_video(self, spark):
        from pixeltable_spark.functions import video as vid
        df = self._payload_df(spark)
        segs = vid.segment_video(df, n_segments=3)
        assert segs.where("media_id = 1").count() == 3
        frames = vid.frame_iterator(df, every_n=1)
        videos = vid.make_video(frames, "media_id")
        got = {r.media_id: r.n_frames for r in videos.collect()}
        assert set(got) == {1, 2} and all(n >= 1 for n in got.values())

    def test_audio_transforms(self, spark):
        from pixeltable_spark.functions import audio as aud
        df = self._payload_df(spark)
        out = df.select(
            "media_id",
            aud.normalize(F.col("payload")).alias("n"),
            aud.encode_audio(F.col("payload"), "aac").alias("e"),
        ).orderBy("media_id").collect()
        assert out[0].n != out[0].e and out[2].n is None

    def test_bbox_convert_roundtrip(self, spark):
        from pixeltable_spark.functions import vision as vis
        df = spark.createDataFrame([([10.0, 20.0, 50.0, 80.0],)], "box array<double>")
        out = df.select(
            vis.bboxes_convert(vis.bboxes_convert(F.col("box"), "xyxy", "cxcywh"),
                               "cxcywh", "xyxy").alias("rt"),
            vis.bboxes_convert(F.col("box"), "xyxy", "xywh").alias("xywh"),
            vis.bboxes_resize(F.col("box"), 100, 100, 200, 50).alias("rs"),
            vis.bboxes_crop(F.col("box"), 5, 5, 45, 45).alias("cr"),
        ).first()
        assert out.rt == pytest.approx([10.0, 20.0, 50.0, 80.0])
        assert out.xywh == pytest.approx([10.0, 20.0, 40.0, 60.0])
        assert out.rs == pytest.approx([20.0, 10.0, 100.0, 40.0])
        assert out.cr == pytest.approx([5.0, 15.0, 40.0, 40.0])

    def test_bboxes_draw_null_safety(self, spark):
        from pixeltable_spark.functions import vision as vis
        df = self._payload_df(spark).withColumn(
            "boxes", F.array(F.array(F.lit(1.0), F.lit(1.0), F.lit(2.0), F.lit(2.0))))
        out = df.select("media_id",
                        vis.bboxes_draw(F.col("payload"), F.col("boxes")).alias("d"),
                        vis.overlay_segmentation(F.col("payload"), F.col("payload")).alias("o"),
                        ).orderBy("media_id").collect()
        assert out[0].d is not None and out[2].d is None and out[0].o is not None

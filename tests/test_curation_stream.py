"""Streaming curation (streaming/incremental.py curation_stream):
stream ≡ batch on the same documents, per-file multi-batch replay, and
the pandas-UDF lang-id path agreeing with the python scorer."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pixeltable_spark import streaming
from pixeltable_spark.operators.langid import lang_id_udf, score_text

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog near the river."),
    (2, "Der Hund und die Katze spielen zusammen im Garten."),
    (3, "Contact me at alice@example.com for the details."),
    (4, "the " * 30 + "table row merge sort value data column"),
    (5, ""),
]


def _landing(tmp_path, spark):
    d = str(tmp_path / "docs_landing")
    os.makedirs(d, exist_ok=True)
    # two files -> two micro-batches with maxFilesPerTrigger=1
    for i, chunk in enumerate([DOCS[:3], DOCS[3:]]):
        spark.createDataFrame(chunk, DOC_SCHEMA).coalesce(1) \
            .write.mode("overwrite").parquet(f"{d}/part{i}")
    return d


class TestCurationStream:
    def test_stream_equals_batch(self, spark, tmp_path):
        d = _landing(tmp_path, spark)
        schema = DOC_SCHEMA
        stream = (spark.readStream.format("parquet").schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .load(d + "/part*"))
        out = streaming.curation_stream(stream)
        streaming.run_stream_to_memory(out, "cur_t1",
                                       output_mode="append")
        got = {r["doc_id"]: r for r in spark.table("cur_t1").collect()}
        batch = {r["doc_id"]: r for r in streaming.curation_stream(
            spark.createDataFrame(DOCS, schema)).collect()}
        assert set(got) == set(batch) == {1, 2, 3, 4, 5}
        for k in got:
            assert tuple(got[k]) == tuple(batch[k]), (k, got[k], batch[k])

    def test_verdicts(self, spark):
        rows = {r["doc_id"]: r for r in streaming.curation_stream(
            spark.createDataFrame(DOCS, DOC_SCHEMA)).collect()}
        assert rows[1]["lang_pred"] == "en" and not rows[1]["pii"]
        assert rows[2]["lang_pred"] == "de" and rows[2]["keep"] is False
        assert rows[3]["pii"] is True and rows[3]["keep"] is False
        assert rows[5]["lang_pred"] == "und"

    def test_udf_matches_python_scorer(self, spark):
        df = spark.createDataFrame(DOCS, DOC_SCHEMA)
        got = {r["doc_id"]: r["p"] for r in
               df.select("doc_id", lang_id_udf(F.col("text")).alias("p"))
               .collect()}
        for i, t in DOCS:
            assert got[i] == score_text(t), (i, got[i], score_text(t))

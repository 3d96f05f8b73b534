"""Pipeline-operator tests: dedup / similarity / text / multimodal /
document splitting invariants (the oracle equivalence itself is covered by
tools/check_correctness.py against DuckDB)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import pixeltable_spark as pxt
from pixeltable_spark.functions.document import document_splitter, string_splitter
from pixeltable_spark.operators import dedup, multimodal, similarity
from pixeltable_spark.operators import text as textops


class TestDedup:
    def test_exact_dedup_removes_dups(self, spark):
        rows = [{"doc_id": i, "text": f"doc {i % 3}"} for i in range(9)]
        df = spark.createDataFrame(rows)
        kept = dedup.dedup_exact(df)
        assert kept.count() == 3
        assert {r.doc_id for r in kept.collect()} == {0, 1, 2}

    def test_exact_dedup_normalizes_whitespace(self, spark):
        df = spark.createDataFrame([
            {"doc_id": 1, "text": "a  b   c"},
            {"doc_id": 2, "text": " a b c "},
            {"doc_id": 3, "text": "A B C"},     # case-insensitive fingerprint
            {"doc_id": 4, "text": "a b d"},
        ])
        groups = dedup.exact_dup_groups(df).collect()
        sizes = sorted(g.n_dups for g in groups)
        assert sizes == [1, 3]

    def test_minhash_identical_docs_same_sig(self, spark):
        text = "one two three four five six seven eight nine ten"
        df = spark.createDataFrame(
            [{"doc_id": 1, "text": text}, {"doc_id": 2, "text": text},
             {"doc_id": 3, "text": "totally different words here now ok yes no"}])
        sigs = {r.doc_id: (r.sig_0, r.sig_1) for r in
                dedup.minhash_signatures(df, num_hashes=2).collect()}
        assert sigs[1] == sigs[2]
        assert sigs[1] != sigs[3]

    def test_minhash_lsh_finds_identical(self, spark):
        text = "one two three four five six seven eight nine ten"
        df = spark.createDataFrame(
            [{"doc_id": 1, "text": text}, {"doc_id": 2, "text": text},
             {"doc_id": 3, "text": "totally different words here now ok yes no"}])
        pairs = {(r.id_a, r.id_b) for r in
                 dedup.minhash_lsh_pairs(df, num_hashes=4, bands=2).collect()}
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_simhash_similar_docs_close(self, spark):
        a = "the quick brown fox jumps over the lazy dog today"
        b = a + " tomorrow"  # one extra token
        df = spark.createDataFrame(
            [{"doc_id": 1, "text": a}, {"doc_id": 2, "text": b},
             {"doc_id": 3, "text": "entirely unrelated content about spark engines"}])
        sh = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
        ham12 = bin(sh[1] ^ sh[2]).count("1")
        ham13 = bin(sh[1] ^ sh[3]).count("1")
        assert ham12 < ham13

    def test_jaccard_exact_value(self, spark):
        # doc1: shingles {a b c, b c d}; doc2: {a b c}; inter=1 union=2 -> 0.5
        df = spark.createDataFrame(
            [{"doc_id": 1, "text": "a b c d"}, {"doc_id": 2, "text": "a b c"}])
        got = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.1).collect()
        assert len(got) == 1
        assert got[0].jaccard == pytest.approx(0.5)

    def test_embedding_near_dup_blas(self, spark):
        df = spark.createDataFrame([
            {"vec_id": 1, "embedding": [1.0, 0.0, 0.0]},
            {"vec_id": 2, "embedding": [0.999, 0.01, 0.0]},
            {"vec_id": 3, "embedding": [0.0, 1.0, 0.0]},
        ])
        pairs = {(r.id_a, r.id_b): r.cos for r in
                 dedup.embedding_near_dup_pairs(df, threshold=0.95).collect()}
        assert set(pairs) == {(1, 2)}
        assert pairs[(1, 2)] > 0.99


class TestSimilarity:
    def test_topk_exact(self, spark):
        df = spark.createDataFrame([
            {"vec_id": i, "embedding": [math.cos(i / 10), math.sin(i / 10)]}
            for i in range(50)
        ])
        got = similarity.topk_cosine(df, [1.0, 0.0], k=3).collect()
        assert [r.vec_id for r in got] == [0, 1, 2]
        assert got[0].cos == pytest.approx(1.0)

    def test_topk_plan_is_take_ordered(self, embeddings_df):
        """orderBy+limit must plan as TakeOrderedAndProject (partition-local
        top-k), never a global sort."""
        df = similarity.topk_cosine(embeddings_df, [0.1] * 64, k=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan

    def test_ann_subset_of_exact(self, embeddings_df):
        q = [0.05 * ((i % 7) - 3) for i in range(64)]
        exact = [r.vec_id for r in similarity.topk_cosine(embeddings_df, q, k=100).collect()]
        ann = similarity.ann_topk_cosine(embeddings_df, q, k=10, n_planes=2).collect()
        assert len(ann) == 10
        # every ANN hit is a genuinely high-cos vector (top-100 exact)
        assert all(r.vec_id in exact[:100] for r in ann[:3])

    def test_knn_join_self_rank1(self, spark):
        df = spark.createDataFrame([
            {"vec_id": i, "embedding": [float(i + 1), float(i * 2 + 1)]}
            for i in range(10)
        ])
        got = similarity.knn_join(df, df, k=1).collect()
        for r in got:
            assert r.rid == r.lid and r.rk == 1 and r.cos == pytest.approx(1.0)

    def test_hyperplane_bucket_range(self, embeddings_df):
        got = embeddings_df.select(
            similarity.hyperplane_bucket(F.col("embedding"), 3).alias("b")).collect()
        assert all(0 <= r.b < 8 for r in got)


class TestText:
    def test_token_count(self, spark):
        df = spark.createDataFrame([
            {"doc_id": 1, "text": "one two  three"},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "   "},
            {"doc_id": 4, "text": "single"},
        ])
        got = {r.doc_id: r.n for r in
               df.select("doc_id", textops.token_count(F.col("text")).alias("n")).collect()}
        assert got == {1: 3, 2: 0, 3: 0, 4: 1}

    def test_lang_id_model_based(self, spark):
        # round 7: lang_id is the char-n-gram Naive Bayes model
        # (operators/langid.py); 'und' only for empty/whitespace text
        df = spark.createDataFrame([
            {"doc_id": 1, "text": "the cat and the dog is in that house"},
            {"doc_id": 2, "text": "der hund und die katze ist nicht ein tier"},
            {"doc_id": 3, "text": "   "},
        ])
        got = {r.doc_id: r.lang for r in
               df.select("doc_id", textops.lang_id(F.col("text")).alias("lang")).collect()}
        assert got == {1: "en", 2: "de", 3: "und"}

    def test_fingerprint_normalization(self, spark):
        df = spark.createDataFrame([
            {"doc_id": 1, "text": "Hello   World"},
            {"doc_id": 2, "text": " hello world "},
        ])
        got = [r.fp for r in
               df.select(textops.fingerprint(F.col("text")).alias("fp")).collect()]
        assert got[0] == got[1]

    def test_quality_range(self, documents_df):
        got = documents_df.select(
            textops.quality_score(F.col("text")).alias("q")).collect()
        assert all(0.0 <= r.q <= 1.0 for r in got)


class TestDocumentSplitter:
    def test_chunks_cover_and_overlap(self, spark):
        text = " ".join(f"w{i}" for i in range(95))
        df = spark.createDataFrame([{"doc_id": 1, "text": text}])
        got = document_splitter(df, chunk_tokens=50, overlap=10).orderBy("pos").collect()
        assert [r.pos for r in got] == [0, 1, 2]
        assert got[0].start_token == 0 and got[1].start_token == 40
        assert got[0].n_chunk_tokens == 50
        assert got[2].n_chunk_tokens == 95 - 80
        # overlap: last 10 tokens of chunk0 == first 10 of chunk1
        assert got[0].chunk.split()[40:] == got[1].chunk.split()[:10]

    def test_string_splitter(self, spark):
        df = spark.createDataFrame([{"doc_id": 1, "text": "a\n\nb\n\nc"}])
        got = string_splitter(df).orderBy("pos").collect()
        assert [(r.pos, r.segment) for r in got] == [(0, "a"), (1, "b"), (2, "c")]


class TestMultimodal:
    def test_metadata_deterministic(self, spark):
        df = spark.createDataFrame([{"doc_id": 1, "text": "hello"},
                                    {"doc_id": 2, "text": "hello"},
                                    {"doc_id": 3, "text": "other"}])
        out = multimodal.extract_image_metadata(
            multimodal.documents_as_binary(df)).collect()
        by_id = {r.doc_id: r.image_meta for r in out}
        assert by_id[1] == by_id[2]
        assert by_id[1].n_bytes == 5
        assert 64 <= by_id[1].width <= 255

    def test_null_payload(self, spark):
        from pyspark.sql import types as T
        df = spark.createDataFrame(
            [(1, None)],
            T.StructType([T.StructField("doc_id", T.LongType()),
                          T.StructField("payload", T.BinaryType())]))
        out = multimodal.extract_image_metadata(df).collect()
        assert out[0].image_meta.width is None

    def test_frame_sampling_explodes(self, spark):
        df = spark.createDataFrame([{"media_id": 1, "text": "x" * 2000}])
        df = df.withColumn("payload", F.encode(F.col("text"), "utf-8"))
        frames = multimodal.sample_video_frames(df, every_n=2).collect()
        # 2000 bytes -> 7 stub frames -> sampled at stride 2 -> 4
        assert len(frames) == 4
        assert [f.frame_idx for f in frames] == [0, 2, 4, 6]

"""Web-curation operators (URL canonicalization, domain filtering/caps),
cross-document line dedup (CCNet), and DSIR importance weighting."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pixeltable_spark.operators.dedup import dedup_lines, line_doc_freq
from pixeltable_spark.operators.text import (
    dsir_model,
    dsir_score,
    hashed_word_features,
)
from pixeltable_spark.operators.web import (
    canonicalize_url,
    cap_per_domain,
    domain_counts,
    filter_blocked_domains,
    registered_domain,
    strip_tracking_params,
    url_host,
    url_path,
    url_query,
)


def _one(spark, url, col):
    return (spark.createDataFrame([(url,)], ["url"])
            .select(col.alias("v")).collect()[0]["v"])


class TestUrlParts:
    def test_host_port_userinfo(self, spark):
        assert _one(spark, "HTTP://User:p@WWW.Ex.COM:8080/A/b?q=1#f",
                    url_host(F.col("url"))) == "www.ex.com"

    def test_path_and_query(self, spark):
        u = "https://ex.com/a/b%20c?x=1&y=2#frag"
        assert _one(spark, u, url_path(F.col("url"))) == "/a/b%20c"
        assert _one(spark, u, url_query(F.col("url"))) == "x=1&y=2"

    def test_no_path_no_query(self, spark):
        assert _one(spark, "https://ex.com", url_path(F.col("url"))) == ""
        assert _one(spark, "https://ex.com", url_query(F.col("url"))) == ""


class TestCanonicalize:
    def test_variants_collapse(self, spark):
        variants = [
            "HTTP://WWW.Example.com/a/?utm_source=tw&b=1#x",
            "http://example.com/a/?b=1",
            "http://example.com/a?b=1&utm_campaign=z",
            "http://EXAMPLE.COM/a?gclid=abc&b=1",
        ]
        df = spark.createDataFrame([(u,) for u in variants], ["url"])
        got = {r["c"] for r in
               df.select(canonicalize_url(F.col("url")).alias("c")).collect()}
        assert got == {"http://example.com/a?b=1"}

    def test_param_sorting(self, spark):
        a = _one(spark, "https://e.com/p?z=1&a=2",
                 canonicalize_url(F.col("url")))
        b = _one(spark, "https://e.com/p?a=2&z=1",
                 canonicalize_url(F.col("url")))
        assert a == b == "https://e.com/p?a=2&z=1"

    def test_ports(self, spark):
        assert _one(spark, "http://e.com:80/a", canonicalize_url(F.col("url"))) \
            == "http://e.com/a"
        assert _one(spark, "https://e.com:443/a", canonicalize_url(F.col("url"))) \
            == "https://e.com/a"
        assert _one(spark, "http://e.com:8080/a", canonicalize_url(F.col("url"))) \
            == "http://e.com:8080/a"

    def test_strip_tracking_only(self, spark):
        q = _one(spark, "https://e.com/p?utm_source=x&utm_medium=y",
                 strip_tracking_params(url_query(F.col("url"))))
        assert q == ""


class TestRegisteredDomain:
    def test_etld1(self, spark):
        cases = {
            "a.b.example.com": "example.com",
            "example.com": "example.com",
            "news.bbc.co.uk": "bbc.co.uk",
            "bbc.co.uk": "bbc.co.uk",
            "10.1.2.3": "10.1.2.3",
            "localhost": "localhost",
        }
        df = spark.createDataFrame([(h,) for h in cases], ["h"])
        got = dict(df.select("h", registered_domain(F.col("h")).alias("d"))
                   .collect())
        assert got == cases


class TestDomainOps:
    def _corpus(self, spark):
        rows = [(i, f"https://{'sub.' if i % 2 else ''}site{i % 3}.com/p/{i}")
                for i in range(12)]
        return spark.createDataFrame(rows, ["doc_id", "url"])

    def test_domain_counts(self, spark):
        got = {r["domain"]: r["n_docs"]
               for r in domain_counts(self._corpus(spark)).collect()}
        assert got == {"site0.com": 4, "site1.com": 4, "site2.com": 4}

    def test_blocklist_literal_and_df(self, spark):
        df = self._corpus(spark)
        lit = filter_blocked_domains(df, ["site0.com"])
        assert lit.count() == 8
        bl = spark.createDataFrame([("site0.com",), ("site1.com",)], ["d"])
        assert filter_blocked_domains(df, bl).count() == 4
        # non-blocked rows untouched
        assert {r["doc_id"] for r in lit.collect()} == \
            {i for i in range(12) if i % 3 != 0}

    def test_cap_per_domain_deterministic(self, spark):
        capped = cap_per_domain(self._corpus(spark), max_docs=2)
        got = sorted(r["doc_id"] for r in capped.collect())
        # lowest doc_id per domain kept: site0 -> 0,3  site1 -> 1,4  site2 -> 2,5
        assert got == [0, 1, 2, 3, 4, 5]


class TestLineDedup:
    def _docs(self, spark):
        boiler = "accept cookies"
        rows = [
            (1, f"{boiler}\nunique one\ncommon tail"),
            (2, f"{boiler}\nunique two\ncommon tail"),
            (3, f"{boiler}\nunique three"),
            (4, "all original\n\nwith empty line"),
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_doc_freq(self, spark):
        freq = line_doc_freq(self._docs(spark))
        by_key = {r["line_key"]: r["doc_freq"] for r in freq.collect()}
        import hashlib
        k = hashlib.md5(b"accept cookies").hexdigest()
        assert by_key[k] == 3
        assert by_key[hashlib.md5(b"common tail").hexdigest()] == 2

    def test_dedup_lines_scrubs_boilerplate(self, spark):
        out = {r["doc_id"]: r["text"]
               for r in dedup_lines(self._docs(spark), max_doc_freq=2).collect()}
        assert out[1] == "unique one\ncommon tail"   # freq 2 <= cap stays
        assert out[3] == "unique three"
        assert out[4] == "all original\n\nwith empty line"  # empty preserved

    def test_whole_doc_scrubbed_survives_as_empty(self, spark):
        df = spark.createDataFrame(
            [(i, "same line") for i in range(4)], ["doc_id", "text"])
        out = dedup_lines(df, max_doc_freq=2)
        assert out.count() == 4
        assert {r["text"] for r in out.collect()} == {""}

    def test_duplicate_lines_within_doc_counted_once(self, spark):
        # a line repeated inside ONE doc must not count as multi-doc
        df = spark.createDataFrame(
            [(1, "x\nx\nx"), (2, "y")], ["doc_id", "text"])
        out = {r["doc_id"]: r["text"]
               for r in dedup_lines(df, max_doc_freq=1).collect()}
        assert out[1] == "x\nx\nx"


class TestDsir:
    def test_hash_buckets_in_range(self, spark):
        df = spark.createDataFrame([("hello world spam ham",)], ["text"])
        arr = df.select(hashed_word_features(F.col("text"), 64).alias("a")) \
                .collect()[0]["a"]
        assert len(arr) == 4 and all(0 <= b < 64 for b in arr)

    def test_target_like_docs_score_higher(self, spark):
        target = spark.createDataFrame(
            [(f"alpha beta gamma delta {i}",) for i in range(20)], ["text"])
        raw = spark.createDataFrame(
            [(i, "alpha beta gamma delta") if i < 5 else
         (i, "zig zag zog zug") for i in range(10)],
            ["doc_id", "text"])
        model = dsir_model(raw, target, n_buckets=256)
        scores = {r["doc_id"]: r["dsir_score"]
                  for r in dsir_score(raw, model, n_buckets=256).collect()}
        assert min(scores[i] for i in range(5)) > \
            max(scores[i] for i in range(5, 10))

    def test_model_bounded_and_finite(self, spark):
        target = spark.createDataFrame([("a b c",)], ["text"])
        raw = spark.createDataFrame([(1, "d e f")], ["doc_id", "text"])
        model = dsir_model(raw, target, n_buckets=32)
        rows = model.collect()
        assert len(rows) <= 32
        assert all(math.isfinite(r["log_ratio"]) for r in rows)


class TestBowEmbedding:
    def test_column_matches_scalar_twin(self, spark):
        from pixeltable_spark.operators.similarity import (
            bow_embedding_py, bow_embeddings)
        rows = [(1, "alpha beta gamma"), (2, "Delta  epsilon"), (3, "")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r["doc_id"]: r["embedding"]
               for r in bow_embeddings(df, dim=16).collect()}
        for i, txt in rows[:2]:
            assert got[i] == bow_embedding_py(txt, 16)
        assert 3 not in got  # no tokens -> no row (like the oracle)

    def test_similar_texts_similar_vectors(self, spark):
        from pixeltable_spark.operators.similarity import bow_embedding_py
        a = bow_embedding_py("the quick brown fox jumps over the lazy dog")
        b = bow_embedding_py("the quick brown fox leaps over the lazy cat")
        c = bow_embedding_py("completely unrelated words entirely elsewhere")
        cos = lambda x, y: sum(p * q for p, q in zip(x, y))
        assert cos(a, b) > cos(a, c) + 0.3

    def test_hf_fallback_uses_real_model(self, spark):
        # the sentence_transformer fallback must inherit token-level
        # similarity (the old whole-text md5 stub had none)
        from pixeltable_spark.functions.huggingface import _md5_embed
        a = _md5_embed("shared tokens here mostly", "m")
        b = _md5_embed("shared tokens here too", "m")
        c = _md5_embed("nothing in common at all", "m")
        cos = lambda x, y: sum(p * q for p, q in zip(x, y))
        assert cos(a, b) > cos(a, c) + 0.3


class TestQualityClassifier:
    def _corpora(self, spark):
        pos = spark.createDataFrame(
            [(f"insightful analysis careful prose section {i}",)
             for i in range(40)], ["text"])
        neg = spark.createDataFrame(
            [(f"click here buy now cheap deal spam {i}",)
             for i in range(40)], ["text"])
        return pos, neg

    def test_train_is_deterministic(self, spark):
        from pixeltable_spark.operators.quality_clf import (
            train_quality_classifier)
        pos, neg = self._corpora(spark)
        w1 = train_quality_classifier(pos, neg, n_buckets=64, iters=20)
        w2 = train_quality_classifier(pos, neg, n_buckets=64, iters=20)
        assert w1 == w2 and len(w1) == 65

    def test_separates_classes(self, spark):
        from pixeltable_spark.operators.quality_clf import (
            classify_quality, train_quality_classifier)
        pos, neg = self._corpora(spark)
        w = train_quality_classifier(pos, neg, n_buckets=64, iters=100, lr=2.0)
        test = spark.createDataFrame(
            [(1, "careful insightful section of analysis"),
             (2, "buy cheap spam deal now")], ["doc_id", "text"])
        got = {r["doc_id"]: r for r in classify_quality(test, w).collect()}
        assert got[1]["quality_p"] > 0.7 and got[1]["keep"]
        assert got[2]["quality_p"] < 0.3 and not got[2]["keep"]

    def test_scoring_plan_is_jvm_only(self, spark):
        from pixeltable_spark.operators.quality_clf import classify_quality
        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        plan = classify_quality(df, [0.0] * 65)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_empty_text_scores_bias_only(self, spark):
        import math

        from pixeltable_spark.operators.quality_clf import classify_quality
        w = [1.0] * 64 + [0.25]
        df = spark.createDataFrame([(1, ""), (2, "   ")], ["doc_id", "text"])
        got = classify_quality(df, w).collect()
        exp = 1.0 / (1.0 + math.exp(-0.25))
        assert all(abs(r["quality_p"] - exp) < 1e-12 for r in got)

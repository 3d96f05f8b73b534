"""Language-id model gates (operators/langid.py): held-out accuracy,
engine agreement (Spark == pure-python scorer == DuckDB oracle
fragment), determinism, and 'und' semantics."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.langid import (char_ngrams, lang_id,
                                               langid_ctes, langid_model,
                                               score_text)
from pixeltable_spark.operators.langid_seed import TEST, TEST2, TRAIN


class TestModel:
    def test_corpus_shape(self):
        """>= 60 TRAIN sentences/language across multiple registers
        (narrative + instructional + news + conversational), and an
        out-of-domain TEST2 written independently of TRAIN's topics."""
        assert set(TRAIN) == set(TEST) == set(TEST2)
        assert all(len(v) >= 60 for v in TRAIN.values())
        assert all(len(v) >= 9 for v in TEST2.values())

    def test_train_accuracy_perfect(self):
        ok = sum(1 for lg, ts in TRAIN.items() for t in ts
                 if score_text(t) == lg)
        assert ok == sum(len(v) for v in TRAIN.values())

    def test_heldout_accuracy_at_least_95pct(self):
        tot = sum(len(v) for v in TEST.values())
        ok = sum(1 for lg, ts in TEST.items() for t in ts
                 if score_text(t) == lg)
        assert ok / tot >= 0.95, f"held-out accuracy {ok}/{tot}"

    def test_out_of_domain_accuracy_at_least_90pct(self):
        """The generalization gate (round-7 verdict: the 99% held-out
        number shared authorship/domain with TRAIN; this set is
        wildlife/astronomy/history/sport in a different register)."""
        tot = sum(len(v) for v in TEST2.values())
        misses = [(lg, score_text(t)) for lg, ts in TEST2.items()
                  for t in ts if score_text(t) != lg]
        assert (tot - len(misses)) / tot >= 0.90, f"OOD misses: {misses}"

    def test_close_pair_es_pt_it_contrast(self):
        """The classic close-pair confusion (round-7 probe missed
        es->pt): every es/pt/it sentence in BOTH eval sets must stay in
        its own language."""
        for S in (TEST, TEST2):
            for lg in ("es", "pt", "it"):
                for t in S[lg]:
                    assert score_text(t) == lg, (lg, t, score_text(t))

    def test_deterministic_weights(self):
        langs1, w1, b1 = langid_model()
        langid_model.cache_clear()
        langs2, w2, b2 = langid_model()
        assert langs1 == langs2 and w1 == w2 and b1 == b2

    def test_und_for_gramless_text(self):
        assert score_text("") == "und"
        assert score_text(" \t\n ") == "und"
        assert char_ngrams("") == []
        # single char still has 1-grams -> classified, not 'und'
        assert score_text("a") != "und"


class TestSparkAgreement:
    def test_spark_matches_python_on_heldout(self, spark):
        rows = [(f"{lg}-{i}", t) for lg, ts in TEST.items()
                for i, t in enumerate(ts)]
        rows += [("e-0", ""), ("e-1", " \t "),
                 ("e-2", "The   mixed\twhitespace\n text")]
        df = spark.createDataFrame(rows, "id string, text string")
        got = {r["id"]: r["p"]
               for r in df.select(
                   "id", lang_id(F.col("text")).alias("p")).collect()}
        for rid, t in rows:
            assert got[rid] == score_text(t), (rid, got[rid], score_text(t))


class TestDuckDBAgreement:
    def test_oracle_ctes_match_python(self):
        rows = [(i, t) for i, t in enumerate(
            [t for ts in TEST.values() for t in ts[:4]]
            + ["", "  ", "the quick brown fox"])]
        con = duckdb.connect()
        con.execute("CREATE TABLE docs (doc_id INT, text VARCHAR)")
        con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
        sql = (f"WITH {langid_ctes('docs', 'doc_id')} "
               f"SELECT doc_id, lang_pred FROM lgpred ORDER BY doc_id")
        got = dict(con.sql(sql).fetchall())
        for i, t in rows:
            assert got[i] == score_text(t), (t[:40], got[i], score_text(t))


class TestTablePath:
    def test_lang_id_table_matches_scalar(self, spark):
        from pixeltable_spark.operators.langid import lang_id_table
        rows = [(i, t) for i, t in enumerate(
            [t for ts in TEST.values() for t in ts[:3]] + ["", "  "])]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        tbl = {r["doc_id"]: r["lang_pred"]
               for r in lang_id_table(df, "doc_id", "text").collect()}
        scl = {r["doc_id"]: r["p"]
               for r in df.select("doc_id",
                                  lang_id(F.col("text")).alias("p"))
               .collect()}
        assert tbl == scl
        for i, t in rows:
            assert tbl[i] == score_text(t)


class TestCuration:
    def test_english_word_soup_classifies_en(self, spark):
        # the driver documents table is English-ish word soup; the q89
        # curation pipeline filters lang_pred == 'en', so the model must
        # call such text English
        soup = ("merge key sort column fast value stream window query "
                "data table row small group the a scan batch")
        assert score_text(soup) == "en"

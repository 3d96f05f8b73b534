"""top_paths / transition_matrix (operators/timeseries.py) and
vocab_divergence (operators/text.py): hand-built expectations, short
streams, JS divergence bounds and symmetry."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.text import vocab_divergence
from pixeltable_spark.operators.timeseries import (
    top_paths,
    transition_matrix,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture()
def stream(spark):
    rows = [
        (1, _ts(0), 0, "A"), (1, _ts(1), 1, "B"), (1, _ts(2), 2, "C"),
        (1, _ts(3), 3, "A"), (1, _ts(4), 4, "B"),
        (2, _ts(0), 5, "A"), (2, _ts(1), 6, "B"), (2, _ts(2), 7, "C"),
        (3, _ts(0), 8, "X"),          # too short for any trigram
    ]
    return spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"])


class TestTopPaths:
    def test_trigrams(self, spark, stream):
        out = {r["path"]: r["n"]
               for r in top_paths(stream, "ts", "event_type", n=3,
                                  order_cols=["event_id"]).collect()}
        # u1: A>B>C, B>C>A, C>A>B; u2: A>B>C
        assert out == {"A>B>C": 2, "B>C>A": 1, "C>A>B": 1}

    def test_rank_and_cut(self, spark, stream):
        rows = top_paths(stream, "ts", "event_type", n=2, k=2,
                         order_cols=["event_id"]).collect()
        assert [r["rnk"] for r in sorted(rows, key=lambda r: r["rnk"])] \
            == [1, 2]
        assert rows[0]["path"] == "A>B"   # 3 occurrences, top

    def test_short_streams_excluded(self, spark, stream):
        out = top_paths(stream, "ts", "event_type", n=5).collect()
        assert out[0]["path"] == "A>B>C>A>B" and len(out) == 1

    def test_validation(self, spark, stream):
        with pytest.raises(ValueError):
            top_paths(stream, "ts", "event_type", n=0)


class TestTransitionMatrix:
    def test_probs(self, spark, stream):
        out = {(r["cur"], r["nxt"]): (r["n"], r["prob"])
               for r in transition_matrix(stream, "ts", "event_type",
                                          order_cols=["event_id"])
               .collect()}
        # from A: ->B x3 (u1 twice, u2 once); from B: ->C x2;
        # from C: ->A x1 (u1 only; u2's C is terminal)
        assert out[("A", "B")] == (3, 1.0)
        assert out[("B", "C")] == (2, 1.0)
        assert out[("C", "A")] == (1, 1.0)
        assert ("X", None) not in out  # terminal events emit nothing

    def test_row_normalization(self, spark):
        rows = [(1, _ts(i), i, t) for i, t in
                enumerate(["A", "B", "A", "C", "A", "B"])]
        df = spark.createDataFrame(
            rows, ["user_id", "ts", "event_id", "event_type"])
        out = {(r["cur"], r["nxt"]): r["prob"]
               for r in transition_matrix(df, "ts", "event_type",
                                          order_cols=["event_id"])
               .collect()}
        # A -> B twice, A -> C once
        assert out[("A", "B")] == pytest.approx(2 / 3, abs=1e-6)
        assert out[("A", "C")] == pytest.approx(1 / 3, abs=1e-6)


class TestVocabDivergence:
    def _df(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])

    def test_identical_corpora_near_zero(self, spark):
        a = self._df(spark, ["x y z", "x y"])
        out = vocab_divergence(a, a).collect()[0]
        assert out["js_divergence"] == pytest.approx(0.0, abs=1e-9)
        assert out["vocab_a"] == out["vocab_b"] == out["vocab_union"] == 3
        assert out["tokens_a"] == out["tokens_b"] == 5

    def test_disjoint_bounded_by_ln2(self, spark):
        a = self._df(spark, ["aa bb cc"] * 4)
        b = self._df(spark, ["dd ee ff"] * 4)
        out = vocab_divergence(a, b, smoothing=0.01).collect()[0]
        assert 0.8 * math.log(2) < out["js_divergence"] <= math.log(2)
        assert out["vocab_union"] == 6

    def test_symmetric(self, spark):
        a = self._df(spark, ["x y z z", "w"])
        b = self._df(spark, ["x q q", "z"])
        ab = vocab_divergence(a, b).collect()[0]["js_divergence"]
        ba = vocab_divergence(b, a).collect()[0]["js_divergence"]
        assert ab == pytest.approx(ba, abs=2e-6)
        assert ab > 0


class TestCharEntropy:
    def test_hand_computed(self, spark):
        from pixeltable_spark.operators.text import char_entropy
        df = spark.createDataFrame(
            [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
            ["doc_id", "text"])
        out = {r["doc_id"]: (r["n_chars"], r["entropy"], r["is_low"])
               for r in char_entropy(df).collect()}
        assert out[1] == (4, 0.0, True)           # single char
        assert out[2] == (4, round(math.log(2), 6), True)
        assert out[3] == (4, round(math.log(4), 6), True)
        assert out[4] == (0, 0.0, True)           # empty doc
        # uniform over k chars == ln k exactly

    def test_natural_text_not_low(self, spark):
        from pixeltable_spark.operators.text import char_entropy
        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog")],
            ["doc_id", "text"])
        r = char_entropy(df).collect()[0]
        assert r["entropy"] > 3.0 and r["is_low"] is False


class TestCollocations:
    def test_pmi_hand_computed(self, spark):
        from pixeltable_spark.operators.text import collocations
        # 20 bigrams total; min_count=2 keeps (new,york) 7, (york,new) 5,
        # (york,the) 2, (the,cat) 2. PMI discounts frequent marginals:
        # (the,cat) = ln(20*2/(3*2)) tops (new,york) = ln(20*7/(7*7)).
        docs = ["new york " * 6 + "the cat sat",
                "the dog ran new york the cat"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"])
        out = {(r["a"], r["b"]): (r["n_ab"], r["pmi"], r["rnk"])
               for r in collocations(df, k=5, min_count=2).collect()}
        assert out[("the", "cat")] == \
            (2, round(math.log(20 * 2 / (3 * 2)), 6), 1)
        assert out[("new", "york")][0] == 7
        assert out[("new", "york")][1] == \
            round(math.log(20 * 7 / (7 * 7)), 6)
        # (new,york) and (york,the) tie on PMI; alphabetical tiebreak
        assert out[("new", "york")][2] == 2
        assert out[("york", "the")][2] == 3
        assert out[("york", "new")][2] == 4

    def test_min_count_floor(self, spark):
        from pixeltable_spark.operators.text import collocations
        df = spark.createDataFrame(
            [(1, "rare pair common common common common")],
            ["doc_id", "text"])
        out = collocations(df, k=10, min_count=2).collect()
        assert all(r["n_ab"] >= 2 for r in out)
        assert ("rare", "pair") not in {(r["a"], r["b"]) for r in out}

    def test_validation(self, spark):
        from pixeltable_spark.operators.text import collocations
        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            collocations(df, k=0)

"""Interpolated Kneser–Ney bigram LM (operators/ngram_lm.py) — the
CCNet perplexity-filter method (Wenzek et al. 2020), word-level with
vocab cap and <unk> closure. The load-bearing property: with the
add-one continuation smoothing, P(·|w1) is an EXACT probability
distribution over vocab ∪ {<unk>} for every seen context (the
telescoping Σ pcont = 1), so perplexities are comparable across docs
and the head/middle/tail buckets are meaningful."""
import math

import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.ngram_lm import (UNK, kn_perplexity,
                                                 perplexity_buckets,
                                                 train_kn_bigram)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat ate the fish"),
    (3, "a dog ate a bone"),
    (4, "the fish swam in the sea"),
    (5, "a cat and a dog"),
    (6, "the mat was on the floor"),
    (7, "dogs and cats live here"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.fixture(scope="module")
def model(corpus):
    return train_kn_bigram(corpus, vocab_size=10, discount=0.75)


class TestKNModel:
    def test_distribution_sums_to_one(self, spark, model):
        """For EVERY seen context w1, Σ_{w2 ∈ vocab ∪ <unk>} P(w2|w1)
        must be exactly 1 (to float ulp): the discounted mass
        D·nfollow/ctx is redistributed over pcont, and Σ pcont = 1 by
        the add-one construction. This is the property a naive
        backoff implementation silently loses."""
        d = model.discount
        ctxs = model.contexts.collect()
        assert len(ctxs) >= 3
        big = {(r["w1"], r["w2"]): r["c"] for r in model.bigrams.collect()}
        pc = {r["w2"]: r["pc"] for r in model.pcont.collect()}
        assert abs(sum(pc.values()) - 1.0) < 1e-9
        for r in ctxs:
            w1, ctx, nf = r["w1"], r["ctx"], r["nfollow"]
            total = 0.0
            for w2, p in pc.items():
                c = big.get((w1, w2), 0)
                total += max(c - d, 0.0) / ctx + d * nf / ctx * p
            assert abs(total - 1.0) < 1e-9, (w1, total)

    def test_vocab_cap_maps_to_unk(self, corpus):
        m = train_kn_bigram(corpus, vocab_size=3)
        toks = {r["tok"] for r in m.vocab.collect()}
        assert len(toks) == 3 and "the" in toks  # most frequent token
        # rare words trained as <unk>: the bigram table contains it
        w2s = {r["w2"] for r in m.bigrams.collect()}
        assert UNK in w2s

    def test_training_partition_invariant(self, spark, corpus, model):
        m2 = train_kn_bigram(corpus.repartition(7), vocab_size=10,
                             discount=0.75)
        a = sorted((r["w1"], r["w2"], r["c"])
                   for r in model.bigrams.collect())
        b = sorted((r["w1"], r["w2"], r["c"])
                   for r in m2.bigrams.collect())
        assert a == b


class TestPerplexity:
    def test_in_domain_beats_oov_junk(self, spark, corpus):
        # a vocab that covers the corpus — with a tiny cap (vocab 10
        # over ~30 types) most training mass is <unk> and junk text
        # becomes "probable", which is faithful KN behavior but not
        # the property under test
        m = train_kn_bigram(corpus, vocab_size=40)
        docs = spark.createDataFrame(
            [(0, "the cat sat on the mat"),
             (1, "zzz qqq xxx yyy www vvv")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r["ppl"]
                for r in kn_perplexity(docs, m).collect()}
        assert rows[0] < rows[1]
        assert all(math.isfinite(v) and v > 1 for v in rows.values())

    def test_matches_python_replay(self, spark, model):
        """Spark scoring == a pure-python replay of the same formula
        over the collected model (cell-exact after the round-4)."""
        text = "the dog ate the unseen fish"
        docs = spark.createDataFrame([(0, text)],
                                     "doc_id long, text string")
        got = kn_perplexity(docs, model).collect()[0]
        big = {(r["w1"], r["w2"]): r["c"] for r in model.bigrams.collect()}
        ctx = {r["w1"]: (r["ctx"], r["nfollow"])
               for r in model.contexts.collect()}
        pc = {r["w2"]: r["pc"] for r in model.pcont.collect()}
        vocab = {r["tok"] for r in model.vocab.collect()}
        d = model.discount
        toks = ["<s>"] + [t if t in vocab else UNK
                          for t in text.lower().split()]
        lps = []
        for w1, w2 in zip(toks, toks[1:]):
            if w1 not in ctx:
                lps.append(math.log(pc[w2]))
            else:
                cx, nf = ctx[w1]
                c = big.get((w1, w2), 0)
                lps.append(math.log(max(c - d, 0) / cx
                                    + d * nf / cx * pc[w2]))
        want = round(math.exp(-sum(lps) / len(lps)), 4)
        assert got["ppl"] == pytest.approx(want, abs=1e-9)
        assert got["n_bigrams"] == len(toks) - 1

    def test_null_and_empty_text_absent(self, spark, model):
        docs = spark.createDataFrame(
            [(0, "the cat"), (1, None), (2, ""), (3, "   ")],
            "doc_id long, text string")
        ids = {r["doc_id"] for r in kn_perplexity(docs, model).collect()}
        # NULL text drops; ""/whitespace docs have only <s>, no bigram
        assert ids == {0}

    def test_buckets_equal_frequency_and_ordered(self, spark, model):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(
                ["the cat sat on the mat", "a dog ate a bone",
                 "the fish swam in the sea", "zzz qqq xxx",
                 "dogs and cats live here", "the mat was on the floor",
                 "unseen words everywhere today", "a cat and a dog",
                 "the dog sat on the log"])],
            "doc_id long, text string")
        b = perplexity_buckets(kn_perplexity(docs, model), n_buckets=3)
        rows = b.collect()
        sizes = {}
        for r in rows:
            sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
        assert sizes == {1: 3, 2: 3, 3: 3}
        # buckets are ordered by perplexity
        max_by_bucket = {b_: max(r["ppl"] for r in rows
                                 if r["bucket"] == b_) for b_ in (1, 2, 3)}
        min_by_bucket = {b_: min(r["ppl"] for r in rows
                                 if r["bucket"] == b_) for b_ in (1, 2, 3)}
        assert max_by_bucket[1] <= min_by_bucket[2]
        assert max_by_bucket[2] <= min_by_bucket[3]

"""Training-pipeline operators added in round 3: PII detect/scrub,
Gopher-style repetition signals, benchmark contamination, and duplicate
clustering via large-star/small-star connected components."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
    ngram_contamination,
)
from pixeltable_spark.operators.pii import (
    PII_PATTERNS,
    has_pii,
    pii_counts,
    scrub_pii,
)
from pixeltable_spark.operators.text import (
    duplicate_line_stats,
    repetition_stats,
    shingle_array,
)


class TestPii:
    def test_counts_and_scrub(self, spark):
        t = spark.createDataFrame(
            [(1, "a@b.com and c@d.org, ip 10.0.0.1, ssn 123-45-6789, "
                 "card 4111111111111111, ph (555) 123-4567")],
            ["doc_id", "text"])
        row = t.select(
            *[v.alias(k) for k, v in pii_counts(F.col("text")).items()],
            scrub_pii(F.col("text")).alias("s"),
            has_pii(F.col("text")).alias("flag"),
        ).collect()[0]
        assert row["email"] == 2 and row["ipv4"] == 1 and row["ssn"] == 1
        assert row["credit_card"] == 1 and row["phone"] == 1 and row["flag"]
        for frag in ("a@b.com", "10.0.0.1", "123-45-6789",
                     "4111111111111111", "(555) 123-4567"):
            assert frag not in row["s"]
        assert row["s"].count("<EMAIL>") == 2

    def test_clean_text(self, spark):
        t = spark.createDataFrame([(1, "perfectly ordinary text")],
                                  ["doc_id", "text"])
        row = t.select(
            has_pii(F.col("text")).alias("flag"),
            scrub_pii(F.col("text")).alias("s")).collect()[0]
        assert not row["flag"] and row["s"] == "perfectly ordinary text"

    def test_kind_subset(self, spark):
        t = spark.createDataFrame([(1, "a@b.com ssn 123-45-6789")],
                                  ["doc_id", "text"])
        row = t.select(
            scrub_pii(F.col("text"), ["email"]).alias("s"),
            has_pii(F.col("text"), ["ipv4"]).alias("flag")).collect()[0]
        assert "123-45-6789" in row["s"] and "<EMAIL>" in row["s"]
        assert not row["flag"]

    def test_patterns_re2_compatible(self):
        """Every pattern must run under RE2 (DuckDB) as well as Java —
        verified by compiling with google-re2 semantics via duckdb."""
        import duckdb
        con = duckdb.connect()
        for k, pat in PII_PATTERNS.items():
            con.execute("SELECT regexp_matches('probe', ?)", [pat]).fetchall()


class TestRepetition:
    def test_known_fractions(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b a b a b"), (2, "u v w x y z")], ["doc_id", "text"])
        r = {x["doc_id"]: (round(x["dup_ngram_frac"], 6),
                           round(x["top_ngram_frac"], 6))
             for x in repetition_stats(docs, n=2).collect()}
        # doc1 2-grams: ab ba ab ba ab -> 5 total / 2 distinct
        assert r[1] == (0.6, 0.6)
        assert r[2] == (0.0, 0.2)

    def test_shingle_array_keeps_repeats(self, spark):
        df = spark.createDataFrame([("a b a b",)], ["text"])
        got = df.select(shingle_array(F.col("text"), 2).alias("g")).collect()[0]["g"]
        assert got == ["a b", "b a", "a b"]

    def test_duplicate_lines(self, spark):
        docs = spark.createDataFrame(
            [(1, "aaaa\nbb\naaaa\ncc\n\n"), (2, "unique\nlines")],
            ["doc_id", "text"])
        r = {x["doc_id"]: (x["dup_line_frac"], x["dup_line_char_frac"])
             for x in duplicate_line_stats(docs).collect()}
        assert r[1] == (pytest.approx(0.25), pytest.approx(4 / 12))
        assert r[2] == (pytest.approx(0.0), pytest.approx(0.0))


class TestContamination:
    def _data(self, spark):
        corpus = spark.createDataFrame(
            [(1, "the quick brown fox jumps"),
             (2, "lorem ipsum dolor sit amet")], ["doc_id", "text"])
        bench = spark.createDataFrame([("quick brown fox tail",)], ["text"])
        return corpus, bench

    def test_counts(self, spark):
        corpus, bench = self._data(spark)
        r = {x["doc_id"]: (x["n_grams"], x["n_contaminated"],
                           round(x["contamination_frac"], 6))
             for x in ngram_contamination(corpus, bench, n=3).collect()}
        assert r[1] == (3, 1, round(1 / 3, 6))
        assert r[2] == (3, 0, 0.0)  # clean docs still present (left join)

    def test_shuffle_join_fallback_matches(self, spark):
        corpus, bench = self._data(spark)
        a = sorted(map(tuple, ngram_contamination(
            corpus, bench, n=3, broadcast_bench=True).collect()))
        b = sorted(map(tuple, ngram_contamination(
            corpus, bench, n=3, broadcast_bench=False).collect()))
        assert a == b

    def test_broadcast_in_plan(self, spark):
        corpus, bench = self._data(spark)
        plan = ngram_contamination(corpus, bench, n=3)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Broadcast" in plan


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-id representative per component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


class TestConnectedComponents:
    def test_shapes(self, spark):
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
            ["id_a", "id_b"])
        got = {r["id"]: r["component"]
               for r in connected_components(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                       20: 20, 21: 20, 22: 20}

    def test_random_graph_matches_union_find(self, spark):
        rng = random.Random(42)
        nodes = list(range(200))
        edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
        edges = [(u, v) for u, v in edges if u != v]
        expected = _union_find(edges, sorted({x for e in edges for x in e}))
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {r["id"]: r["component"]
               for r in connected_components(pairs).collect()}
        assert got == expected

    def test_long_chain_converges_logarithmically(self, spark):
        # a 64-node chain: naive label propagation needs 63 rounds; the
        # star iteration must finish well inside max_iter=10
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(63)], ["id_a", "id_b"])
        got = {r["id"]: r["component"]
               for r in connected_components(pairs, max_iter=10).collect()}
        assert set(got.values()) == {0} and len(got) == 64

    def test_dedup_clusters_end_to_end(self, spark):
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta") for i in range(3)]
            + [(10, "utterly different text with no overlap here")],
            ["doc_id", "text"])
        got = {r["id"]: r["component"]
               for r in dedup_clusters(docs, k=4, bands=2).collect()}
        # the 3 identical docs must cluster to min id 0; doc 10 shares no
        # band so it appears only if LSH pairs it (it cannot: distinct text)
        assert got[0] == got[1] == got[2] == 0
        assert 10 not in got


class TestNgramLm:
    def test_known_model_and_score(self, spark):
        import math
        from pixeltable_spark.operators.text import (
            ngram_lm_score, ngram_lm_train)
        train = spark.createDataFrame([(0, "aaab")], ["doc_id", "text"])
        model = {r["gram"]: r["logp"]
                 for r in ngram_lm_train(train, n=2).collect()}
        # grams of 'aaab': aa, aa, ab
        assert model.keys() == {"aa", "ab"}
        assert model["aa"] == pytest.approx(math.log(2 / 3))
        assert model["ab"] == pytest.approx(math.log(1 / 3))

        docs = spark.createDataFrame(
            [(1, "ab  cd"), (2, "zz")], ["doc_id", "text"])
        got = {r["doc_id"]: (r["lm_score"], r["n_grams_scored"])
               for r in ngram_lm_score(
                   docs, ngram_lm_train(train, n=2), n=2).collect()}
        # doc1 normalizes to 'ab cd': grams ab, 'b ', ' c', cd -> one known
        exp1 = (math.log(1 / 3) + 3 * -20.0) / 4
        assert got[1] == (pytest.approx(exp1), 4)
        assert got[2] == (pytest.approx(-20.0), 1)

    def test_model_broadcast_in_plan(self, spark):
        from pixeltable_spark.operators.text import (
            ngram_lm_score, ngram_lm_train)
        df = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
        plan = (ngram_lm_score(df, ngram_lm_train(df))
                ._jdf.queryExecution().executedPlan().toString())
        assert "Broadcast" in plan


class TestPrefixFilterJaccard:
    def test_identical_to_plain_join(self, spark):
        from pixeltable_spark.operators.dedup import ngram_jaccard_pairs
        rows = [(i, "the quick brown fox jumps over the lazy dog once more")
                for i in range(4)]
        rows += [(10, "the quick brown fox naps under a warm summer sun"),
                 (11, "completely unrelated content with distinct words only"),
                 (12, "another entirely different body of text here now")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        for t in (0.2, 0.5, 0.9):
            plain = sorted(map(tuple, ngram_jaccard_pairs(
                df, n=2, threshold=t).collect()))
            pref = sorted(map(tuple, ngram_jaccard_pairs(
                df, n=2, threshold=t, prefix_filter=True).collect()))
            assert plain == pref and plain, (t, plain, pref)

    def test_with_max_df(self, spark):
        from pixeltable_spark.operators.dedup import ngram_jaccard_pairs
        rows = [(i, f"shared boiler plate line plus unique token u{i} here")
                for i in range(6)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        plain = sorted(map(tuple, ngram_jaccard_pairs(
            df, n=2, threshold=0.1, max_df=4).collect()))
        pref = sorted(map(tuple, ngram_jaccard_pairs(
            df, n=2, threshold=0.1, max_df=4, prefix_filter=True).collect()))
        assert plain == pref


class TestSimhashPairs:
    def test_matches_brute_force(self, spark):
        from pixeltable_spark.operators.dedup import simhash, simhash_pairs
        rows = [(i, f"shared words alpha beta gamma delta u{i % 7}")
                for i in range(40)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = sorted(map(tuple,
                         simhash_pairs(df, bits=16, max_hamming=3).collect()))
        sh = {r["doc_id"]: r["simhash"]
              for r in simhash(df, bits=16).collect()}
        ids = sorted(sh)
        expect = sorted(
            (a, b, bin(sh[a] ^ sh[b]).count("1"))
            for i, a in enumerate(ids) for b in ids[i + 1:]
            if bin(sh[a] ^ sh[b]).count("1") <= 3)
        assert got == expect and expect  # banding must lose NO pair

    def test_zero_distance_identical_docs(self, spark):
        from pixeltable_spark.operators.dedup import simhash_pairs
        df = spark.createDataFrame(
            [(1, "same text here"), (2, "same text here"),
             (3, "totally different words entirely")], ["doc_id", "text"])
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in simhash_pairs(df, bits=32, max_hamming=0).collect()}
        assert got == {(1, 2): 0}


class TestDocPacking:
    def test_layout_matches_reference_impl(self, spark):
        import hashlib
        from pixeltable_spark.operators.text import pack_documents
        rows = [(i, " ".join(["w"] * (5 + i % 40))) for i in range(60)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r["doc_id"]: (r["stream"], r["bin"], r["offset"], r["n_tokens"])
               for r in pack_documents(df, tokens_per_bin=64,
                                       n_streams=3).collect()}
        streams: dict = {}
        for i, t in rows:
            s = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 3
            streams.setdefault(s, []).append((i, len(t.split())))
        for s, docs in streams.items():
            cum = 0
            for i, n in sorted(docs):
                assert got[i] == (s, cum // 64, cum % 64, n), (i, got[i])
                cum += n

    def test_bins_fill_exactly(self, spark):
        from pixeltable_spark.operators.text import pack_documents
        # every doc 16 tokens, capacity 64 -> 4 docs per bin, offset
        # pattern 0/16/32/48 within each stream
        df = spark.createDataFrame(
            [(i, " ".join(["t"] * 16)) for i in range(40)],
            ["doc_id", "text"])
        out = pack_documents(df, tokens_per_bin=64, n_streams=1).collect()
        offs = sorted((r["bin"], r["offset"]) for r in out)
        assert all(o in (0, 16, 32, 48) for _, o in offs)
        assert len({b for b, _ in offs}) == 10  # 40 docs / 4 per bin


class TestRepeatedSpans:
    def test_exact_substr_spans(self, spark):
        from pixeltable_spark.operators.dedup import repeated_ngram_spans
        shared = "one two three four five"
        df = spark.createDataFrame([
            (1, f"{shared} alpha beta gamma"),
            (2, f"prefix words here {shared} tail"),
            (3, "no duplication in this document at all"),
        ], ["doc_id", "text"])
        spans = {(r["doc_id"]): (r["span_start"], r["span_end"])
                 for r in repeated_ngram_spans(df, n=5, min_count=2).collect()}
        # doc1: shared at tokens 0-4 -> span [0, 5); doc2: at tokens 3-7
        assert spans[1] == (0, 5)
        assert spans[2] == (3, 8)
        assert 3 not in spans

    def test_within_doc_repeats_count(self, spark):
        from pixeltable_spark.operators.dedup import repeated_ngram_spans
        # the SAME 3-gram twice inside one doc must count (ExactSubstr
        # counts occurrences, not documents)
        df = spark.createDataFrame(
            [(1, "a b c x y z a b c")], ["doc_id", "text"])
        spans = [(r["span_start"], r["span_end"]) for r in
                 repeated_ngram_spans(df, n=3, min_count=2).collect()]
        assert spans == [(0, 3), (6, 9)]

    def test_overlapping_windows_merge(self, spark):
        from pixeltable_spark.operators.dedup import repeated_ngram_spans
        long_shared = "w1 w2 w3 w4 w5 w6"
        df = spark.createDataFrame([
            (1, long_shared), (2, long_shared)], ["doc_id", "text"])
        spans = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in
                 repeated_ngram_spans(df, n=4, min_count=2).collect()}
        # 3 overlapping hot 4-grams merge into one [0, 6) span
        assert spans == {1: (0, 6), 2: (0, 6)}


class TestGopherFilter:
    def test_rule_verdicts(self, spark):
        from pixeltable_spark.operators.text import gopher_filter
        good = ("the quick brown fox jumps over a lazy dog and then "
                "runs off to be with the other animals that have food "
                "while keeping pace with every word length rule we set "
                "for this check of fifty or more words in total which "
                "should now be satisfied by this very sentence here ok")
        df = spark.createDataFrame([
            (1, good),
            (2, "short text"),                       # fails n_words
            (3, " ".join(["spam"] * 80)),            # fails top_ngram + stopwords
            (4, " ".join(["#"] * 60)),               # fails symbols/alpha
        ], ["doc_id", "text"])
        out = {r["doc_id"]: r for r in gopher_filter(df, min_words=40).collect()}
        assert out[1]["keep"]
        assert not out[2]["ok_n_words"] and not out[2]["keep"]
        assert not out[3]["ok_top_ngram"] and not out[3]["ok_stopwords"]
        assert not out[4]["ok_alpha"] and not out[4]["ok_symbols"]

    def test_thresholds_configurable(self, spark):
        from pixeltable_spark.operators.text import gopher_filter
        df = spark.createDataFrame([(1, "five words in this text")],
                                   ["doc_id", "text"])
        strict = gopher_filter(df, min_words=50).collect()[0]
        loose = gopher_filter(df, min_words=2, min_stopwords=0,
                              min_mean_word_len=1.0,
                              max_top_ngram_frac=0.5).collect()[0]
        assert not strict["keep"] and loose["keep"]


class TestBpe:
    def test_train_learns_frequent_pairs(self, spark):
        from pixeltable_spark.operators.bpe import bpe_train
        df = spark.createDataFrame(
            [(1, "low low low lower lowest")], ["doc_id", "text"])
        merges = bpe_train(df, num_merges=4)
        assert ("l", "o") in merges and ("lo", "w") in merges

    def test_train_deterministic(self, spark):
        from pixeltable_spark.operators.bpe import bpe_train
        df = spark.createDataFrame(
            [(i, "alpha beta beta gamma gamma gamma") for i in range(4)],
            ["doc_id", "text"])
        assert bpe_train(df, num_merges=10) == bpe_train(df, num_merges=10)

    def test_encode_matches_hand_merge(self, spark):
        from pixeltable_spark.operators.bpe import encode_word
        ranks = {("l", "o"): 0, ("lo", "w"): 1, ("w", "</w>"): 2}
        assert encode_word("low", ranks) == ["low", "</w>"]
        assert encode_word("slow", ranks) == ["s", "low", "</w>"]
        assert encode_word("xyz", {}) == ["x", "y", "z", "</w>"]

    def test_distributed_encode_and_count(self, spark):
        from pyspark.sql import functions as F

        from pixeltable_spark.operators.bpe import (
            bpe_encode, bpe_token_count, bpe_train, encode_word)
        df = spark.createDataFrame(
            [(1, "low low lower"), (2, "lowest low")], ["doc_id", "text"])
        merges = bpe_train(df, num_merges=6)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        got = {r["doc_id"]: (r["toks"], r["n"]) for r in df.select(
            "doc_id", bpe_encode(F.col("text"), merges).alias("toks"),
            bpe_token_count(F.col("text"), merges).alias("n")).collect()}
        exp1 = encode_word("low", ranks) * 2 + encode_word("lower", ranks)
        assert got[1][0] == exp1 and got[1][1] == len(exp1)


class TestMixtureSample:
    def test_rates_and_determinism(self, spark):
        from pixeltable_spark.operators.text import mixture_sample
        rows = [(i, f"d{i % 2}") for i in range(2000)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        m = mixture_sample(df, {"d0": 1.0, "d1": 0.0}, id_col="doc_id")
        got = {r["source"] for r in m.collect()}
        assert got == {"d0"} and m.count() == 1000
        frac = mixture_sample(df, {"d0": 0.5}, default_rate=0.5)
        n = frac.count()
        assert 850 < n < 1150  # ~50% of 2000
        assert n == mixture_sample(df, {"d0": 0.5}, default_rate=0.5).count()

    def test_seed_changes_mix(self, spark):
        from pixeltable_spark.operators.text import mixture_sample
        df = spark.createDataFrame([(i, "d") for i in range(500)],
                                   ["doc_id", "source"])
        a = {r["doc_id"] for r in
             mixture_sample(df, {"d": 0.5}, seed=1).collect()}
        b = {r["doc_id"] for r in
             mixture_sample(df, {"d": 0.5}, seed=2).collect()}
        assert a != b


class TestClusterRepresentatives:
    def test_keeps_best_per_cluster(self, spark):
        from pixeltable_spark.operators.dedup import cluster_representatives
        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the quiet woods tonight")
        rows = [
            (1, base),                          # cluster with 2 and 3
            (2, base + " extended with extra words here"),   # longest
            (3, base + " extended"),
            (10, "completely different text about spark and parquet "
                 "engines running distributed queries"),     # singleton
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        kept = sorted(r["doc_id"] for r in
                      cluster_representatives(df, k=4, bands=2).collect())
        assert 10 in kept                 # singleton survives
        assert 2 in kept                  # longest member wins
        assert 1 not in kept and 3 not in kept
        # custom quality column flips the winner
        from pyspark.sql import functions as F
        df2 = df.withColumn("score", F.when(F.col("doc_id") == 3, 100)
                            .otherwise(1))
        kept2 = sorted(r["doc_id"] for r in cluster_representatives(
            df2, quality="score", k=4, bands=2).collect())
        assert 3 in kept2 and 2 not in kept2

    def test_no_pairs_keeps_everything(self, spark):
        from pixeltable_spark.operators.dedup import cluster_representatives
        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta"),
             (2, "one two three four five six seven")],
            ["doc_id", "text"])
        assert cluster_representatives(df, k=4, bands=2).count() == 2

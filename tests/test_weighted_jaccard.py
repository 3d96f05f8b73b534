"""Weighted (multiset) Jaccard dedup: exact pairs vs a DuckDB oracle, and
ICWS (Ioffe 2010) consistent-weighted-sampling sketches — determinism,
exact-match behavior, and estimator accuracy against the exact measure."""

from __future__ import annotations

import random

import duckdb
import pytest

from pixeltable_spark.operators.dedup import (
    icws_pairs,
    icws_signatures,
    term_freqs,
    weighted_jaccard_pairs,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu"]


def _docs(n=24, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        toks = [rng.choice(WORDS) for _ in range(rng.randint(8, 40))]
        rows.append((i, " ".join(toks)))
    # seeded near-dup pairs: doc n+j is doc j with a few swaps
    for j in range(4):
        toks = rows[j][1].split()
        for _ in range(2):
            toks[rng.randrange(len(toks))] = rng.choice(WORDS)
        rows.append((n + j, " ".join(toks)))
    return rows


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(_docs(), ["doc_id", "text"]).cache()


def _oracle_pairs(rows, threshold):
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    return con.execute(r"""
WITH toks AS (SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS words
              FROM d),
tf AS (SELECT doc_id, term, count(*) AS cnt
       FROM (SELECT doc_id, unnest(words) AS term FROM toks)
       WHERE term <> '' GROUP BY 1, 2),
tot AS (SELECT doc_id, sum(cnt) AS tot FROM tf GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 sum(least(a.cnt, b.cnt)) AS im
          FROM tf a JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b,
       round(CAST(im AS DOUBLE) / (ta.tot + tb.tot - im), 6) AS wj
FROM inter JOIN tot ta ON ta.doc_id = id_a JOIN tot tb ON tb.doc_id = id_b
WHERE CAST(im AS DOUBLE) / (ta.tot + tb.tot - im) >= ?
ORDER BY id_a, id_b""", [threshold]).fetchall()


class TestExactWeightedJaccard:
    def test_matches_duckdb_oracle(self, spark, docs_df):
        got = sorted(
            (r["id_a"], r["id_b"], r["wjaccard"])
            for r in weighted_jaccard_pairs(docs_df, threshold=0.3).collect())
        want = [(a, b, round(w, 6)) for a, b, w in
                _oracle_pairs(_docs(), 0.3)]
        assert got == want and len(got) > 0

    def test_identical_docs_score_one(self, spark):
        df = spark.createDataFrame(
            [(1, "spam spam spam ham"), (2, "spam spam spam ham"),
             (3, "other words here")], ["doc_id", "text"])
        rows = weighted_jaccard_pairs(df, threshold=0.9).collect()
        assert [(r["id_a"], r["id_b"], r["wjaccard"]) for r in rows] \
            == [(1, 2, 1.0)]

    def test_multiset_not_set(self, spark):
        # set Jaccard would call these identical; weighted must not
        df = spark.createDataFrame(
            [(1, "spam spam spam spam ham"), (2, "spam ham")],
            ["doc_id", "text"])
        [r] = weighted_jaccard_pairs(df, threshold=0.0).collect()
        # min: spam 1 + ham 1 = 2; max: spam 4 + ham 1 = 5
        assert r["wjaccard"] == pytest.approx(2 / 5)

    def test_max_df_drops_hot_terms(self, spark):
        # "the" is in every doc; capping df removes it from the measure
        df = spark.createDataFrame(
            [(1, "the aa bb"), (2, "the aa bb"), (3, "the cc dd"),
             (4, "the ee ff")], ["doc_id", "text"])
        full = {(r["id_a"], r["id_b"]): r["wjaccard"]
                for r in weighted_jaccard_pairs(df, threshold=0.0).collect()}
        capped = {(r["id_a"], r["id_b"]): r["wjaccard"]
                  for r in weighted_jaccard_pairs(
                      df, threshold=0.0, max_df=3).collect()}
        assert full[(3, 4)] > 0          # shares only "the"
        assert (3, 4) not in capped      # gone once "the" is dropped
        assert capped[(1, 2)] == 1.0     # identical on the kept vocab

    def test_term_freqs_counts(self, spark):
        df = spark.createDataFrame([(1, "  A a b  ")], ["doc_id", "text"])
        rows = {(r["term"]): r["cnt"]
                for r in term_freqs(df).collect()}
        assert rows == {"a": 2, "b": 1}


class TestIcws:
    def test_deterministic(self, spark, docs_df):
        s1 = sorted(map(tuple, icws_signatures(docs_df, num_samples=6)
                        .collect()))
        s2 = sorted(map(tuple, icws_signatures(docs_df, num_samples=6)
                        .collect()))
        assert s1 == s2

    def test_identical_docs_full_agreement(self, spark):
        df = spark.createDataFrame(
            [(1, "x x y z z z"), (2, "x x y z z z"), (3, "totally different "
              "words entirely")], ["doc_id", "text"])
        rows = icws_pairs(df, num_samples=8, threshold=0.9).collect()
        assert [(r["id_a"], r["id_b"], r["est_wjaccard"])
                for r in rows] == [(1, 2, 1.0)]

    def test_disjoint_docs_no_candidates(self, spark):
        df = spark.createDataFrame(
            [(1, "aa bb cc"), (2, "dd ee ff")], ["doc_id", "text"])
        assert icws_pairs(df, num_samples=8, threshold=0.0).count() == 0

    def test_estimator_tracks_exact(self, spark, docs_df):
        """E[fraction of agreeing samples] = J_w; with K=64 the std per
        pair is <= 1/(2*sqrt(64)) = 0.0625 — check mean |err| over the
        seeded near-dup pairs stays well inside noise."""
        exact = {(r["id_a"], r["id_b"]): r["wjaccard"]
                 for r in weighted_jaccard_pairs(
                     docs_df, threshold=0.5).collect()}
        assert len(exact) >= 3   # the seeded near-dups
        est = {(r["id_a"], r["id_b"]): r["est_wjaccard"]
               for r in icws_pairs(docs_df, num_samples=64,
                                   threshold=0.0, rows_per_band=1).collect()}
        errs = [abs(est.get(p, 0.0) - v) for p, v in exact.items()]
        assert sum(errs) / len(errs) < 0.12, (exact, est)

    def test_consistency_across_docs(self, spark):
        """The same term draws the same (r, c, beta) in every doc — docs
        sharing their dominant mass should collide on most samples."""
        df = spark.createDataFrame(
            [(1, " ".join(["heavy"] * 20 + ["a", "b"])),
             (2, " ".join(["heavy"] * 20 + ["c", "d"]))],
            ["doc_id", "text"])
        [r] = icws_pairs(df, num_samples=16, threshold=0.0, rows_per_band=1).collect()
        assert r["est_wjaccard"] >= 0.5   # J_w = 20/24 ~ 0.83


class TestPlanShape:
    """Pin the scale-critical plan properties (the 100 TB contract)."""

    def _plan(self, df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    def test_max_df_is_broadcast_anti_join(self, spark, docs_df):
        from pixeltable_spark.operators.dedup import _capped_term_freqs
        plan = self._plan(_capped_term_freqs(docs_df, "text", "doc_id", 5))
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan

    def test_icws_verify_is_repartitioned(self, spark, docs_df):
        """The slim-candidate shape: an explicit hash repartition on
        (id_a, id_b) sits between the banded self-join and the verify,
        so a hot boilerplate bucket cannot serialize the est stage."""
        plan = self._plan(icws_pairs(docs_df, num_samples=8))
        assert "hashpartitioning(id_a" in plan, plan

    def test_icws_battery_not_single_partition(self, spark, docs_df):
        """The hash/gamma battery projection must run at full parallelism,
        not on the AQE-coalesced aggregate output."""
        sigs = icws_signatures(docs_df, num_samples=4)
        parallelism = spark.sparkContext.defaultParallelism
        plan = self._plan(sigs)
        assert f"hashpartitioning(doc_id" in plan, plan
        assert f", {parallelism})" in plan, plan

"""BM25 retrieval (operators/search.py) and funnel analysis
(operators/timeseries.py funnel): hand-computed scores, semantics edge
cases (strict ordering, conversion window, qtf weighting), plan-shape
guards, and DuckDB differential cross-checks (the q100/q101 oracles in
miniature)."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.search import bm25_topk, tokenize_query
from pixeltable_spark.operators.timeseries import funnel


def _ts(mi, s=0):
    return dt.datetime(2024, 1, 1, 0, mi, s)


# ---------------------------------------------------------------- BM25

@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "spark shuffle join shuffle"),
        (2, "spark window scan"),
        (3, "hash join merge join hash"),
        (4, "totally unrelated words here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestBM25:
    def test_hand_computed_score(self, spark, corpus):
        out = {r["doc_id"]: r["score"]
               for r in bm25_topk(corpus, [("q", "shuffle")], k=10)
               .collect()}
        # df(shuffle)=1, N=4, avgdl=(4+3+5+4)/4=4; doc 1: tf=2, dl=4
        idf = math.log(1 + (4 - 1 + 0.5) / (1 + 0.5))
        tfn = 2 * 2.2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 4 / 4))
        assert out == {1: round(idf * tfn, 6)}

    def test_qtf_weights_duplicate_query_terms(self, spark, corpus):
        one = bm25_topk(corpus, [("q", "spark")]).collect()
        two = bm25_topk(corpus, [("q", "spark spark")]).collect()
        doubled = {r["doc_id"]: r["score"] * 2 for r in one}
        got = {r["doc_id"]: r["score"] for r in two}
        # scores are rounded to 6 decimals independently, so compare with
        # a 1-ulp-at-the-6th-decimal tolerance
        assert got == pytest.approx(doubled, abs=2e-6)

    def test_topk_cut_and_rank_tiebreak(self, spark, corpus):
        rows = sorted(bm25_topk(corpus, [("q", "join scan")], k=2)
                      .collect(), key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rows] == [1, 2]
        # scan is rarer (df=1) than join (df=2): doc 2 outranks doc 3;
        # doc 1 (join tf=1) is cut by k=2
        assert [r["doc_id"] for r in rows] == [2, 3]

    def test_non_matching_docs_absent(self, spark, corpus):
        ids = {r["doc_id"]
               for r in bm25_topk(corpus, [("q", "spark join")]).collect()}
        assert 4 not in ids

    def test_multiple_queries_and_tokenizer(self, spark, corpus):
        assert tokenize_query("  Spark   JOIN ") == ["spark", "join"]
        out = bm25_topk(corpus, [("a", "spark"), ("b", "hash")]).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
        assert by_q == {"a": {1, 2}, "b": {3}}

    def test_plan_broadcasts_and_prunes(self, spark, corpus):
        plan = bm25_topk(corpus, [("q", "spark join")]) \
            ._jdf.queryExecution().executedPlan().toString()
        # query terms / df / stats all broadcast; vocabulary prune is a
        # literal IN filter under the explode (no full-vocab exchange)
        assert plan.count("BroadcastHashJoin") >= 2
        assert "BroadcastNestedLoopJoin" in plan  # 1-row stats cross join

    def test_differential_vs_duckdb(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        got = sorted(
            (r["query_id"], r["doc_id"], r["score"], r["rnk"])
            for r in bm25_topk(df, [("q1", "spark shuffle join"),
                                    ("q2", "window hash scan")],
                               k=5).collect())
        want = sorted(duckdb.sql("""
WITH q(query_id, term, qtf) AS (VALUES
  ('q1','spark',1),('q1','shuffle',1),('q1','join',1),
  ('q2','window',1),('q2','hash',1),('q2','scan',1)),
docs AS (SELECT doc_id,
  list_filter(string_split_regex(lower(trim(text)), '\\s+'),
              x -> x <> '') AS toks
  FROM '/root/testdata/sf0.001/documents.parquet'),
dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS dft FROM tf GROUP BY 1),
scored AS (SELECT q.query_id, tf.doc_id,
  round(sum(q.qtf * ln(1 + (st.n_docs - dfq.dft + 0.5)/(dfq.dft + 0.5))
        * tf.tf * 2.2
        / (tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/st.avgdl))), 6) AS score
  FROM tf JOIN q USING (term) JOIN dfq USING (term)
  JOIN dl USING (doc_id) CROSS JOIN st GROUP BY 1, 2)
SELECT query_id, doc_id, score,
  row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, doc_id) AS rnk
FROM scored QUALIFY rnk <= 5 ORDER BY 1, 4
""").fetchall())
        assert got == want

    def test_empty_query_raises(self, spark, corpus):
        with pytest.raises(ValueError):
            bm25_topk(corpus, [])
        with pytest.raises(ValueError):
            bm25_topk(corpus, [("q", "   ")])


# -------------------------------------------------------------- funnel

@pytest.fixture()
def clicks(spark):
    rows = [
        # u1 completes all three in order
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "purchase"),
        # u2 stops after click
        (2, _ts(0), "view"), (2, _ts(5), "click"),
        # u3: click BEFORE view -> only view counts; a later click converts
        (3, _ts(0), "click"), (3, _ts(1), "view"), (3, _ts(2), "click"),
        # u4: purchase only -> no steps
        (4, _ts(0), "purchase"),
        # u5: view and click at the SAME timestamp -> click not strictly
        # after view, stays at step 1
        (5, _ts(0), "view"), (5, _ts(0), "click"),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


STEPS = ["view", "click", "purchase"]


class TestFunnel:
    def test_counts_and_conversion(self, spark, clicks):
        out = {r["step"]: (r["event_type"], r["users"], r["conversion"])
               for r in funnel(clicks, "ts", "event_type", STEPS).collect()}
        assert out == {1: ("view", 4, 1.0),
                       2: ("click", 3, 0.75),
                       3: ("purchase", 1, 0.25)}

    def test_within_window(self, spark, clicks):
        # 90s window: u1's purchase at +2min falls outside; click at
        # +1min is inside. u2's click at +5min is outside.
        out = {r["step"]: r["users"]
               for r in funnel(clicks, "ts", "event_type", STEPS,
                               within_s=90).collect()}
        assert out == {1: 4, 2: 2}

    def test_single_step(self, spark, clicks):
        out = funnel(clicks, "ts", "event_type", ["purchase"]).collect()
        assert [(r["step"], r["users"], r["conversion"])
                for r in out] == [(1, 2, 1.0)]

    def test_validation(self, spark, clicks):
        with pytest.raises(ValueError):
            funnel(clicks, "ts", "event_type", [])
        with pytest.raises(ValueError):
            funnel(clicks, "ts", "event_type", ["view", "view"])

    def test_differential_vs_duckdb(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        got = sorted(
            (r["step"], r["event_type"], r["users"], r["conversion"])
            for r in funnel(df, "ts", "event_type", STEPS).collect())
        want = sorted(duckdb.sql("""
WITH e AS (SELECT * FROM '/root/testdata/sf0.001/events.parquet'),
s1 AS (SELECT user_id, min(ts) AS t FROM e
       WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
SELECT step, event_type, users,
       round(users / first(users) OVER (ORDER BY step), 6) AS conversion
FROM (SELECT 1 AS step, 'view' AS event_type,
             (SELECT count(*) FROM s1) AS users
      UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
      UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
WHERE users > 0 ORDER BY step
""").fetchall())
        assert got == want

    def test_one_shuffle_plan(self, spark, clicks):
        plan = funnel(clicks, "ts", "event_type", STEPS) \
            ._jdf.queryExecution().executedPlan().toString()
        # no join cascade: the only wide ops are the per-entity group,
        # the tiny per-step rollup, and the n-row window
        assert "Join" not in plan

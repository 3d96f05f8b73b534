"""Round-7 cross-engine fuzz + plan-shape pins.

Fuzz: hypothesis-generated URLs through canonical_url (Spark == DuckDB
mirror) and hypothesis-generated multilingual-ish text through the
language id (Spark table path == DuckDB CTE chain == python scorer) —
the three-engine agreement claims as properties, not just examples.

Plans: Exchange counts for the new operators (lang_id_table = the two
intended shuffles; c4_filter / canonical_url = map-only)."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pixeltable_spark.operators.langid import (langid_ctes, lang_id_table,
                                               score_text)
from pixeltable_spark.operators.urlops import (canonical_url,
                                               canonical_url_sql)

# -- URL fuzz ---------------------------------------------------------------

_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp", ""])
_host = st.from_regex(r"[A-Za-z0-9.\-]{1,12}", fullmatch=True)
_port = st.sampled_from(["", ":80", ":443", ":8080"])
_pathseg = st.from_regex(r"[A-Za-z0-9._~\-]{0,6}", fullmatch=True)
_param = st.one_of(
    st.from_regex(r"[a-z]{1,4}=[A-Za-z0-9]{0,4}", fullmatch=True),
    st.sampled_from(["utm_source=x", "utm_campaign=cc", "gclid=1",
                     "fbclid=22", "ref=r", "msclkid=m", ""]))


@st.composite
def urls(draw):
    scheme = draw(_scheme)
    pre = f"{scheme}://" if scheme else ""
    host = draw(_host)
    port = draw(_port)
    path = "/".join(draw(st.lists(_pathseg, max_size=3)))
    trail = draw(st.sampled_from(["", "/"]))
    params = [p for p in draw(st.lists(_param, max_size=4)) if p]
    qs = ("?" + "&".join(params)) if params else ""
    frag = draw(st.sampled_from(["", "#f", "#a/b?c"]))
    ws = draw(st.sampled_from(["", " ", "  "]))
    return f"{ws}{pre}{host}{port}/{path}{trail}{qs}{frag}{ws}"


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(url=urls())
def test_canonical_url_matches_duckdb(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    got = df.select(canonical_url(F.col("u")).alias("c")).collect()[0]["c"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (u VARCHAR)")
    con.execute("INSERT INTO t VALUES (?)", [url])
    exp = con.sql(
        f"SELECT {canonical_url_sql('u')} FROM t").fetchone()[0]
    assert got == exp, (url, got, exp)


# -- lang-id fuzz -----------------------------------------------------------

_texty = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyz äöüßéèàçñ 的是不了 посл アイウ "
             "한국어 اللغة .,!?\t\n123")),
    max_size=120)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_texty, min_size=1, max_size=6))
def test_langid_three_engine_agreement(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    tbl = {r["doc_id"]: r["lang_pred"]
           for r in lang_id_table(df, "doc_id", "text").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    ora = dict(con.sql(
        f"WITH {langid_ctes('docs', 'doc_id')} "
        f"SELECT doc_id, lang_pred FROM lgpred").fetchall())
    py = {i: score_text(t) for i, t in rows}
    assert tbl == ora == py, (texts, tbl, ora, py)


# -- plan shapes ------------------------------------------------------------

class TestPlanShapes:
    def _plan(self, df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    def test_lang_id_table_two_exchanges(self, spark):
        df = spark.createDataFrame([(1, "hello world")],
                                   "doc_id int, text string")
        plan = self._plan(lang_id_table(df, "doc_id", "text"))
        # exactly the intended shuffle: partial-agg -> exchange(doc_id)
        # -> final agg (plus nothing else)
        assert plan.count("Exchange") == 1, plan

    def test_c4_filter_map_only(self, spark):
        from pixeltable_spark.operators.text import c4_filter
        df = spark.createDataFrame([(1, "A fine sentence here.")],
                                   "doc_id int, text string")
        assert "Exchange" not in self._plan(c4_filter(df))

    def test_canonical_url_map_only(self, spark):
        df = spark.createDataFrame([("http://a/b",)], "u string")
        q = df.select(canonical_url(F.col("u")))
        assert "Exchange" not in self._plan(q)

"""C4 rule battery (operators/text.py c4_filter) and URL
canonicalization/dedup (operators/urlops.py)."""

import duckdb
from pyspark.sql import functions as F

from pixeltable_spark.operators import text as textops
from pixeltable_spark.operators.urlops import (canonical_url,
                                               canonical_url_sql,
                                               dedup_by_url)


class TestC4Filter:
    def _run(self, spark, text, **kw):
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        return textops.c4_filter(df, **kw).collect()[0]

    def test_terminal_punctuation_rule(self, spark):
        r = self._run(spark, "A good proper sentence here.\n"
                             "no terminal punctuation on this line\n"
                             "Is this kept as well?")
        assert r["n_lines"] == 3 and r["n_kept_lines"] == 2
        assert "no terminal" not in r["clean_text"]

    def test_min_words_and_javascript_rules(self, spark):
        r = self._run(spark, "Too short.\n"
                             "Please enable JavaScript to continue.\n"
                             "This sentence has enough words.")
        assert r["n_kept_lines"] == 1
        assert r["clean_text"] == "This sentence has enough words."

    def test_bad_phrase_and_brace_drop_doc(self, spark):
        base = "A perfectly fine sentence is here."
        assert self._run(spark, base)["keep"] is True
        assert self._run(spark, base + "\nRead our Privacy Policy.")[
            "keep"] is False
        assert self._run(spark, base + "\nif (x) { y(); } stays bad.")[
            "keep"] is False
        assert self._run(spark, base + "\nLorem ipsum dolor sit amet.")[
            "keep"] is False

    def test_min_kept_lines(self, spark):
        text = "One good sentence right here."
        assert self._run(spark, text, min_kept_lines=1)["keep"] is True
        assert self._run(spark, text, min_kept_lines=2)["keep"] is False


class TestCanonicalUrl:
    def _canon(self, spark, url):
        df = spark.createDataFrame([(url,)], "u string")
        return df.select(canonical_url(F.col("u")).alias("c")) \
            .collect()[0]["c"]

    def test_full_normalization(self, spark):
        got = self._canon(
            spark,
            "HTTP://Example.COM:80/Products/Shoes/"
            "?utm_source=news&b=2&a=1&gclid=x#frag")
        assert got == "http://example.com/Products/Shoes?a=1&b=2"

    def test_https_default_port_and_root_path(self, spark):
        assert self._canon(spark, "https://A.B:443/") == "https://a.b/"
        assert self._canon(spark, "https://A.B:8443/x") == \
            "https://a.b:8443/x"

    def test_no_scheme_passthrough(self, spark):
        assert self._canon(spark, "  example.com/path#f ") == \
            "example.com/path"

    def test_matches_duckdb_mirror(self, spark):
        urls = [
            "HTTP://Example.COM:80/a/b/?z=1&utm_campaign=c&a=2#x",
            "https://Site.org:443/only/path/",
            "http://h.io/p?fbclid=1&ref=2",
            "ftp://Mixed.Case/Path",
            "plain-text-not-a-url",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "u string")
        got = [r["c"] for r in
               df.select(canonical_url(F.col("u")).alias("c")).collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE t (u VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
        exp = [r[0] for r in con.sql(
            f"SELECT {canonical_url_sql('u')} FROM t").fetchall()]
        assert got == exp

    def test_dedup_by_url_representatives(self, spark):
        rows = [
            (1, "http://a.com/x?utm_source=1"),
            (2, "HTTP://A.com:80/x"),
            (3, "https://other.net/y"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, url string")
        out = {r["doc_id"]: r for r in dedup_by_url(df).collect()}
        assert out[1]["canonical"] == out[2]["canonical"]
        assert out[1]["is_canonical_rep"] is True
        assert out[2]["is_canonical_rep"] is False
        assert out[3]["is_canonical_rep"] is True


class TestQ130OracleSynthText:
    def test_synth_text_identical_across_engines(self, spark):
        """The q130 oracle replays a SYNTHESIZED document; if the DuckDB
        synth expression ever drifts from the Spark one (e.g. the
        round-7 double-brace f-string bug, where the oracle synthesized
        'function() {{ return 1; }}'), the rule outputs can still
        coincide by accident — so assert on the TEXT itself."""
        import __spark_entry__ as em

        sdf = spark.createDataFrame(
            [(i, f"some corpus words number {i} appear here") for i in
             (1, 3, 5, 7, 11, 15, 21, 33, 35, 55, 77, 105, 165, 231, 1155)],
            "doc_id int, text string")
        got = {r["doc_id"]: r["t"] for r in
               sdf.select("doc_id",
                          em._q130_synth_text().alias("t")).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        [(i, f"some corpus words number {i} appear here")
                         for i in got])
        synth_sql = em._q130_oracle().split("WITH synth AS (SELECT doc_id, ", 1)[1] \
            .split(" AS t FROM documents)", 1)[0]
        want = dict(con.execute(
            f"SELECT doc_id, {synth_sql} FROM documents").fetchall())
        assert got == want
        # the brace line must carry SINGLE braces in both engines
        assert "function() { return 1; }" in got[11]


class TestDedupByUrlNulls:
    def test_null_url_rows_kept_as_own_reps(self, spark):
        """NULL urls carry no identity: they must remain in the output
        as their own representatives, not be silently dropped by the
        equi-join (NULL never equals NULL)."""
        df = spark.createDataFrame(
            [(1, "http://a.com/x"), (2, "HTTP://A.COM/x"),
             (3, None), (4, None)],
            "doc_id int, url string")
        rows = {r["doc_id"]: r for r in dedup_by_url(df).collect()}
        assert set(rows) == {1, 2, 3, 4}, "NULL-url rows were dropped"
        assert rows[1]["is_canonical_rep"] is True
        assert rows[2]["is_canonical_rep"] is False  # same canonical
        assert rows[3]["is_canonical_rep"] is True
        assert rows[4]["is_canonical_rep"] is True
        assert rows[3]["canonical"] is None and rows[3]["key"] is None

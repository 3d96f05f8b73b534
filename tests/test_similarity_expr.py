"""ColumnRef.similarity() expr + Table-level index methods
(reference exprs/similarity_expr.py, exprs/column_ref.py:195,
index/embedding_index.py:270-295 metric semantics,
catalog/table.py add_embedding_index/drop_embedding_index/drop_index)."""
import math

import pytest

import pixeltable_spark as pxt
from pixeltable_spark.exceptions import AlreadyExistsError, NotFoundError

VECS = [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5], [2.0, 0.0], [-1.0, 0.0]]
Q = [1.0, 0.0]


@pytest.fixture()
def vec_table(spark, tmp_path):
    cat = pxt.Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("vecs", {"k": pxt.Int(False),
                                  "v": pxt.Array(pxt.Float())})
    t.insert([{"k": i, "v": v} for i, v in enumerate(VECS)])
    return t


@pytest.fixture()
def text_table(spark, tmp_path):
    cat = pxt.Catalog(spark, str(tmp_path / "wh2"))
    t = cat.create_table("docs", {"doc_id": pxt.Int(False),
                                  "text": pxt.String()})
    t.insert([{"doc_id": i, "text": f"doc {i} topic {i % 3}"}
              for i in range(12)])
    return t


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb) if na * nb else 0.0


class TestSimilarityExpr:
    def test_cosine_values(self, vec_table):
        t = vec_table
        t.add_embedding_index("v", idx_name="cos")
        r = t.ref()
        sim = r.v.similarity(vector=Q, idx="cos")
        got = {row["k"]: row["s"]
               for row in r.select(r.k, s=sim).collect()}
        for i, v in enumerate(VECS):
            assert got[i] == pytest.approx(_cos(v, Q), abs=1e-9)

    def test_l2_order_and_values(self, vec_table):
        t = vec_table
        t.add_embedding_index("v", idx_name="nn", metric="l2")
        r = t.ref()
        sim = r.v.similarity(vector=Q, idx="nn")
        got = r.select(r.k, d=sim).order_by(sim).collect()
        exp = sorted((math.dist(v, Q), i) for i, v in enumerate(VECS))
        assert [row["k"] for row in got] == [i for _, i in exp]
        for row in got:
            assert row["d"] == pytest.approx(
                math.dist(VECS[row["k"]], Q), abs=1e-9)

    def test_ip_metric(self, vec_table):
        t = vec_table
        t.add_embedding_index("v", idx_name="ip", metric="ip")
        r = t.ref()
        sim = r.v.similarity(vector=Q, idx="ip")
        got = (r.select(r.k).order_by(sim, asc=False).limit(2).collect())
        assert [row["k"] for row in got] == [3, 0]  # [2,0] then [1,0]

    def test_takeordered_plan(self, vec_table):
        t = vec_table
        t.add_embedding_index("v", idx_name="cos")
        r = t.ref()
        sim = r.v.similarity(vector=Q, idx="cos")
        q = r.select(r.k, s=sim).order_by(sim, asc=False).limit(2)
        plan = q.df()._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "BatchEvalPython" not in plan  # pure-JVM score

    def test_string_query_embeds_and_matches_search(self, text_table):
        t = text_table
        idx = t.add_embedding_index("text", idx_name="emb")
        r = t.ref()
        sim = r.text.similarity(string="doc 7 topic 1")
        got = (r.select(r.doc_id).order_by(sim, asc=False)
               .limit(3).collect())
        want = idx.search(idx.embed_fn("doc 7 topic 1"), k=3).collect()
        assert [x["doc_id"] for x in got] == [x["doc_id"] for x in want]
        assert got[0]["doc_id"] == 7  # self-match is nearest

    def test_zero_norm_vector_scores_zero(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "whz"))
        t = cat.create_table("z", {"k": pxt.Int(False),
                                   "v": pxt.Array(pxt.Float())})
        t.insert([{"k": 0, "v": [0.0, 0.0]}, {"k": 1, "v": [1.0, 0.0]}])
        t.add_embedding_index("v", idx_name="c")
        r = t.ref()
        got = {row["k"]: row["s"] for row in
               r.select(r.k, s=r.v.similarity(vector=Q, idx="c"))
               .collect()}
        assert got[0] == 0.0 and got[1] == pytest.approx(1.0)

    def test_argument_validation(self, vec_table):
        t = vec_table
        t.add_embedding_index("v", idx_name="a")
        t.add_embedding_index("v", idx_name="b", metric="l2")
        r = t.ref()
        with pytest.raises(ValueError, match="disambiguate"):
            r.v.similarity(vector=Q)          # two indexes, no idx=
        with pytest.raises(ValueError, match="exactly one"):
            r.v.similarity(string="x", vector=Q, idx="a")
        with pytest.raises(ValueError, match="no embedding index"):
            r.k.similarity(vector=Q)
        with pytest.raises(ValueError, match="no embedding function"):
            r.v.similarity(string="text query", idx="a")  # array index

    def test_free_tableref_refuses(self, spark):
        free = pxt.table_from_parquet(
            spark, "/root/testdata/sf0.001/nation.parquet")
        with pytest.raises(ValueError, match="catalog table"):
            free.n_name.similarity(string="x")


class TestTableIndexMethods:
    def test_if_exists_modes(self, text_table):
        t = text_table
        i1 = t.add_embedding_index("text", idx_name="e")
        with pytest.raises(AlreadyExistsError):
            t.add_embedding_index("text", idx_name="e")
        assert t.add_embedding_index("text", idx_name="e",
                                     if_exists="ignore") is i1
        i2 = t.add_embedding_index("text", idx_name="e",
                                   if_exists="replace",
                                   embedding_col="text_embedding")
        assert i2 is not i1 and i2.name == "e"

    def test_drop_by_name_and_column(self, vec_table):
        t = vec_table
        t.add_embedding_index("v", idx_name="one")
        t.drop_index("one")
        assert t._indexes == {}
        t.add_embedding_index("v", idx_name="two")
        t.drop_embedding_index(column="v")
        assert t._indexes == {}
        with pytest.raises(NotFoundError):
            t.drop_index("nope")
        with pytest.raises(ValueError, match="exactly one"):
            t.drop_embedding_index()

    def test_drop_removes_embed_column(self, text_table):
        t = text_table
        t.add_embedding_index("text", idx_name="e")
        assert "text_embedding" in t.columns()
        t.drop_embedding_index(idx_name="e")
        assert "text_embedding" not in t.columns()

    def test_array_column_indexed_in_place(self, vec_table):
        t = vec_table
        t.add_embedding_index("v", idx_name="direct")
        # no extra computed column for a precomputed-embedding column
        assert t.columns() == ["k", "v"]

    def test_metadata_reflects_metric(self, vec_table):
        t = vec_table
        t.add_embedding_index("v", idx_name="nn", metric="l2")
        md = t.get_metadata()
        assert md["indices"]["nn"]["parameters"]["metric"] == "l2"

    def test_search_l2_and_ip(self, vec_table):
        t = vec_table
        l2 = t.add_embedding_index("v", idx_name="l2", metric="l2")
        ip = t.add_embedding_index("v", idx_name="ip", metric="ip")
        hits = l2.search(Q, k=2).collect()
        assert [h["k"] for h in hits] == [0, 2]   # dist 0, then 0.707
        hits = ip.search(Q, k=2).collect()
        assert [h["k"] for h in hits] == [3, 0]   # dot 2, then 1


class TestTableParityMethods:
    def test_columns_show_history(self, text_table, capsys):
        t = text_table
        assert t.columns() == ["doc_id", "text"]
        rows = t.show(3)
        assert len(rows) == 3
        assert "doc_id" in capsys.readouterr().out
        hist = t.history()
        assert len(hist) >= 1                     # one insert version

    def test_add_columns_and_base_table(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh3"))
        t = cat.create_table("t", {"k": pxt.Int(False)})
        t.insert([{"k": 1}])
        t.add_columns({"a": pxt.Int(), "b": pxt.String()})
        assert t.columns() == ["k", "a", "b"]
        assert t.get_base_table() is None
        v = cat.create_view("v", t, predicate=t.ref().k > 0)
        assert v.get_base_table() is t


class TestIndexPersistence:
    def test_index_survives_catalog_reload(self, spark, tmp_path):
        wh = str(tmp_path / "whp")
        cat = pxt.Catalog(spark, wh)
        t = cat.create_table("docs", {"i": pxt.Int(False),
                                      "txt": pxt.String()})
        t.insert([{"i": 0, "txt": "alpha"}, {"i": 1, "txt": "beta"}])
        t.add_embedding_index("txt", idx_name="e", metric="cosine")
        t2 = pxt.Catalog(spark, wh).get_table("docs")
        assert list(t2._indexes) == ["e"]
        ix = t2._indexes["e"]
        assert ix.metric == "cosine" and ix.embed_fn is not None
        r = t2.ref()
        top = (r.select(r.i)
               .order_by(r.txt.similarity(string="beta", idx="e"),
                         asc=False).limit(1).collect())
        assert top[0]["i"] == 1
        assert ix.search(ix.embed_fn("alpha"), k=1).collect()[0]["i"] == 0
        # inserts through the reloaded handle stay index-synced
        t2.insert([{"i": 2, "txt": "gamma"}])
        assert ix.search(ix.embed_fn("gamma"), k=1).collect()[0]["i"] == 2

    def test_drop_persists_across_reload(self, spark, tmp_path):
        wh = str(tmp_path / "whd")
        cat = pxt.Catalog(spark, wh)
        t = cat.create_table("docs", {"i": pxt.Int(False),
                                      "txt": pxt.String()})
        t.insert([{"i": 0, "txt": "x"}])
        t.add_embedding_index("txt", idx_name="e")
        t.drop_embedding_index(idx_name="e")
        t2 = pxt.Catalog(spark, wh).get_table("docs")
        assert getattr(t2, "_indexes", {}) == {}
        assert t2.get_metadata()["indices"] == {}

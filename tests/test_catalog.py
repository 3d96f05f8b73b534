"""Catalog / versioning / computed-column / view tests, mirroring the
reference's versioning + component-view suites (reference
tests/test_snapshot.py, test_component_view.py, test_history.py)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

import pixeltable_spark as pxt
from pixeltable_spark import functions as pxtf
from pixeltable_spark.exprs import ColumnRef


@pytest.fixture()
def cat(spark, tmp_path):
    return pxt.Catalog(spark, str(tmp_path / "warehouse"))


def _mk(cat, name="t"):
    t = cat.create_table(name, {"k": pxt.Int(False), "v": pxt.Float(True),
                                "s": pxt.String(True)}, primary_key=["k"])
    t.insert([{"k": i, "v": float(i), "s": f"s{i}"} for i in range(10)])
    return t


def col(t, name):
    return ColumnRef(name, t.schema[name])


class TestTableLifecycle:
    def test_create_insert_collect(self, cat):
        t = _mk(cat)
        assert t.count() == 10
        rows = t.collect()
        assert rows[0] == {"k": 0, "v": 0.0, "s": "s0"}
        assert t.version == 1

    def test_insert_appends_versions(self, cat):
        t = _mk(cat)
        t.insert([{"k": 100, "v": 1.0, "s": "x"}])
        assert t.count() == 11 and t.version == 2
        # time travel: version 1 had 10 rows
        assert t.df(version=1).count() == 10

    def test_missing_required_column_rejected(self, cat):
        t = _mk(cat)
        with pytest.raises(ValueError, match="required"):
            t.insert([{"v": 5.0, "s": "no k"}])

    def test_duplicate_table_rejected(self, cat):
        _mk(cat)
        with pytest.raises(ValueError, match="exists"):
            cat.create_table("t", {"k": pxt.Int(False)})

    def test_reload_from_disk(self, cat, spark):
        t = _mk(cat)
        t.insert([{"k": 50, "v": 2.0, "s": "y"}])
        cat2 = pxt.Catalog(spark, cat.root)
        t2 = cat2.get_table("t")
        assert t2.count() == 11 and t2.version == 2
        assert t2.primary_key == ["k"]


class TestUpdateDelete:
    def test_update_bumps_version(self, cat):
        t = _mk(cat)
        n = t.update({"v": 99.0}, where=col(t, "k") < 3)
        assert n == 3 and t.version == 2
        vals = {r["k"]: r["v"] for r in t.collect()}
        assert vals[0] == 99.0 and vals[5] == 5.0
        # old version still visible via time travel
        old = {r[0]: r[1] for r in t.df(version=1).select("k", "v").collect()}
        assert old[0] == 0.0

    def test_update_expr_value(self, cat):
        t = _mk(cat)
        t.update({"v": col(t, "v") * 10}, where=col(t, "k") == 4)
        vals = {r["k"]: r["v"] for r in t.collect()}
        assert vals[4] == 40.0

    def test_delete_and_revert(self, cat):
        t = _mk(cat)
        n = t.delete(where=col(t, "k") >= 5)
        assert n == 5 and t.count() == 5
        t.revert()
        assert t.count() == 10 and t.version == 1

    def test_revert_insert(self, cat):
        t = _mk(cat)
        t.insert([{"k": 999, "v": 9.0, "s": "z"}])
        t.revert()
        assert t.count() == 10
        assert all(r["k"] != 999 for r in t.collect())

    def test_batch_update_by_pk(self, cat):
        t = _mk(cat)
        n = t.batch_update([{"k": 2, "v": -2.0}, {"k": 7, "s": "seven"}])
        assert n == 2
        rows = {r["k"]: r for r in t.collect()}
        assert rows[2]["v"] == -2.0 and rows[7]["s"] == "seven"

    def test_history(self, cat):
        t = _mk(cat)
        t.update({"v": 0.0}, where=col(t, "k") == 1)
        t.delete(where=col(t, "k") == 2)
        ops = [h["op"] for h in t.get_versions()]
        assert ops == ["create", "insert", "update", "delete"]


class TestComputedColumns:
    def test_backfill_and_incremental(self, cat):
        t = _mk(cat)
        t.add_computed_column("v2", col(t, "v") * 2)
        assert {r[0] for r in t.ref().df().select("v2").collect()} == {float(i * 2) for i in range(10)}
        # incremental: new insert computes v2 for the new slice only
        t.insert([{"k": 20, "v": 21.0, "s": "a"}])
        got = {r["k"]: r["v2"] for r in
               [x.asDict() for x in t.ref().df().select("k", "v2").collect()]}
        assert got[20] == 42.0

    def test_computed_chain(self, cat):
        t = _mk(cat)
        t.add_computed_column("a", col(t, "v") + 1)
        t.add_computed_column("b", ColumnRef("a", pxt.Float()) * 10)
        got = {r[0]: r[1] for r in t.ref().df().select("k", "b").collect()}
        assert got[3] == 40.0

    def test_update_cascades_computed(self, cat):
        t = _mk(cat)
        t.add_computed_column("v2", col(t, "v") * 2)
        t.update({"v": 100.0}, where=col(t, "k") == 0, cascade=True)
        got = {r[0]: r[1] for r in t.ref().df().select("k", "v2").collect()}
        assert got[0] == 200.0

    def test_cellmd_error_capture(self, cat):
        t = _mk(cat)
        err_expr = col(t, "v").apply(lambda v: 1.0 / (v - 5.0), pxt.Float())
        t.add_computed_column("inv", err_expr, on_error="ignore")
        df = t.ref().df()
        rows = {r["k"]: r.asDict(recursive=True) for r in df.collect()}
        assert rows[6]["inv"] == pytest.approx(1.0)
        assert rows[5]["inv"] is None
        assert rows[5]["_cellmd_inv"]["errortype"] == "ZeroDivisionError"
        assert rows[6]["_cellmd_inv"]["errortype"] is None

    def test_compute_ephemeral(self, cat):
        t = _mk(cat)
        t.add_computed_column("v2", col(t, "v") * 2)
        out = t.compute([{"k": 1000, "v": 7.0, "s": "q"}])
        assert out[0]["v2"] == 14.0
        assert t.count() == 10  # nothing persisted

    def test_recompute_columns(self, cat):
        t = _mk(cat)
        state = {"mult": 2}
        t.add_computed_column("dyn", col(t, "v").apply(lambda v: v * state["mult"], pxt.Float()))
        state["mult"] = 3
        t.recompute_columns(["dyn"], where=col(t, "k") == 1)
        got = {r[0]: r[1] for r in t.ref().df().select("k", "dyn").collect()}
        assert got[1] == 3.0 and got[2] == 4.0


class TestViews:
    def test_predicate_view_incremental(self, cat):
        t = _mk(cat)
        v = cat.create_view("evens", t, predicate=col(t, "k") % 2 == 0)
        assert v.count() == 5
        t.insert([{"k": 12, "v": 1.0, "s": "x"}, {"k": 13, "v": 1.0, "s": "y"}])
        assert v.count() == 6  # only k=12 flowed through

    def test_view_extra_columns(self, cat):
        t = _mk(cat)
        v = cat.create_view("enriched", t,
                            extra_columns={"vv": (col(t, "v") * 100, pxt.Float())})
        rows = v.collect()
        assert rows[3]["vv"] == 300.0

    def test_view_refresh_on_update(self, cat):
        t = _mk(cat)
        v = cat.create_view("big", t, predicate=col(t, "v") >= 5.0)
        assert v.count() == 5
        t.update({"v": 50.0}, where=col(t, "k") == 0)
        assert v.count() == 6
        t.delete(where=col(t, "k") == 9)
        assert v.count() == 5

    def test_component_view_iterator(self, cat):
        t = cat.create_table("docs", {"doc_id": pxt.Int(False), "text": pxt.String(False)})
        t.insert([{"doc_id": 1, "text": "a b c"}, {"doc_id": 2, "text": "x y"}])

        def word_iterator(df):
            toks = F.split(F.col("text"), " ")
            return df.select("_rowid", "_v_min", "_v_max", "doc_id",
                             F.posexplode(toks).alias("_pos", "word"))

        v = cat.create_view("words", t, iterator=word_iterator)
        assert v.count() == 5
        rows = v.collect()
        assert [r["word"] for r in rows] == ["a", "b", "c", "x", "y"]
        t.insert([{"doc_id": 3, "text": "p q r s"}])
        assert v.count() == 9

    def test_snapshot_frozen(self, cat):
        t = _mk(cat)
        snap = cat.create_snapshot("t_snap", t)
        t.insert([{"k": 77, "v": 7.0, "s": "w"}])
        t.update({"v": -1.0}, where=col(t, "k") == 0)
        assert snap.count() == 10
        vals = {r[0]: r[1] for r in snap.df().select("k", "v").collect()}
        assert vals[0] == 0.0  # pre-update value


class TestQueryOverCatalog:
    def test_ref_queryable(self, cat):
        t = _mk(cat)
        t.add_computed_column("v2", col(t, "v") * 2)
        r = t.ref()
        got = (
            r.where(r.k >= 5)
            .select(r.k, total=pxtf.sum(r.v2))
            .group_by(r.k)
            .order_by(r.k)
            .collect()
        )
        assert got[0]["total"] == 10.0

    def test_head_on_table_ref(self, cat):
        t = _mk(cat)
        r = t.ref()
        assert [x["k"] for x in r.head(3).select(r.k).collect()] == [0, 1, 2]


class TestViewPersistence:
    def test_view_survives_catalog_reload(self, cat, spark):
        t = _mk(cat)
        v = cat.create_view("evens", t, predicate=col(t, "k") % 2 == 0)
        assert v.count() == 5
        # new session-equivalent: fresh Catalog object over the same root
        cat2 = pxt.Catalog(spark, cat.root)
        t2 = cat2.get_table("t")
        v2 = cat2.get_table("evens")
        assert isinstance(v2, pxt.View)
        assert v2.count() == 5
        # propagation works through the reloaded pair
        t2.insert([{"k": 100, "v": 1.0, "s": "x"}, {"k": 101, "v": 1.0, "s": "y"}])
        assert v2.count() == 6

    def test_view_catches_up_on_missed_inserts(self, cat, spark):
        t = _mk(cat)
        cat.create_view("evens", t, predicate=col(t, "k") % 2 == 0)
        # simulate another session mutating the base WITHOUT the view loaded
        cat_b = pxt.Catalog(spark, cat.root)
        t_b = cat_b.get_table("t")          # base only; view not loaded
        t_b.insert([{"k": 200, "v": 1.0, "s": "z"}])
        # a later session loads the view -> catch-up refresh
        cat_c = pxt.Catalog(spark, cat.root)
        v_c = cat_c.get_table("evens")
        assert v_c.count() == 6


class TestUDAValidation:
    def test_requires_order_by_enforced(self, spark):
        @pxt.uda(requires_order_by=True)
        class strict_run:
            def __init__(self):
                self.s = 0.0

            def update(self, x):
                self.s += x

            def value(self) -> float:
                return self.s

        from pixeltable_spark.exprs import ColumnRef
        c = ColumnRef("x", pxt.Float())
        with pytest.raises(ValueError, match="requires order_by"):
            strict_run(c, group_by=c)
        strict_run(c, group_by=c, order_by=c)  # fine

    def test_errortype_on_plain_column_friendly(self, test_tbl):
        t = test_tbl
        with pytest.raises(AttributeError, match="no cell metadata"):
            t.c1.errortype


class TestAlterColumn:
    def test_alter_type(self, cat):
        t = _mk(cat)
        t.alter_column("v", pxt.String())
        rows = t.collect()
        assert rows[3]["v"] == "3.0"
        t.insert([{"k": 50, "v": "hello", "s": "x"}])
        assert t.collect()[-1]["v"] == "hello"

    def test_alter_unknown_rejected(self, cat):
        t = _mk(cat)
        with pytest.raises(ValueError, match="non-alterable"):
            t.alter_column("nope", pxt.Int())


class TestNamespaceOps:
    """reference globals.py: ls / list_dirs / get_dir_contents /
    get_dir_tree / drop_dir / move"""

    def _layout(self, cat):
        cat.create_dir("proj")
        cat.create_dir("proj.raw")
        _mk(cat, "proj.raw.docs")
        _mk(cat, "proj.clean")
        _mk(cat, "top")
        return cat

    def test_list_dirs_and_contents(self, cat):
        self._layout(cat)
        assert cat.list_dirs() == ["proj", "proj.raw"]
        c = cat.get_dir_contents("proj")
        assert c == {"dirs": ["proj.raw"], "tables": ["proj.clean"]}
        rec = cat.get_dir_contents("", recursive=True)
        assert "proj.raw.docs" in rec["tables"] and "top" in rec["tables"]

    def test_ls_kinds_and_tree(self, cat):
        self._layout(cat)
        kinds = {e["name"]: e["kind"] for e in cat.ls()}
        assert kinds["proj"] == "dir" and kinds["top"] == "table"
        tree = cat.get_dir_tree()
        assert tree["dirs"]["proj"]["dirs"]["raw"]["tables"] == ["docs"]

    def test_drop_dir_refuses_nonempty(self, cat):
        import pytest
        self._layout(cat)
        with pytest.raises(ValueError, match="not empty"):
            cat.drop_dir("proj")
        cat.drop_dir("proj", force=True)
        assert "proj.clean" not in cat.list_tables()
        assert cat.list_dirs() == []

    def test_move_table_keeps_data(self, cat):
        self._layout(cat)
        t = cat.get_table("top")
        v0 = t.df().count()
        cat.move("top", "proj.renamed")
        t2 = cat.get_table("proj.renamed")
        assert t2.df().count() == v0 == 10
        assert "top" not in cat.list_tables()
        # the cached handle was re-keyed, not copied
        assert t2 is t

    def test_move_directory(self, cat):
        self._layout(cat)
        cat.move("proj.raw", "proj.archived")
        assert "proj.archived.docs" in cat.list_tables()
        assert cat.get_table("proj.archived.docs").df().count() == 10

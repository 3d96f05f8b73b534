"""batch_update if_not_exists / return_rows parity
(reference catalog/table.py:978-1024: 'error' default, 'ignore' skips,
'insert' upserts; return_rows returns the new stored values)."""

from __future__ import annotations

import pytest

import pixeltable_spark as pxt
from pixeltable_spark.exprs import ColumnRef


@pytest.fixture()
def t(spark, tmp_path):
    cat = pxt.Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("t", {"k": pxt.Int(False), "v": pxt.Float(True),
                               "s": pxt.String(True)}, primary_key=["k"])
    t.insert([{"k": i, "v": float(i), "s": f"s{i}"} for i in range(10)])
    return t


class TestIfNotExists:
    def test_default_errors_on_missing_key(self, t):
        v0 = t.version
        with pytest.raises(ValueError, match="no matching primary key"):
            t.batch_update([{"k": 1, "v": -1.0}, {"k": 99, "v": -2.0}])
        # the error aborts BEFORE any commit
        assert t.version == v0
        assert {r["k"]: r["v"] for r in t.collect()}[1] == 1.0

    def test_ignore_skips(self, t):
        st = t.batch_update([{"k": 1, "v": -1.0}, {"k": 99, "v": -2.0}],
                            if_not_exists="ignore")
        assert st.num_rows == 1
        rows = {r["k"] for r in t.collect()}
        assert 99 not in rows

    def test_insert_upserts_in_same_version(self, t):
        v0 = t.version
        st = t.batch_update([{"k": 1, "v": -1.0},
                             {"k": 99, "v": -2.0, "s": "new"}],
                            if_not_exists="insert")
        assert st.num_rows == 2
        assert t.version == v0 + 1, "upsert must be ONE commit"
        rows = {r["k"]: r for r in t.collect()}
        assert rows[1]["v"] == -1.0
        assert rows[99]["v"] == -2.0 and rows[99]["s"] == "new"
        # inserted rowid continues the sequence — next insert no clash
        t.insert([{"k": 100, "v": 0.0, "s": None}])
        assert t.count() == 12

    def test_pure_insert_batch(self, t):
        st = t.batch_update([{"k": 50, "v": 5.0}, {"k": 51, "v": 5.1}],
                            if_not_exists="insert")
        assert st.num_rows == 2
        assert t.count() == 12

    def test_insert_missing_required_column_errors(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh2"))
        t2 = cat.create_table(
            "t2", {"k": pxt.Int(False), "r": pxt.Int(False)},
            primary_key=["k"])
        t2.insert([{"k": 1, "r": 1}])
        with pytest.raises(ValueError, match="missing required column"):
            t2.batch_update([{"k": 9}], if_not_exists="insert")

    def test_bad_directive_rejected(self, t):
        with pytest.raises(ValueError, match="if_not_exists"):
            t.batch_update([{"k": 1, "v": 0.0}], if_not_exists="nope")

    def test_upsert_runs_computed_columns(self, t):
        t.add_computed_column("v2", ColumnRef("v", t.schema["v"]) * 2.0,
                              pxt.Float())
        t.batch_update([{"k": 1, "v": 10.0}, {"k": 77, "v": 7.0}],
                       if_not_exists="insert")
        rows = {r["k"]: r["v2"] for r in t.collect()}
        assert rows[1] == 20.0 and rows[77] == 14.0

    def test_upsert_propagates_to_views(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh3"))
        t = cat.create_table("b", {"k": pxt.Int(False), "v": pxt.Float(True)},
                             primary_key=["k"])
        t.insert([{"k": i, "v": float(i)} for i in range(5)])
        vref = ColumnRef("v", t.schema["v"])
        view = cat.create_view("big", t, predicate=vref >= 3.0)
        assert view.count() == 2
        t.batch_update([{"k": 1, "v": 9.0},    # enters the view
                        {"k": 50, "v": 8.0}],  # upserted, enters too
                       if_not_exists="insert")
        got = {r["k"]: r["v"] for r in
               view.df().select("k", "v").collect()}
        assert got == {1: 9.0, 3: 3.0, 4: 4.0, 50: 8.0}


class TestReturnRows:
    def test_rows_returned_with_new_values(self, t):
        st = t.batch_update([{"k": 2, "v": -2.0},
                             {"k": 88, "v": 8.0, "s": "ins"}],
                            if_not_exists="insert", return_rows=True)
        got = {r["k"]: r for r in st.rows}
        assert set(got) == {2, 88}
        assert got[2]["v"] == -2.0 and got[2]["s"] == "s2"
        assert got[88]["s"] == "ins"

    def test_rows_none_by_default(self, t):
        st = t.batch_update([{"k": 2, "v": -2.0}], return_rows=False)
        assert st.rows is None

    def test_ignore_with_return_rows_excludes_missing(self, t):
        st = t.batch_update([{"k": 2, "v": -2.0}, {"k": 99, "v": 0.0}],
                            if_not_exists="ignore", return_rows=True)
        assert {r["k"] for r in st.rows} == {2}

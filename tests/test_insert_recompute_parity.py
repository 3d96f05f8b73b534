"""insert() and recompute_columns() reference-parity surface
(reference catalog/table.py:675-804 insert kwargs/source/on_error/
return_rows; :1025-1061 recompute varargs/errors_only/cascade)."""

from __future__ import annotations

import os

import pytest

import pixeltable_spark as pxt
from pixeltable_spark.exprs import ColumnRef


@pytest.fixture()
def cat(spark, tmp_path):
    return pxt.Catalog(spark, str(tmp_path / "wh"))


def _kv(cat, name="t"):
    return cat.create_table(name, {"k": pxt.Int(False),
                                   "v": pxt.Float(True)},
                            primary_key=["k"])


class TestInsertParity:
    def test_kwargs_single_row(self, cat):
        t = _kv(cat)
        st = t.insert(k=1, v=2.5)
        assert st.num_rows == 1
        assert t.collect() == [{"k": 1, "v": 2.5}]
        with pytest.raises(ValueError, match="EITHER"):
            t.insert([{"k": 2, "v": 0.0}], k=3)
        with pytest.raises(ValueError, match="provide a source"):
            t.insert()

    def test_path_source_csv_with_overrides(self, cat, tmp_path):
        p = str(tmp_path / "rows.csv")
        with open(p, "w") as f:
            f.write("k,v\n10,1.5\n11,2.5\n")
        t = _kv(cat)
        st = t.insert(p, schema_overrides={"k": pxt.Int(False),
                                           "v": pxt.Float()})
        assert st.num_rows == 2
        got = {r["k"]: r["v"] for r in t.collect()}
        assert got == {10: 1.5, 11: 2.5}

    def test_path_source_unknown_format(self, cat, tmp_path):
        t = _kv(cat)
        with pytest.raises(ValueError, match="source_format"):
            t.insert(str(tmp_path / "x.weird"))

    def test_on_error_ignore_nulls_failing_cells(self, cat):
        t = _kv(cat)
        vref = ColumnRef("v", t.schema["v"])
        t.add_computed_column(
            "inv", vref.apply(lambda x: 1.0 / x), pxt.Float())
        # v=0 raises in the computed column; abort (default) fails the batch
        with pytest.raises(Exception):
            t.insert([{"k": 1, "v": 0.0}])
        assert t.count() == 0
        st = t.insert([{"k": 1, "v": 0.0}, {"k": 2, "v": 4.0}],
                      on_error="ignore")
        assert st.num_rows == 2 and st.num_excs == 1
        got = {r["k"]: r["inv"] for r in t.collect()}
        assert got[1] is None and got[2] == 0.25

    def test_return_rows_and_print_stats(self, cat, capsys):
        t = _kv(cat)
        st = t.insert([{"k": 5, "v": 1.0}], return_rows=True,
                      print_stats=True)
        assert st.rows == [{"k": 5, "v": 1.0}]
        assert "insert: 1 rows" in capsys.readouterr().out


class TestUpdateReturnRows:
    def test_update_return_rows(self, cat):
        t = _kv(cat)
        t.insert([{"k": i, "v": float(i)} for i in range(5)])
        kref = ColumnRef("k", t.schema["k"])
        st = t.update({"v": 99.0}, where=kref < 2, return_rows=True)
        assert st.num_rows == 2
        assert sorted(r["k"] for r in st.rows) == [0, 1]
        assert all(r["v"] == 99.0 for r in st.rows)
        st2 = t.update({"v": 0.0}, where=kref > 100, return_rows=True)
        assert st2.rows == []
        st3 = t.update({"v": 1.0}, where=kref == 3)
        assert st3.rows is None


class TestRecomputeParity:
    def test_varargs_and_cascade(self, cat):
        t = _kv(cat)
        vref = ColumnRef("v", t.schema["v"])
        t.add_computed_column("c1", vref * 2.0, pxt.Float())
        c1ref = ColumnRef("c1", pxt.Float())
        t.add_computed_column("c2", c1ref + 1.0, pxt.Float())
        t.insert([{"k": 1, "v": 1.0}])
        # stale both computed cols: bypass the cascade on update
        t.update({"v": 10.0}, cascade=False)
        rows = t.collect()[0]
        assert rows["c1"] == 2.0 and rows["c2"] == 3.0  # stale
        t.recompute_columns("c1", cascade=False)
        rows = t.collect()[0]
        assert rows["c1"] == 20.0 and rows["c2"] == 3.0  # c2 untouched
        t.update({"v": 100.0}, cascade=False)
        t.recompute_columns("c1")  # cascade=True default pulls c2 along
        rows = t.collect()[0]
        assert rows["c1"] == 200.0 and rows["c2"] == 201.0

    def test_errors_only(self, cat):
        t = _kv(cat)
        vref = ColumnRef("v", t.schema["v"])

        def inv(x):
            if x < 0:
                raise ValueError("neg")
            return 1.0 / x

        t.add_computed_column("inv", vref.apply(inv), pxt.Float(),
                              on_error="ignore")
        t.insert([{"k": 1, "v": -1.0}, {"k": 2, "v": 4.0}])
        got = {r["k"]: r["inv"] for r in t.user_df().collect()}
        assert got[1] is None and got[2] == 0.25
        # repair the bad row's input WITHOUT cascading, then recompute
        # only the errored rows: row 2 must keep its (now stale-proof)
        # value even though v changed for it too
        t.update({"v": 2.0}, cascade=False)  # both rows: v=2.0
        st = t.recompute_columns("inv", errors_only=True, cascade=False)
        assert st.num_rows == 1
        got = {r["k"]: r["inv"] for r in t.user_df().collect()}
        assert got[1] == 0.5          # recomputed from the fixed input
        assert got[2] == 0.25         # NOT recomputed (no error recorded)

    def test_errors_only_requires_single_tolerant_column(self, cat):
        t = _kv(cat)
        vref = ColumnRef("v", t.schema["v"])
        t.add_computed_column("c1", vref * 2.0, pxt.Float())
        with pytest.raises(ValueError, match="tolerance"):
            t.recompute_columns("c1", errors_only=True)
        t.add_computed_column("c2", vref * 3.0, pxt.Float())
        with pytest.raises(ValueError, match="single column"):
            t.recompute_columns("c1", "c2", errors_only=True)

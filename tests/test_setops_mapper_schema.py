"""Set operations, JsonMapper >>, and schema-evolution tests."""

from __future__ import annotations

import pytest

import pixeltable_spark as pxt
from pixeltable_spark import functions as pxtf
from pixeltable_spark.exprs import ColumnRef


class TestSetOps:
    def test_union_all(self, test_tbl):
        t = test_tbl
        a = t.where(t.c2 < 10).select(t.c2)
        b = t.where(t.c2 < 5).select(t.c2)
        assert a.union_all(b).count() == 15
        assert a.union(b).count() == 10

    def test_intersect_except(self, test_tbl):
        t = test_tbl
        a = t.where(t.c2 < 10).select(t.c2)
        b = t.where((t.c2 >= 5) & (t.c2 < 20)).select(t.c2)
        assert a.intersect(b).count() == 5
        assert a.except_(b).count() == 5

    def test_setop_composes(self, test_tbl):
        t = test_tbl
        u = t.where(t.c2 < 3).select(t.c2).union_all(t.where(t.c2 < 2).select(t.c2))
        q = u.group_by(ColumnRef("c2", pxt.Int())).select(
            c2=ColumnRef("c2", pxt.Int()), n=pxtf.count(ColumnRef("c2", pxt.Int())))
        got = {r["c2"]: r["n"] for r in q.collect()}
        assert got == {0: 2, 1: 2, 2: 1}


class TestJsonMapper:
    def test_map_over_list(self, test_tbl):
        t = test_tbl
        got = (
            t.where(t.c2 == 1)
            .select(m=t.c7 >> (pxt.R.f2 * 10))
            .collect()
        )
        import json
        assert json.loads(got[0]["m"]) == [10, 20]

    def test_mapper_mixes_absolute_refs(self, test_tbl):
        t = test_tbl
        got = (
            t.where(t.c2 == 3)
            .select(m=t.c7 >> (pxt.R.f2 + t.c2))
            .collect()
        )
        import json
        assert json.loads(got[0]["m"]) == [4, 5]

    def test_mapper_equivalent_to_json_map(self, test_tbl):
        """Dual-form check (reference tests/test_exprs.py:860-1039): >> and
        pxtf.json.map produce identical results."""
        t = test_tbl
        a = t.where(t.c2 < 5).select(t.c2, m=t.c7 >> pxt.R.f1).order_by(t.c2).collect()
        b = t.where(t.c2 < 5).select(
            t.c2, m=pxtf.json.map(t.c7, lambda r: r["f1"])).order_by(t.c2).collect()
        assert [r["m"] for r in a] == [r["m"] for r in b]


class TestSchemaEvolution:
    @pytest.fixture()
    def cat(self, spark, tmp_path):
        return pxt.Catalog(spark, str(tmp_path / "wh"))

    def _mk(self, cat):
        t = cat.create_table("t", {"k": pxt.Int(False), "v": pxt.Float(True)})
        t.insert([{"k": i, "v": float(i)} for i in range(5)])
        return t

    def test_add_column_with_default(self, cat):
        t = self._mk(cat)
        t.add_column("tag", pxt.String(), default="new")
        rows = t.collect()
        assert all(r["tag"] == "new" for r in rows)
        t.insert([{"k": 10, "v": 1.0, "tag": "explicit"}])
        assert {r["tag"] for r in t.collect()} == {"new", "explicit"}

    def test_drop_column(self, cat):
        t = self._mk(cat)
        t.add_column("tag", pxt.String())
        t.drop_column("tag")
        assert "tag" not in t.collect()[0]

    def test_drop_referenced_column_rejected(self, cat):
        t = self._mk(cat)
        t.add_computed_column("v2", ColumnRef("v", pxt.Float()) * 2)
        with pytest.raises(ValueError, match="referenced by computed"):
            t.drop_column("v")
        t.drop_column("v2")  # dropping the computed column itself is fine
        with pytest.raises(ValueError, match="unknown column"):
            t.drop_column("v2")

    def test_rename_column_rewrites_computed(self, cat):
        t = self._mk(cat)
        t.add_computed_column("v2", ColumnRef("v", pxt.Float()) * 2)
        t.rename_column("v", "value")
        assert "value" in t.schema and "v" not in t.schema
        # computed column still works against the renamed source on insert
        t.insert([{"k": 50, "value": 7.0}])
        got = {r[0]: r[1] for r in t.ref().df().select("k", "v2").collect()}
        assert got[50] == 14.0


class TestMapFilterSortSugar:
    """reference functions/globals.py:267 map / :314 filter / :362 sort"""

    def _t(self, spark):
        import json

        import pixeltable_spark as pxt
        return pxt.table_from_rows(spark, [
            {"id": 1, "data": json.dumps([3, 1, 2])},
            {"id": 2, "data": json.dumps([10, -5])},
            {"id": 3, "data": None},
        ], {"id": "int", "data": "json"})

    def test_map(self, spark):
        import json

        from pixeltable_spark import functions as pxtf
        t = self._t(spark)
        r = {row["id"]: row["m"] for row in
             t.select(t.id, m=pxtf.map(t.data, lambda x: x * 2))
              .order_by(t.id).collect()}
        assert json.loads(r[1]) == [6, 2, 4]
        assert r[3] is None

    def test_filter_jvm_raw_text(self, spark):
        from pixeltable_spark import functions as pxtf
        t = self._t(spark)
        r = {row["id"]: row["f"] for row in
             t.select(t.id, f=pxtf.filter(t.data, lambda x: x > 1))
              .order_by(t.id).collect()}
        assert r[1] == "[3,2]" and r[2] == "[10]"
        assert r[3] is None

    def test_sort_identity_and_key(self, spark):
        import json

        from pixeltable_spark import functions as pxtf
        t = self._t(spark)
        rows = t.select(
            t.id, s=pxtf.sort(t.data),
            d=pxtf.sort(t.data, key=lambda x: x * 1, asc=False),
        ).order_by(t.id).collect()
        got = {r["id"]: (r["s"], r["d"]) for r in rows}
        assert json.loads(got[1][0]) == [1, 2, 3]
        assert json.loads(got[1][1]) == [3, 2, 1]
        assert json.loads(got[2][0]) == [-5, 10]

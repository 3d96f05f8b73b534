"""Reference-shaped metadata surface: get_metadata / get_versions /
history_report / list_views / describe / UpdateStatus
(reference catalog/table_metadata.py, catalog/update_status.py:55,
catalog/table.py:1111)."""

from __future__ import annotations

import pytest

import pixeltable_spark as pxt


@pytest.fixture()
def cat(spark, tmp_path):
    return pxt.Catalog(spark, str(tmp_path / "store"))


class TestMetadata:
    def test_update_status_is_count_compatible(self, cat):
        t = cat.create_table("t", {"k": pxt.Int(False), "v": pxt.Float()},
                             primary_key=["k"])
        st = t.insert([{"k": 1, "v": 1.0}, {"k": 2, "v": 2.0}])
        assert st == 2 and st.num_rows == 2 and st.op == "insert"
        st = t.update({"v": pxt.Literal(9.0)}, where=t.ref().k == 1)
        assert st == 1 and st.op == "update"
        st = t.delete(t.ref().k == 2)
        assert st == 1 and st.op == "delete"

    def test_get_metadata_shape(self, cat):
        t = cat.create_table("films", {"name": pxt.String(False),
                                       "revenue": pxt.Float()},
                             primary_key=["name"])
        t.add_computed_column("double_rev", t.ref().revenue * 2)
        md = t.get_metadata()
        assert md["kind"] == "table" and md["name"] == "films"
        assert md["primary_key"] == ["name"]
        assert md["columns"]["name"]["is_primary_key"]
        assert md["columns"]["double_rev"]["is_computed"]
        assert md["columns"]["double_rev"]["computed_with"]
        assert md["version"] == t.version

    def test_versions_and_history(self, cat):
        t = cat.create_table("t", {"k": pxt.Int(False)})
        t.insert([{"k": 1}])
        t.insert([{"k": 2}, {"k": 3}])
        t.delete(t.ref().k == 1)
        vs = t.get_versions()
        assert [v["op"] for v in vs] == ["create", "insert", "insert", "delete"]
        assert vs[0]["change_type"] == "schema"
        assert vs[2]["inserts"] == 2 and vs[3]["deletes"] == 1
        rep = t.history_report(n=2)
        assert len(rep) == 2
        assert rep.iloc[0]["version"] >= rep.iloc[1]["version"]

    def test_views_metadata_and_describe(self, cat):
        t = cat.create_table("base", {"k": pxt.Int(False)})
        t.insert([{"k": i} for i in range(6)])
        v = cat.create_view("evens", t, predicate=t.ref().k % 2 == 0)
        assert t.list_views() == ["evens"]
        md = v.get_metadata()
        assert md["kind"] == "view" and md["is_view"] and md["base"] == "base"
        d = t.describe()
        assert "table 'base'" in d and "k: int" in d

    def test_index_metadata(self, cat):
        t = cat.create_table("docs", {"txt": pxt.String(False)})
        t.insert([{"txt": "hello world"}])
        pxt.add_embedding_index(t, "txt", dim=8)
        md = t.get_metadata()
        assert len(md["indices"]) == 1
        ix = next(iter(md["indices"].values()))
        assert ix["index_type"] == "embedding" and ix["columns"] == ["txt"]

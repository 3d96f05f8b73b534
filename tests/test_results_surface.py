"""ResultSet / Row / ResultCursor + query-handle mutations
(reference _query.py:54-380 ResultSet/Row/ResultCursor,
_query.py:1800-1875 Query.update/delete/recompute_columns)."""
import json

import pytest

import pixeltable_spark as pxt
from pixeltable_spark.results import ResultCursor, ResultSet, Row


@pytest.fixture(scope="module")
def nation(spark):
    return pxt.table_from_parquet(
        spark, "/root/testdata/sf0.001/nation.parquet")


class TestResultSet:
    def test_list_compat(self, nation):
        rs = nation.select(nation.n_name, nation.n_regionkey).collect()
        assert isinstance(rs, ResultSet) and isinstance(rs, list)
        assert rs == list(rs)                      # element-wise equality
        assert isinstance(rs[0], dict)
        assert len(rs) == 25
        assert json.loads(json.dumps(rs)) == list(rs)  # JSON round-trips

    def test_column_indexing(self, nation):
        rs = (nation.select(nation.n_name, nation.n_nationkey)
              .order_by(nation.n_nationkey).collect())
        assert rs["n_name"][:2] == ["NATION_0", "NATION_1"]
        assert rs[1, "n_name"] == "NATION_1"
        assert rs[2, 0] == "NATION_2"              # positional column
        with pytest.raises(KeyError):
            rs["nope"]
        with pytest.raises(KeyError):
            rs[0, "nope"]
        with pytest.raises(TypeError):
            rs[0, 1, 2]

    def test_schema_and_pandas(self, nation):
        rs = nation.select(nation.n_name, nation.n_nationkey).collect()
        assert rs.schema == {"n_name": "STRING", "n_nationkey": "INT"}
        pdf = rs.to_pandas()
        assert list(pdf.columns) == ["n_name", "n_nationkey"]
        assert len(pdf) == 25

    def test_query_schema_property(self, nation):
        q = nation.select(nation.n_name, key=nation.n_nationkey + 1)
        assert q.schema["n_name"] == "STRING"
        assert "key" in q.schema

    def test_describe_repr(self, nation, capsys):
        q = (nation.where(nation.n_regionkey == 1)
             .select(nation.n_name).order_by(nation.n_name).limit(3))
        q.describe()
        out = capsys.readouterr().out
        assert "where" in out and "limit: 3" in out

    def test_to_pydantic(self, nation):
        pydantic = pytest.importorskip("pydantic")

        class NationRow(pydantic.BaseModel):
            n_name: str
            n_nationkey: int

        rs = (nation.select(nation.n_name, nation.n_nationkey)
              .order_by(nation.n_nationkey).limit(2).collect())
        models = list(rs.to_pydantic(NationRow))
        assert models[0].n_name == "NATION_0"

        class Wrong(pydantic.BaseModel):
            missing_col: int

        with pytest.raises(ValueError, match="missing"):
            rs.to_pydantic(Wrong)


class TestRow:
    def test_mapping_protocol(self):
        r = Row({"a": 1, "b": None})
        assert r["a"] == 1 and r.get("c", 9) == 9
        assert "a" in r and "c" not in r
        assert dict(r) == {"a": 1, "b": None}
        assert len(r) == 2
        with pytest.raises(KeyError):
            r["zzz"]

    def test_to_json_coercions(self):
        import datetime
        import uuid

        r = Row({
            "ts": datetime.datetime(2024, 1, 2, 3, 4, 5),
            "d": datetime.date(2024, 1, 2),
            "u": uuid.UUID("12345678123456781234567812345678"),
            "blob": b"\x00\x01",
            "s": "x", "n": None,
        })
        j = r.to_json()
        assert j["ts"] == "2024-01-02T03:04:05"
        assert j["d"] == "2024-01-02"
        assert j["u"] == "12345678-1234-5678-1234-567812345678"
        assert "blob" not in j            # binary omitted
        assert j["s"] == "x" and j["n"] is None
        json.dumps(j)                     # actually serializable


class TestResultCursor:
    def test_streaming_iteration(self, nation):
        q = (nation.select(nation.n_name)
             .order_by(nation.n_nationkey))
        rows = [r["n_name"] for r in q.cursor()]
        assert rows[:3] == ["NATION_0", "NATION_1", "NATION_2"]
        assert len(rows) == 25

    def test_context_manager_early_break(self, nation):
        q = nation.select(nation.n_name).order_by(nation.n_nationkey)
        with q.cursor() as cur:
            assert cur.schema == {"n_name": "STRING"}
            for i, row in enumerate(cur):
                assert isinstance(row, Row)
                if i == 1:
                    break
        with pytest.raises(RuntimeError):
            cur.open()                    # closed, cannot reopen

    def test_lifecycle_errors(self, nation):
        cur = ResultCursor(nation.select(nation.n_name))
        cur.open()
        with pytest.raises(RuntimeError):
            cur.open()                    # double open
        cur.close()
        with pytest.raises(RuntimeError):
            list(cur)                     # iterate after close

    def test_as_result_set(self, nation):
        q = nation.select(nation.n_name).order_by(nation.n_nationkey)
        rs = q.cursor().as_result_set()
        assert isinstance(rs, ResultSet)
        assert len(rs) == 25 and rs[0]["n_name"] == "NATION_0"


class TestQueryMutations:
    @pytest.fixture()
    def tbl(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh"))
        t = cat.create_table("t", {"k": pxt.Int(False), "x": pxt.Int()})
        t.insert([{"k": i, "x": i} for i in range(6)])
        return cat, t

    def test_update_through_where(self, tbl):
        cat, t = tbl
        r = t.ref()
        st = t.where(r.x >= 4).update({"x": 100})
        assert st.num_rows == 2
        assert sorted(row["x"] for row in t.collect()) \
            == [0, 1, 2, 3, 100, 100]

    def test_delete_through_where(self, tbl):
        cat, t = tbl
        r = t.ref()
        t.where(r.x <= 1).delete()
        assert sorted(row["x"] for row in t.collect()) == [2, 3, 4, 5]

    def test_recompute_through_where(self, tbl):
        cat, t = tbl
        t.add_computed_column("y", t.ref().x * 2)
        st = t.where(t.ref().x == 2).recompute_columns("y")
        assert st.num_rows >= 1
        assert sorted((row["x"], row["y"]) for row in t.collect()) \
            == [(i, 2 * i) for i in range(6)]

    def test_mutation_op_sequence_refusals(self, tbl):
        cat, t = tbl
        r = t.ref()
        with pytest.raises(ValueError, match="order_by"):
            t.where(r.x > 0).order_by(r.x).delete()
        with pytest.raises(ValueError, match="select"):
            t.select(r.x).update({"x": 1})
        with pytest.raises(ValueError, match="limit"):
            t.where(r.x > 0).limit(2).delete()
        with pytest.raises(ValueError, match="group_by"):
            t.group_by(r.x).delete()

    def test_snapshot_and_view_refusals(self, tbl):
        cat, t = tbl
        pinned = t.ref(version=1)
        with pytest.raises(ValueError, match="snapshot|pinned"):
            pinned.where(pinned.x > 0).delete()
        v = cat.create_view("v", t, predicate=t.ref().x > 0)
        with pytest.raises(ValueError, match="view"):
            v.where(v.ref().x > 1).delete()
        # a query not rooted at a catalog table refuses too
        import pixeltable_spark as _pxt
        free = _pxt.table_from_parquet(
            cat.spark, "/root/testdata/sf0.001/nation.parquet")
        with pytest.raises(ValueError, match="catalog table"):
            free.where(free.n_nationkey > 0).delete()

    def test_table_cursor(self, tbl):
        cat, t = tbl
        rows = list(t.cursor())
        assert [r["k"] for r in rows] == list(range(6))
        assert isinstance(rows[0], Row)

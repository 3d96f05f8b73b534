"""Module-level API parity (globals_api.py vs reference globals.py):
default catalog via init(), top-level create/get/ls/move, typed
exceptions, tool()/retrieval_udf()/expr_udf()."""

from __future__ import annotations

import pytest

import pixeltable_spark as pxt


@pytest.fixture()
def g(spark, tmp_path, monkeypatch):
    """Fresh default catalog per test (isolated home dir)."""
    import pixeltable_spark.globals_api as G
    monkeypatch.setattr(G, "_catalog", None)
    G.init(spark, home_dir=str(tmp_path / "store"))
    return G


class TestModuleApi:
    def test_create_get_list_drop(self, g):
        t = pxt.create_table("films", {"name": pxt.String, "revenue": pxt.Float})
        t.insert([{"name": "a", "revenue": 1.0}, {"name": "b", "revenue": 2.0}])
        assert "films" in pxt.list_tables()
        t2 = pxt.get_table("films")
        assert t2.user_df().count() == 2
        pxt.drop_table("films")
        assert "films" not in pxt.list_tables()

    def test_dirs_ls_move(self, g):
        pxt.create_dir("proj")
        pxt.create_table("proj.t1", {"x": pxt.Int})
        assert "proj" in pxt.list_dirs()
        names = {e["name"] for e in pxt.ls("proj")}
        assert "proj.t1" in names
        pxt.move("proj.t1", "proj.t2")
        assert "proj.t2" in pxt.list_tables()
        tree = pxt.get_dir_tree()
        assert tree is not None

    def test_typed_exceptions(self, g):
        pxt.create_table("dup", {"x": pxt.Int})
        with pytest.raises(pxt.AlreadyExistsError):
            pxt.create_table("dup", {"x": pxt.Int})
        with pytest.raises(pxt.NotFoundError):
            pxt.get_table("missing_table")
        with pytest.raises(pxt.NotFoundError):
            pxt.ls("missing_dir")
        # builtin-compat: legacy except-clauses still catch them
        with pytest.raises(ValueError):
            pxt.create_table("dup", {"x": pxt.Int})
        assert pxt.ErrorCode.TABLE_NOT_FOUND.http_status == 404
        assert pxt.ErrorCode.RATE_LIMITED.is_retryable

    def test_error_code_values_match_reference(self, g):
        """Pin the published numeric groups (reference exceptions.py:37-90):
        clients matching codes across the two systems must agree."""
        EC = pxt.ErrorCode
        assert EC.COLUMN_NOT_FOUND.value == 1000
        assert EC.COLUMN_ALREADY_EXISTS.value == 2000
        assert EC.INVALID_COLUMN_NAME.value == 3000
        assert EC.INSUFFICIENT_PRIVILEGES.value == 4000
        assert EC.PROVIDER_ERROR.value == 5000
        # 6xxx = ServiceUnavailable family, 7xxx = Concurrency family
        assert EC.DATABASE_UNAVAILABLE.value == 6000
        assert EC.STORE_UNAVAILABLE.value == 6001
        assert EC.SERIALIZATION_FAILURE.value == 7000
        assert EC.CONCURRENT_MODIFICATION.value == 7001
        from pixeltable_spark.exceptions import (ConcurrencyError,
                                                 ServiceUnavailableError)
        assert ConcurrencyError("x").code.value // 1000 == 7
        assert ServiceUnavailableError("x").code.value // 1000 == 6

    def test_retrieval_udf(self, g):
        t = pxt.create_table("kb", {"topic": pxt.String, "fact": pxt.String})
        t.insert([{"topic": "sky", "fact": "blue"},
                  {"topic": "grass", "fact": "green"},
                  {"topic": "sky", "fact": "high"}])
        fetch = pxt.retrieval_udf(t, parameters=["topic"], limit=10)
        rows = fetch(topic="sky")
        assert sorted(r["fact"] for r in rows) == ["blue", "high"]
        assert fetch(topic="sea") == []
        # wraps as a tool with the right parameter schema
        tl = pxt.tool(fetch, description="lookup facts")
        spec = tl.spec()
        assert list(spec["parameters"]["properties"]) == ["topic"]
        with pytest.raises(pxt.RequestError):
            pxt.retrieval_udf(t, parameters=["nope"])

    def test_expr_udf_stays_jvm(self, g, spark):
        from pyspark.sql import functions  # noqa: F401
        from pixeltable_spark import functions as pxtf

        @pxt.expr_udf
        def shout(s):
            return s.upper() + "!"

        t = pxt.create_table("docs", {"s": pxt.String})
        t.insert([{"s": "hej"}, {"s": "da"}])
        res = {r["v"] for r in t.select(v=shout(t.s)).collect()}
        assert res == {"HEJ!", "DA!"}
        # macro substitution, not a Python UDF: compiles to a JVM plan
        q = t.select(v=shout(t.s))
        plan = q.df()._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_list_functions(self, g):
        fns = pxt.list_functions()
        assert any("upper" in f for f in fns)
        assert len(fns) > 100

    def test_array_required_show(self, g, capsys):
        t = pxt.create_table("req", {"a": pxt.Required(pxt.String),
                                     "b": pxt.Float})
        assert t.schema["a"].nullable is False
        assert t.schema["b"].nullable is True
        t.insert([{"a": "x", "b": 1.5}])
        rows = t.select(t["a"], v=pxt.array([1.0, 2.0])).show(5)
        assert rows == [{"a": "x", "v": [1.0, 2.0]}]
        out = capsys.readouterr().out
        assert "a | v" in out

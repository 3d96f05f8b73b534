"""pivot_table / melt (operators/reshape.py): semantics, fill, schema
stability with explicit pivot values, melt type promotion, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.reshape import melt, pivot_table


@pytest.fixture()
def long_df(spark):
    rows = [
        (1, "a", 10.0), (1, "a", 5.0), (1, "b", 2.0),
        (2, "b", 7.0),
    ]
    return spark.createDataFrame(rows, ["k", "cat", "v"])


class TestPivot:
    def test_sum_with_fill(self, spark, long_df):
        out = {r["k"]: (r["a"], r["b"], r["c"])
               for r in pivot_table(long_df, ["k"], "cat", "v", "sum",
                                    pivot_values=["a", "b", "c"],
                                    fill_value=0).collect()}
        assert out == {1: (15.0, 2.0, 0.0), 2: (0.0, 7.0, 0.0)}

    def test_explicit_values_fix_schema(self, spark, long_df):
        out = pivot_table(long_df, ["k"], "cat", "v", "count",
                          pivot_values=["z"])
        assert out.columns == ["k", "z"]
        assert all(r["z"] is None for r in out.collect())

    def test_inferred_values(self, spark, long_df):
        out = pivot_table(long_df, ["k"], "cat", "v", "max")
        assert set(out.columns) == {"k", "a", "b"}

    def test_two_phase_aggregate_plan(self, spark, long_df):
        plan = pivot_table(long_df, ["k"], "cat", "v", "sum",
                           pivot_values=["a", "b"]) \
            ._jdf.queryExecution().executedPlan().toString()
        # Spark's two-phase pivot: agg by (k, cat), then pivot_first by
        # k — exactly two exchanges, both carrying combined aggregates,
        # and no join/expand
        assert plan.count("Exchange") == 2
        assert "Join" not in plan and "Expand" not in plan


class TestMelt:
    @pytest.fixture()
    def wide(self, spark):
        return spark.createDataFrame(
            [(1, 10, 1.5), (2, 20, 2.5)], ["id", "x", "y"])

    def test_roundtrip_shape(self, spark, wide):
        out = melt(wide, ["id"], ["x", "y"]).collect()
        got = {(r["id"], r["variable"]): r["value"] for r in out}
        # int x promoted to double alongside y
        assert got == {(1, "x"): 10.0, (1, "y"): 1.5,
                       (2, "x"): 20.0, (2, "y"): 2.5}

    def test_custom_names(self, spark, wide):
        out = melt(wide, ["id"], ["x"], var_name="m", value_name="val")
        assert out.columns == ["id", "m", "val"]

    def test_zero_shuffle(self, spark, wide):
        plan = melt(wide, ["id"], ["x", "y"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

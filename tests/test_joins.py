"""As-of and range joins (operators/joins.py): the point-in-time join
Spark lacks natively, expressed as one shuffle + running carry; the
binned range join that avoids the nested-loop theta plan."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.joins import asof_join, range_join


def _quotes(spark):
    return spark.createDataFrame([
        ("A", dt.datetime(2024, 1, 1, 10, 0, 0), 100.0),
        ("A", dt.datetime(2024, 1, 1, 10, 5, 0), 101.0),
        ("A", dt.datetime(2024, 1, 1, 10, 10, 0), None),
        ("B", dt.datetime(2024, 1, 1, 10, 2, 0), 50.0),
    ], ["sym", "ts", "px"])


def _trades(spark):
    return spark.createDataFrame([
        ("A", dt.datetime(2024, 1, 1, 10, 3, 0), 1),
        ("A", dt.datetime(2024, 1, 1, 10, 5, 0), 2),
        ("A", dt.datetime(2024, 1, 1, 10, 11, 0), 3),
        ("A", dt.datetime(2024, 1, 1, 9, 0, 0), 4),
        ("B", dt.datetime(2024, 1, 1, 10, 30, 0), 5),
        ("C", dt.datetime(2024, 1, 1, 10, 0, 0), 6),
    ], ["sym", "ts", "qty"])


class TestAsofJoin:
    def test_backward_ties_nulls_unmatched(self, spark):
        out = {r["qty"]: (r["px_r"], r["ts_r"]) for r in
               asof_join(_trades(spark), _quotes(spark),
                         on="ts", by=["sym"]).collect()}
        assert out[1] == (100.0, dt.datetime(2024, 1, 1, 10, 0))
        # tie at 10:05 is included (backward, >=)
        assert out[2] == (101.0, dt.datetime(2024, 1, 1, 10, 5))
        # a right row with a NULL value still matches (struct carry)
        assert out[3] == (None, dt.datetime(2024, 1, 1, 10, 10))
        # before all quotes / no quotes for key -> null match
        assert out[4] == (None, None) and out[6] == (None, None)
        assert out[5] == (50.0, dt.datetime(2024, 1, 1, 10, 2))

    def test_no_by_keys_warns_single_partition(self, spark):
        import warnings
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = asof_join(_trades(spark).drop("sym"),
                            _quotes(spark).drop("sym"), on="ts")
            assert any("single-partition" in str(x.message) for x in w)
        # still correct: latest quote at-or-before each trade, any symbol
        got = {r["qty"]: r["px_r"] for r in out.collect()}
        assert got[4] is None  # 9:00 predates every quote

    def test_tolerance_drops_stale_matches(self, spark):
        out = {r["qty"]: r["px_r"] for r in
               asof_join(_trades(spark), _quotes(spark), on="ts",
                         by=["sym"], tolerance=120).collect()}
        assert out[1] is None      # 10:03 vs 10:00 is 180s > 120s
        assert out[2] == 101.0     # exact tie: 0s

    def test_matches_duckdb_asof(self, spark):
        import duckdb
        import pandas as pd
        trades, quotes = _trades(spark), _quotes(spark)
        got = sorted(
            (r["qty"], r["px_r"]) for r in
            asof_join(trades, quotes, on="ts", by=["sym"]).collect())
        con = duckdb.connect()
        con.register("t", trades.toPandas())
        con.register("q", quotes.toPandas())
        exp = sorted(map(tuple, con.execute(
            "SELECT t.qty, q.px FROM t ASOF LEFT JOIN q "
            "ON t.sym = q.sym AND t.ts >= q.ts").fetchall()))
        norm = lambda v: None if v != v else v  # NaN -> None  # noqa: E731
        assert got == [(a, norm(b)) for a, b in exp]

    def test_single_shuffle_plan(self, spark):
        plan = (asof_join(_trades(spark), _quotes(spark), on="ts",
                          by=["sym"])
                ._jdf.queryExecution().executedPlan().toString())
        # union + window => exactly one Exchange on the by-keys
        assert plan.count("Exchange hashpartitioning") == 1, plan


class TestRangeJoin:
    def test_binned_equals_plain(self, spark):
        random.seed(1)
        pts = spark.createDataFrame(
            [(i, random.uniform(0, 100)) for i in range(200)], ["pid", "x"])
        ivs = spark.createDataFrame(
            [(j, j * 7 % 90, j * 7 % 90 + 5) for j in range(30)],
            ["iid", "lo", "hi"])
        plain = sorted((r["pid"], r["iid"]) for r in
                       range_join(pts, ivs, "x", "lo", "hi").collect())
        binned = sorted((r["pid"], r["iid"]) for r in
                        range_join(pts, ivs, "x", "lo", "hi",
                                   bin_width=8.0).collect())
        assert plain == binned and plain

    def test_binned_is_equijoin(self, spark):
        pts = spark.createDataFrame([(1, 5.0)], ["pid", "x"])
        ivs = spark.createDataFrame([(1, 0.0, 10.0)], ["iid", "lo", "hi"])
        plan = (range_join(pts, ivs, "x", "lo", "hi", bin_width=4.0)
                ._jdf.queryExecution().executedPlan().toString())
        assert "NestedLoop" not in plan


class TestSalting:
    """Explicit skew salting (operators/joins.py salted_join/salted_agg):
    result-identical to the plain formulations, hot key spread over
    n_salts tasks."""

    @pytest.fixture(scope="class")
    def skewed(self, spark):
        left = spark.range(0, 20000).select(
            F.when(F.col("id") % 2 == 0, 0)
            .otherwise(F.col("id") % 50).alias("k"),
            F.col("id").alias("v"))
        right = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("r"))
        return left, right

    def test_salted_join_result_identical(self, skewed):
        from pixeltable_spark.operators.joins import salted_join
        left, right = skewed
        plain = sorted(map(tuple, left.join(right, "k")
                           .select("k", "v", "r").collect()))
        salted = sorted(map(tuple, salted_join(left, right, "k")
                            .select("k", "v", "r").collect()))
        assert plain == salted

    def test_salted_join_spreads_hot_key(self, skewed):
        from pixeltable_spark.operators.joins import salted_join
        left, right = skewed
        j = salted_join(left, right, "k", n_salts=8)
        plan = j._jdf.queryExecution().analyzed().toString()
        assert "__salt" in plan  # join key includes the salt

    def test_salted_agg_result_identical(self, skewed):
        from pixeltable_spark.operators.joins import salted_agg
        left, _ = skewed
        plain = sorted(map(tuple, left.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("n"),
            F.min("v").alias("lo"), F.max("v").alias("hi")).collect()))
        salted = sorted(map(tuple, salted_agg(
            left, "k", {"s": ("sum", "v"), "n": ("count", "v"),
                        "lo": ("min", "v"), "hi": ("max", "v")}).collect()))
        assert plain == salted

    def test_salted_agg_rejects_non_algebraic(self, skewed):
        from pixeltable_spark.operators.joins import salted_agg
        left, _ = skewed
        with pytest.raises(ValueError, match="non-algebraic"):
            salted_agg(left, "k", {"a": ("avg", "v")})

    def test_salted_join_left_identical_and_bad_how_rejected(self, skewed):
        from pixeltable_spark.operators.joins import salted_join
        left, right = skewed
        # left join keeps unmatched left rows exactly once
        lplain = sorted(map(tuple, left.join(right, "k", "left")
                            .select("k", "v", "r").collect()))
        lsalted = sorted(map(tuple, salted_join(left, right, "k", how="left")
                             .select("k", "v", "r").collect()))
        assert lplain == lsalted
        # replicated right side breaks right/full/semi/anti — rejected
        for bad in ("right", "full", "left_semi", "left_anti"):
            with pytest.raises(ValueError, match="inner.*left"):
                salted_join(left, right, "k", how=bad)

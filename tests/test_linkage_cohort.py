"""Cohort retention + rolling z-score (operators/timeseries.py) and the
record-linkage blocking join (operators/joins.py blocked_fuzzy_join):
hand-computed expectations, blocking-contract edge cases, plan shape."""

from __future__ import annotations

import datetime as dt
import statistics

import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.joins import blocked_fuzzy_join
from pixeltable_spark.operators.timeseries import (
    cohort_retention,
    rolling_zscore,
)

WEEK = 7 * 86400
EPOCH = dt.datetime(1970, 1, 1)


def _wk(n, d=0):
    """A timestamp inside ISO week-bucket n (+d days)."""
    return EPOCH + dt.timedelta(seconds=n * WEEK + d * 86400)


class TestCohortRetention:
    @pytest.fixture()
    def ev(self, spark):
        rows = [
            # cohort week 0: u1 active wks 0,1,2; u2 active wks 0,2
            (1, _wk(0)), (1, _wk(1)), (1, _wk(2, 3)),
            (2, _wk(0, 2)), (2, _wk(2)),
            # cohort week 1: u3 active wk 1 only (two events, one week)
            (3, _wk(1)), (3, _wk(1, 4)),
        ]
        return spark.createDataFrame(rows, ["user_id", "ts"])

    def test_matrix(self, spark, ev):
        out = {(r["cohort"], r["offset"]): (r["users"], r["retention"])
               for r in cohort_retention(ev, "ts").collect()}
        assert out == {
            (0, 0): (2, 1.0), (0, 1): (1, 0.5), (0, 2): (2, 1.0),
            (WEEK, 0): (1, 1.0),
        }

    def test_offset_zero_is_always_full(self, spark, ev):
        rows = cohort_retention(ev, "ts").filter("offset = 0").collect()
        assert all(r["retention"] == 1.0 for r in rows)

    def test_no_join_in_plan(self, spark, ev):
        plan = cohort_retention(ev, "ts") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan


class TestBlockedFuzzyJoin:
    @pytest.fixture()
    def names(self, spark):
        left = spark.createDataFrame(
            [(1, "alice", "a"), (2, "bob", "b"), (3, "carol", "c")],
            ["id", "name", "blk"])
        right = spark.createDataFrame(
            [(10, "alyce", "a"), (11, "robert", "b"), (12, "carol", "x")],
            ["rid", "name", "blk"])
        return left, right

    def test_inner_verify(self, spark, names):
        left, right = names
        out = blocked_fuzzy_join(left, right, "name", "name",
                                 F.col("blk"), F.col("blk"),
                                 max_dist=2).collect()
        # alice~alyce dist 1 in block a; bob~robert dist 4 rejected;
        # carol==carol but DIFFERENT blocks -> never compared
        assert [(r["id"], r["rid"], r["edit_dist"]) for r in out] == \
            [(1, 10, 1)]

    def test_left_keeps_unmatched(self, spark, names):
        left, right = names
        out = blocked_fuzzy_join(left, right, "name", "name",
                                 F.col("blk"), F.col("blk"),
                                 max_dist=2, how="left").collect()
        got = {r["id"]: (r["rid"], r["edit_dist"]) for r in out}
        assert got == {1: (10, 1), 2: (None, None), 3: (None, None)}

    def test_name_collision_suffix(self, spark, names):
        left, right = names
        out = blocked_fuzzy_join(left, right, "name", "name",
                                 F.col("blk"), F.col("blk"))
        assert "name" in out.columns and "name_r" in out.columns
        assert "blk" in out.columns and "blk_r" in out.columns

    def test_how_validation(self, spark, names):
        left, right = names
        with pytest.raises(ValueError):
            blocked_fuzzy_join(left, right, "name", "name",
                               F.col("blk"), F.col("blk"), how="full")

    def test_equi_join_on_block_key(self, spark, names):
        left, right = names
        plan = blocked_fuzzy_join(left, right, "name", "name",
                                  F.col("blk"), F.col("blk")) \
            ._jdf.queryExecution().executedPlan().toString()
        # blocking is an equi-join (hash/sort-merge), NOT a nested loop
        # over the cross product
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestRollingZscore:
    @pytest.fixture()
    def series(self, spark):
        vals = [10.0, 12.0, 11.0, 10.5, 50.0, 11.5]
        rows = [("a", EPOCH + dt.timedelta(minutes=i), i, v)
                for i, v in enumerate(vals)]
        return spark.createDataFrame(
            rows, ["k", "ts", "event_id", "value"])

    def test_hand_computed(self, spark, series):
        out = {r["value"]: (r["z"], r["is_anomaly"])
               for r in rolling_zscore(series, "ts", "value", by=["k"],
                                       lookback=20, z_threshold=3.0,
                                       order_cols=["event_id"]).collect()}
        # first row: no prior -> NULL; second: 1 prior -> NULL
        assert out[10.0] == (None, None)
        assert out[12.0] == (None, None)
        prior = [10.0, 12.0, 11.0, 10.5]
        mu, sd = statistics.mean(prior), statistics.stdev(prior)
        z50 = round((50.0 - mu) / sd, 6)
        assert out[50.0] == (z50, True)
        assert out[11.5][1] is False  # post-spike value not anomalous

    def test_zero_variance_gives_null(self, spark):
        rows = [("a", EPOCH + dt.timedelta(minutes=i), i, 5.0)
                for i in range(4)]
        df = spark.createDataFrame(rows, ["k", "ts", "event_id", "value"])
        out = rolling_zscore(df, "ts", "value", by=["k"],
                             order_cols=["event_id"]).collect()
        assert all(r["z"] is None for r in out)

    def test_current_row_excluded(self, spark, series):
        # if the frame included the current row, the spike would deflate
        # its own z; with 4 priors the z is ~16 -- far beyond any
        # self-included value
        out = {r["value"]: r["z"]
               for r in rolling_zscore(series, "ts", "value", by=["k"],
                                       order_cols=["event_id"]).collect()}
        assert out[50.0] > 10

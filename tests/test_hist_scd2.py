"""scd2 (operators/timeseries.py), histogram + corr_matrix
(operators/profile.py): hand-built expectations and plan/edge checks."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.profile import corr_matrix, histogram
from pixeltable_spark.operators.timeseries import scd2


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


class TestScd2:
    @pytest.fixture()
    def stream(self, spark):
        rows = [
            # u1: A at 0, A again at 1 (merged), B at 2, A at 3
            (1, _ts(0), 0, "A"), (1, _ts(1), 1, "A"),
            (1, _ts(2), 2, "B"), (1, _ts(3), 3, "A"),
            # u2: constant -> one open interval
            (2, _ts(0), 4, "X"), (2, _ts(5), 5, "X"),
        ]
        return spark.createDataFrame(
            rows, ["user_id", "ts", "event_id", "state"])

    def test_intervals(self, spark, stream):
        out = sorted(
            (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
             r["is_current"])
            for r in scd2(stream, ["user_id"], "ts", ["state"],
                          order_cols=["event_id"]).collect())
        assert out == [
            (1, "A", _ts(0), _ts(2), False),
            (1, "A", _ts(3), None, True),
            (1, "B", _ts(2), _ts(3), False),
            (2, "X", _ts(0), None, True),
        ]

    def test_null_attr_is_no_change(self, spark):
        rows = [(1, _ts(0), 0, None), (1, _ts(1), 1, None),
                (1, _ts(2), 2, "A")]
        df = spark.createDataFrame(
            rows, "user_id int, ts timestamp, event_id int, state string")
        out = scd2(df, ["user_id"], "ts", ["state"],
                   order_cols=["event_id"]).collect()
        # NULL->NULL merges; NULL->A is a change: exactly 2 intervals
        assert len(out) == 2

    def test_single_exchange(self, spark, stream):
        plan = scd2(stream, ["user_id"], "ts", ["state"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1

    def test_validation(self, spark, stream):
        with pytest.raises(ValueError):
            scd2(stream, ["user_id"], "ts", [])


class TestHistogram:
    @pytest.fixture()
    def vals(self, spark):
        return spark.createDataFrame(
            [(float(v),) for v in [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 10]],
            ["x"])

    def test_explicit_bounds(self, spark, vals):
        out = {r["bin"]: (r["bin_lo"], r["bin_hi"], r["n"])
               for r in histogram(vals, "x", bins=5, lo=0.0, hi=10.0)
               .collect()}
        # width 2; 10.0 clamps into the last bin (closed outer edge)
        assert out[0] == (0.0, 2.0, 2)
        assert out[4] == (8.0, 10.0, 3)
        assert sum(n for _, _, n in out.values()) == 11

    def test_inferred_bounds_and_nulls(self, spark):
        df = spark.createDataFrame(
            [(1.0,), (None,), (3.0,), (5.0,)], "x double")
        out = {r["bin"]: r["n"]
               for r in histogram(df, "x", bins=2).collect()}
        # lo=1, hi=5, w=2: [1,3)->1.0, [3,5]->3.0 and 5.0; NULL dropped
        assert out == {0: 1, 1: 2}

    def test_degenerate_range(self, spark):
        df = spark.createDataFrame([(7.0,), (7.0,)], "x double")
        out = histogram(df, "x", bins=4).collect()
        assert len(out) == 1 and out[0]["bin"] == 0 and out[0]["n"] == 2

    def test_validation(self, spark, vals):
        with pytest.raises(ValueError):
            histogram(vals, "x", bins=0)


class TestCorrMatrix:
    def test_values(self, spark):
        rows = [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0),
                (4.0, 8.5, -4.0)]
        df = spark.createDataFrame(rows, ["a", "b", "c"])
        out = {(r["col_a"], r["col_b"]): r["corr"]
               for r in corr_matrix(df, ["a", "b", "c"]).collect()}
        assert out[("a", "c")] == -1.0
        assert 0.99 < out[("a", "b")] < 1.0  # near-linear, not exact
        assert len(out) == 3  # upper triangle only

    def test_one_pass_plan(self, spark):
        df = spark.createDataFrame([(1.0, 2.0)], ["a", "b"])
        plan = corr_matrix(df, ["a", "b"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1  # single global aggregate

    def test_validation(self, spark):
        df = spark.createDataFrame([(1.0,)], ["a"])
        with pytest.raises(ValueError):
            corr_matrix(df, ["a"])


class TestBenfordAudit:
    def test_benford_conforming(self, spark):
        from pixeltable_spark.operators.quality import benford_audit
        # geometric sequence 1.07^k spans magnitudes uniformly in log
        # space -> Benford-distributed first digits -> small chi2
        rows = [(1.07 ** k,) for k in range(300)]
        df = spark.createDataFrame(rows, "x double")
        out = benford_audit(df, "x").collect()
        assert [r["digit"] for r in out] == list(range(1, 10))
        assert sum(r["n"] for r in out) == 300
        assert out[0]["chi2"] < 20
        assert abs(out[0]["freq"] - out[0]["benford"]) < 0.05

    def test_uniform_fails_benford(self, spark):
        from pixeltable_spark.operators.quality import benford_audit
        # uniform integers 100..999: every first digit ~1/9, far from
        # Benford's 30%-for-1 -> huge chi2
        df = spark.createDataFrame([(float(v),) for v in range(100, 1000)],
                                   "x double")
        out = benford_audit(df, "x").collect()
        assert out[0]["chi2"] > 100
        assert all(abs(r["freq"] - 1 / 9) < 0.01 for r in out)

    def test_zeros_negatives_and_fractions(self, spark):
        from pixeltable_spark.operators.quality import benford_audit
        df = spark.createDataFrame(
            [(0.0,), (-230.0,), (0.0071,), (None,)], "x double")
        out = {r["digit"]: r["n"]
               for r in benford_audit(df, "x").collect()}
        # zero/NULL dropped; sign ignored; leading zeros skipped.
        # Full 9-digit spine: unobserved digits present with n=0 so
        # their chi2 terms are included (see quality.py docstring).
        assert out == {d: (1 if d in (2, 7) else 0) for d in range(1, 10)}

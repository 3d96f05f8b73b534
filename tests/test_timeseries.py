"""Time-series bucketing + gap filling (operators/timeseries.py): LOCF,
linear interpolation, pure densify, the skew guard, and the q98-style
DuckDB cross-check lives in the driver oracle."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.timeseries import (
    bucket_agg,
    gap_fill,
    time_bucket,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def series(spark):
    rows = [
        ("a", _ts(0, 10), 10.0),
        ("a", _ts(0, 50), 20.0),    # bucket 0h: avg 15
        ("a", _ts(3, 0), 45.0),     # 1h and 2h missing
        ("b", _ts(1, 0), 5.0),
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"])


class TestGapFill:
    def test_locf(self, spark, series):
        out = {(r["k"], r["bucket"]): (r["value"], r["filled"])
               for r in gap_fill(series, "ts", "v", 3600, by=["k"],
                                 fill="locf").collect()}
        base = int(dt.datetime(2024, 1, 1).replace(
            tzinfo=dt.timezone.utc).timestamp())
        assert out[("a", base)] == (15.0, False)
        assert out[("a", base + 3600)] == (15.0, True)      # carried
        assert out[("a", base + 7200)] == (15.0, True)
        assert out[("a", base + 10800)] == (45.0, False)
        assert out[("b", base + 3600)] == (5.0, False)
        assert len(out) == 5

    def test_linear(self, spark, series):
        out = {(r["k"], r["bucket"]): r["value"]
               for r in gap_fill(series, "ts", "v", 3600, by=["k"],
                                 fill="linear").collect()}
        base = int(dt.datetime(2024, 1, 1).replace(
            tzinfo=dt.timezone.utc).timestamp())
        assert out[("a", base + 3600)] == pytest.approx(25.0)
        assert out[("a", base + 7200)] == pytest.approx(35.0)

    def test_null_fill_and_flag(self, spark, series):
        rows = gap_fill(series, "ts", "v", 3600, by=["k"],
                        fill="null").collect()
        gaps = [r for r in rows if r["filled"]]
        assert len(gaps) == 2 and all(r["value"] is None for r in gaps)

    def test_global_no_keys(self, spark, series):
        rows = gap_fill(series, "ts", "v", 3600, fill="locf").collect()
        assert len(rows) == 4   # 0h..3h global span
        assert all(r["value"] is not None for r in rows)

    def test_span_guard(self, spark):
        df = spark.createDataFrame(
            [("a", _ts(0), 1.0), ("a", dt.datetime(2025, 1, 1), 2.0)],
            ["k", "ts", "v"])
        with pytest.raises(Exception, match="max_fill_buckets"):
            gap_fill(df, "ts", "v", 60, by=["k"],
                     max_fill_buckets=1000).collect()

    def test_bad_fill(self, spark, series):
        with pytest.raises(ValueError, match="fill must be"):
            gap_fill(series, "ts", "v", 3600, fill="spline")

    def test_bucket_agg(self, spark, series):
        rows = {(r["k"], r["bucket"]): (r["n"], r["total"])
                for r in bucket_agg(series, "ts", 3600,
                                    {"n": ("count", "v"),
                                     "total": ("sum", "v")},
                                    by=["k"]).collect()}
        base = int(dt.datetime(2024, 1, 1).replace(
            tzinfo=dt.timezone.utc).timestamp())
        assert rows[("a", base)] == (2, 30.0)
        assert rows[("b", base + 3600)] == (1, 5.0)


class TestOhlc:
    def test_deterministic_with_ties(self, spark):
        from pixeltable_spark.operators.timeseries import ohlc
        t0 = dt.datetime(2024, 1, 1, 0, 0)
        rows = [("a", t0, 1, 10.0), ("a", t0, 2, 99.0),   # tied ts
                ("a", dt.datetime(2024, 1, 1, 5, 0), 3, 50.0)]
        df = spark.createDataFrame(rows, ["k", "ts", "eid", "v"])
        [r] = ohlc(df, "ts", "v", 86400, by=["k"],
                   tiebreak_col="eid").collect()
        assert (r["open"], r["high"], r["low"], r["close"], r["n"]) \
            == (10.0, 99.0, 10.0, 50.0, 3)


class TestTwap:
    def test_duration_weighting(self, spark):
        from pixeltable_spark.operators.timeseries import twap
        # bucket [0, 3600): value 10 holds 0->1800s, 100 holds
        # 1800->3600s -> TWAP 55; plain avg would also be 55 here, so
        # add a burst: three rapid 100s at the end change avg, not TWAP
        rows = [("a", _ts(0, 0), 10.0), ("a", _ts(0, 30), 100.0)]
        df = spark.createDataFrame(rows, ["k", "ts", "v"])
        out = twap(df, "ts", "v", 3600, by=["k"]).collect()[0]
        assert out["twap"] == 55.0 and out["n"] == 2

    def test_burst_insensitive(self, spark):
        from pixeltable_spark.operators.timeseries import twap
        base = [("a", _ts(0, 0), 10.0), ("a", _ts(0, 30), 100.0)]
        burst = base + [("a", _ts(0, 59), 100.0),
                        ("a", dt.datetime(2024, 1, 1, 0, 59, 30), 100.0)]
        df_b = spark.createDataFrame(burst, ["k", "ts", "v"])
        out = twap(df_b, "ts", "v", 3600, by=["k"]).collect()[0]
        # the extra same-value ticks split the tail interval but don't
        # change the integral
        assert out["twap"] == 55.0 and out["n"] == 4

    def test_single_obs_holds_to_bucket_end(self, spark):
        from pixeltable_spark.operators.timeseries import twap
        df = spark.createDataFrame([("a", _ts(0, 45), 8.0)],
                                   ["k", "ts", "v"])
        out = twap(df, "ts", "v", 3600, by=["k"]).collect()[0]
        assert out["twap"] == 8.0 and out["n"] == 1


class TestRollingCorr:
    def test_trend_detection(self, spark):
        from pixeltable_spark.operators.timeseries import rolling_corr
        rows = [("a", _ts(0, m), float(m)) for m in range(30)] + \
               [("b", _ts(0, m), float(30 - m)) for m in range(30)]
        df = spark.createDataFrame(rows, ["k", "ts", "v"])
        out = {(r["k"], r["n_window"]): r["corr"]
               for r in rolling_corr(df, "ts", "ts", "v", by=["k"],
                                     lookback=50, min_obs=10).collect()}
        # perfectly increasing -> +1; decreasing -> -1 (last windows)
        assert out[("a", 30)] == 1.0
        assert out[("b", 30)] == -1.0

    def test_min_obs_null(self, spark):
        from pixeltable_spark.operators.timeseries import rolling_corr
        rows = [("a", _ts(0, m), float(m * m)) for m in range(5)]
        df = spark.createDataFrame(rows, ["k", "ts", "v"])
        out = rolling_corr(df, "ts", "ts", "v", by=["k"],
                           min_obs=10).collect()
        assert all(r["corr"] is None for r in out)

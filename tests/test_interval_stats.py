"""interval_join (operators/joins.py) and ab_test/erf
(operators/stats.py): binned-vs-theta equivalence, emit-once across
multi-bin overlaps, erf accuracy vs math.erf, Welch vs scipy-free hand
computation."""

from __future__ import annotations

import math
import statistics

import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.joins import interval_join
from pixeltable_spark.operators.stats import (
    ab_test,
    erf_approx,
    two_proportion_test,
)


class TestIntervalJoin:
    @pytest.fixture()
    def ivs(self, spark):
        left = spark.createDataFrame(
            [(1, 0.0, 10.0), (2, 20.0, 25.0), (3, 100.0, 200.0)],
            ["lid", "lo", "hi"])
        right = spark.createDataFrame(
            [(10, 5.0, 6.0),      # inside l1
             (11, 9.0, 21.0),     # spans l1 and l2
             (12, 26.0, 30.0),    # touches nothing (l2 ends 25)
             (13, 150.0, 400.0)],  # overlaps l3 across many bins
            ["rid", "lo", "hi"])
        return left, right

    EXPECTED = {(1, 10), (1, 11), (2, 11), (3, 13)}

    def test_theta_path(self, spark, ivs):
        left, right = ivs
        out = interval_join(left, right, "lo", "hi", "lo", "hi")
        assert {(r["lid"], r["rid"]) for r in out.collect()} == \
            self.EXPECTED

    def test_binned_path_matches_theta(self, spark, ivs):
        left, right = ivs
        for w in (5.0, 10.0, 1000.0):
            out = interval_join(left, right, "lo", "hi", "lo", "hi",
                                bin_width=w).collect()
            pairs = [(r["lid"], r["rid"]) for r in out]
            # emit-once: no duplicates even when a pair shares many bins
            assert len(pairs) == len(set(pairs)), f"dups at w={w}"
            assert set(pairs) == self.EXPECTED, f"wrong set at w={w}"

    def test_closed_endpoints_touch(self, spark):
        left = spark.createDataFrame([(1, 0.0, 5.0)], ["lid", "lo", "hi"])
        right = spark.createDataFrame([(2, 5.0, 9.0)], ["rid", "lo", "hi"])
        got = interval_join(left, right, "lo", "hi", "lo", "hi",
                            bin_width=2.0).collect()
        assert len(got) == 1  # hi == lo counts (closed ends)

    def test_by_keys_partition(self, spark):
        left = spark.createDataFrame(
            [("a", 1, 0.0, 10.0), ("b", 2, 0.0, 10.0)],
            ["g", "lid", "lo", "hi"])
        right = spark.createDataFrame(
            [("a", 9, 5.0, 6.0)], ["g", "rid", "lo", "hi"])
        out = interval_join(left, right, "lo", "hi", "lo", "hi",
                            by=["g"], bin_width=4.0).collect()
        assert [(r["lid"], r["rid"]) for r in out] == [(1, 9)]

    def test_binned_is_equi_join(self, spark, ivs):
        left, right = ivs
        plan = interval_join(left, right, "lo", "hi", "lo", "hi",
                             bin_width=10.0) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestErf:
    def test_matches_math_erf(self, spark):
        xs = [-3.0, -1.5, -0.5, 0.0, 0.3, 1.0, 2.5]
        df = spark.createDataFrame([(x,) for x in xs], ["x"])
        got = {r["x"]: r["e"]
               for r in df.select("x", erf_approx(F.col("x")).alias("e"))
               .collect()}
        for x in xs:
            assert got[x] == pytest.approx(math.erf(x), abs=2e-7)


class TestAbTest:
    def test_hand_computed(self, spark):
        c = [10.0, 12.0, 11.0, 13.0, 9.0]
        t = [14.0, 15.0, 13.0, 16.0, 14.5]
        rows = [("c", v) for v in c] + [("t", v) for v in t]
        df = spark.createDataFrame(rows, ["g", "v"])
        out = ab_test(df, "v", "g", control="c", treatment="t").collect()[0]
        mc, mt = statistics.mean(c), statistics.mean(t)
        vc, vt = statistics.variance(c), statistics.variance(t)
        se2c, se2t = vc / 5, vt / 5
        tstat = (mt - mc) / math.sqrt(se2c + se2t)
        wdf = (se2c + se2t) ** 2 / (se2c ** 2 / 4 + se2t ** 2 / 4)
        assert out["n_c"] == 5 and out["n_t"] == 5
        assert out["mean_c"] == round(mc, 6)
        assert out["diff"] == round(mt - mc, 6)
        assert out["t_stat"] == pytest.approx(tstat, abs=2e-6)
        assert out["welch_df"] == pytest.approx(wdf, abs=2e-6)
        p = 2 * (1 - 0.5 * (1 + math.erf(abs(tstat) / math.sqrt(2))))
        assert out["p_value"] == pytest.approx(p, abs=1e-5)

    def test_null_and_other_groups_excluded(self, spark):
        rows = [("c", 1.0), ("c", 2.0), ("t", 1.5), ("t", 2.5),
                ("x", 99.0), ("c", None)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = ab_test(df, "v", "g", "c", "t").collect()[0]
        assert out["n_c"] == 2 and out["n_t"] == 2

    def test_single_pass_plan(self, spark):
        df = spark.createDataFrame([("c", 1.0), ("t", 2.0)], ["g", "v"])
        plan = ab_test(df, "v", "g", "c", "t") \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        assert "Join" not in plan


class TestTwoProportionTest:
    def test_hand_computed(self, spark):
        # c: 2/10 convert; t: 5/10
        rows = [("c", i < 2) for i in range(10)] + \
               [("t", i < 5) for i in range(10)]
        df = spark.createDataFrame(rows, "g string, ok boolean")
        out = two_proportion_test(df, "ok", "g", "c", "t").collect()[0]
        assert (out["n_c"], out["succ_c"]) == (10, 2)
        assert (out["n_t"], out["succ_t"]) == (10, 5)
        pool = 7 / 20
        se = math.sqrt(pool * (1 - pool) * (1 / 10 + 1 / 10))
        z = (0.5 - 0.2) / se
        assert out["z_stat"] == pytest.approx(z, abs=2e-6)
        p = 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2))))
        assert out["p_value"] == pytest.approx(p, abs=1e-5)

    def test_degenerate_all_convert_is_null(self, spark):
        rows = [("c", True)] * 3 + [("t", True)] * 3
        df = spark.createDataFrame(rows, "g string, ok boolean")
        out = two_proportion_test(df, "ok", "g", "c", "t").collect()[0]
        assert out["z_stat"] is None and out["p_value"] is None


class TestTopTermsPerDoc:
    def test_tfidf_ranking(self, spark):
        from pixeltable_spark.operators.search import top_terms_per_doc
        rows = [(1, "rare common common"), (2, "common common other"),
                (3, "rare other unique")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = top_terms_per_doc(df, k=2)
        got = {(r["doc_id"], r["rnk"]): r["term"] for r in out.collect()}
        # doc1: 'rare' (df=2) beats 'common' x2 (df=2)? tf=1*ln(3/2)=.405
        # vs tf=2*ln(3/2)=.81 -> common first
        assert got[(1, 1)] == "common"
        # doc3: 'unique' df=1 -> ln(3)=1.099 beats rare/other ln(1.5)
        assert got[(3, 1)] == "unique"

    def test_min_max_df_filters(self, spark):
        from pixeltable_spark.operators.search import top_terms_per_doc
        rows = [(1, "boiler x"), (2, "boiler y"), (3, "boiler z"),
                (4, "boiler w")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = top_terms_per_doc(df, k=5, min_df=2,
                                max_df_frac=0.9).collect()
        terms = {r["term"] for r in out}
        # hapaxes (x/y/z/w, df=1) cut by min_df; 'boiler' (df=4 > 3.6)
        # cut by max_df_frac
        assert terms == set()


class TestFkAudit:
    def test_violations_and_summary(self, spark):
        from pixeltable_spark.operators.quality import (
            fk_summary,
            fk_violations,
        )
        child = spark.createDataFrame(
            [(1, 10), (2, 11), (3, 99), (4, None)],
            "id long, fk long")
        parent = spark.createDataFrame([(10,), (11,), (11,)], ["pk"])
        v = fk_violations(child, parent, ["fk"], ["pk"]).collect()
        assert [r["id"] for r in v] == [3]  # NULL fk is not a violation
        s = fk_summary(child, parent, ["fk"], ["pk"]).collect()[0]
        assert (s["total_rows"], s["null_keys"], s["violations"]) == \
            (4, 1, 1)
        assert s["violation_rate"] == pytest.approx(1 / 3, abs=1e-6)

    def test_validation(self, spark):
        from pixeltable_spark.operators.quality import fk_violations
        df = spark.createDataFrame([(1,)], ["a"])
        with pytest.raises(ValueError):
            fk_violations(df, df, ["a"], [])

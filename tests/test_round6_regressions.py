"""Regression tests for the three round-6 fixes (shipped untested then):

1. hyperplane_bucket with >_MAX_LSH_DIM (512) dims: the try_element_at
   fallback must derive the same md5 +/-1 weights JVM-side, so dim=None
   agrees bit-for-bit with the explicit-dim path and vectors spread over
   many buckets instead of collapsing into bucket 0.
2. _bloom_key / _bloom_might_contain with non-finite floats (inf/-inf/nan):
   build and probe must not raise, and must agree with each other.
3. benford_audit on all-one-leading-digit data: the 9-row digit spine must
   include the absent digits' chi2 terms (chi2 >> the observed-only sum),
   plus the empty-input -> NULL-stats contract.
"""
import math

import pytest
from pyspark.sql import functions as F


class TestHyperplaneBucketHighDim:
    def test_768_dim_fallback_matches_explicit_dim(self, spark):
        from pixeltable_spark.operators.similarity import hyperplane_bucket

        # deterministic 768-dim vectors (beyond the 512-dim literal window)
        rows = [([math.sin(0.1 * i * (j + 1)) for j in range(768)],)
                for i in range(64)]
        df = spark.createDataFrame(rows, "vec array<double>")
        out = df.select(
            hyperplane_bucket(F.col("vec"), 8, dim=None).alias("b_none"),
            hyperplane_bucket(F.col("vec"), 8, dim=768).alias("b_dim"),
        ).collect()
        assert all(r["b_none"] == r["b_dim"] for r in out)
        # no NULL-collapse into bucket 0: buckets must actually spread
        buckets = {r["b_none"] for r in out}
        assert len(buckets) > 8
        assert all(0 <= b < 256 for b in buckets)

    def test_512_dim_boundary_unchanged(self, spark):
        from pixeltable_spark.operators.similarity import hyperplane_bucket

        rows = [([math.cos(0.05 * i * (j + 1)) for j in range(512)],)
                for i in range(16)]
        df = spark.createDataFrame(rows, "vec array<double>")
        out = df.select(
            hyperplane_bucket(F.col("vec"), 6, dim=None).alias("b_none"),
            hyperplane_bucket(F.col("vec"), 6, dim=512).alias("b_dim"),
        ).collect()
        assert all(r["b_none"] == r["b_dim"] for r in out)


class TestBloomNonFinite:
    def test_build_and_probe_non_finite(self):
        from pixeltable_spark.catalog import (_bloom_build,
                                              _bloom_might_contain)

        vals = [float("inf"), float("-inf"), float("nan"), 1.5, 5, "x"]
        bloom = _bloom_build(vals, fpp=0.01)
        assert bloom is not None
        for v in vals:
            assert _bloom_might_contain(bloom, v)

    def test_non_finite_keys_distinct_and_stable(self):
        from pixeltable_spark.catalog import _bloom_key

        ki = _bloom_key(float("inf"))
        kn = _bloom_key(float("-inf"))
        kna = _bloom_key(float("nan"))
        assert ki != kn and ki != kna and kn != kna
        # stable across calls (build side == probe side)
        assert ki == _bloom_key(float("inf"))
        # int/float canonicalization still holds for finite values
        assert _bloom_key(5) == _bloom_key(5.0)

    def test_probe_non_finite_against_finite_bloom(self):
        from pixeltable_spark.catalog import (_bloom_build,
                                              _bloom_might_contain)

        bloom = _bloom_build([1, 2, 3], fpp=0.001)
        # must not raise; answer may be a false positive but usually False
        _bloom_might_contain(bloom, float("inf"))
        _bloom_might_contain(bloom, float("nan"))


class TestBenfordSpine:
    def test_single_digit_corpus_full_spine_chi2(self, spark):
        from pixeltable_spark.operators.quality import benford_audit

        # every value starts with 1 -> most anomalous case: the 8 absent
        # digits contribute (0 - N*p_d)^2 / (N*p_d) = N*p_d each, so
        # chi2 = N*(1-p_1)/p_1 + N*(1-p_1) ~ N*2.299 for N=100.
        df = spark.createDataFrame([(1.0 * (1 + (i % 9) / 10),)
                                    for i in range(100)], "x double")
        out = benford_audit(df, "x").collect()
        assert [r["digit"] for r in out] == list(range(1, 10))
        assert out[0]["n"] == 100
        assert all(r["n"] == 0 for r in out[1:])
        p1 = math.log10(2.0)
        expected = 100 * (1 - p1) ** 2 / p1 + 100 * (1 - p1)
        assert out[0]["chi2"] == pytest.approx(expected, rel=1e-4)
        # the observed-digits-only (pre-fix) sum would be only the digit-1
        # term; the spine must make chi2 strictly larger than that.
        assert out[0]["chi2"] > 100 * (1 - p1) ** 2 / p1 + 1

    def test_empty_input_null_stats(self, spark):
        from pixeltable_spark.operators.quality import benford_audit

        df = spark.createDataFrame([(0.0,), (None,)], "x double")
        out = benford_audit(df, "x").collect()
        assert [r["digit"] for r in out] == list(range(1, 10))
        assert all(r["n"] == 0 for r in out)
        assert all(r["freq"] is None and r["chi2"] is None for r in out)

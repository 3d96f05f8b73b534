"""KMV k-minimum-values sketches (operators/sketches.py — Beyer et
al. 2007): join-free distinct / union / intersection / Jaccard
estimation between corpora."""
import hashlib

import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.sketches import (corpus_overlap,
                                                 kmv_ndv, kmv_overlap,
                                                 kmv_sketch, kmv_union)


def _py_sketch(values, k, kind="int"):
    pre = "i" if kind == "int" else "s"
    hs = {hashlib.md5((pre + str(v)).encode()).hexdigest()[:16]
          for v in values}
    return sorted(hs)[:k]


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).select(F.col("id").alias("k"))


class TestKmv:
    def test_sketch_matches_python_replay(self, ids):
        got = kmv_sketch(ids, "k", k=64, kind="int")
        assert got == _py_sketch(range(5000), 64)

    def test_small_domain_is_exact(self, spark):
        df = spark.range(0, 100).select(F.col("id").alias("k"))
        sk = kmv_sketch(df, "k", k=512, kind="int")
        assert len(sk) == 100
        assert kmv_ndv(sk, 512) == 100.0

    def test_ndv_within_3sigma(self, ids):
        # KMV standard error ~ 1/sqrt(k-2)
        k = 1024
        est = kmv_ndv(kmv_sketch(ids, "k", k=k, kind="int"), k)
        assert abs(est - 5000) / 5000 < 3 / (k - 2) ** 0.5

    def test_union_and_overlap_estimates(self, spark):
        a_vals = range(0, 3000)
        b_vals = range(2000, 5000)     # |A∩B|=1000 |A∪B|=5000 J=0.2
        a = _py_sketch(a_vals, 512)
        b = _py_sketch(b_vals, 512)
        u = kmv_union(a, b, 512)
        assert u == _py_sketch(range(0, 5000), 512)
        ov = kmv_overlap(a, b, 512)
        assert abs(ov["union_ndv"] - 5000) / 5000 < 0.2
        assert abs(ov["jaccard"] - 0.2) < 0.08
        assert abs(ov["intersection_ndv"] - 1000) / 1000 < 0.4

    def test_disjoint_and_identical(self):
        a = _py_sketch(range(0, 1000), 256)
        b = _py_sketch(range(5000, 6000), 256)
        assert kmv_overlap(a, b, 256)["jaccard"] == 0.0
        same = kmv_overlap(a, a, 256)
        assert same["jaccard"] == 1.0
        assert same["union_ndv"] == kmv_ndv(a, 256)

    def test_corpus_overlap_dataframe(self, spark, ids):
        a = ids.where(F.col("k") < 3000)
        b = ids.where(F.col("k") >= 2000)
        row = corpus_overlap(a, b, "k", k=512, kind="int").collect()[0]
        assert abs(row["ndv_a"] - 3000) / 3000 < 0.2
        assert abs(row["jaccard"] - 0.2) < 0.08
        assert row["intersection_ndv"] == pytest.approx(
            row["jaccard"] * row["union_ndv"])

    def test_partition_invariance_and_nulls(self, spark):
        df = spark.createDataFrame(
            [(i,) for i in range(500)] + [(None,)] * 50, "k long")
        assert kmv_sketch(df, "k", k=64, kind="int") \
            == kmv_sketch(df.repartition(13), "k", k=64, kind="int") \
            == _py_sketch(range(500), 64)

    def test_string_kind(self, spark):
        df = spark.createDataFrame([(f"w{i}",) for i in range(300)],
                                   "s string")
        got = kmv_sketch(df, "s", k=32, kind="str")
        assert got == _py_sketch([f"w{i}" for i in range(300)], 32,
                                 kind="str")


class TestCountMin:
    def test_estimate_upper_bounds_and_python_replay(self, spark):
        from pixeltable_spark.operators.sketches import (cm_estimate,
                                                         cm_sketch)
        rows = [(f"t{i % 40}",) for i in range(4000)]  # 40 tokens x 100
        df = spark.createDataFrame(rows, "tok string")
        sk = cm_sketch(df, "tok", depth=4, width=256, kind="str")
        assert sum(sk["cells"].values()) == 4000 * 4
        for i in range(40):
            est = cm_estimate(sk, f"t{i}", "str")
            assert est >= 100              # CM guarantee: est >= true
            assert est <= 100 + 4000 // 4  # loose eps bound sanity
        assert cm_estimate(sk, "absent", "str") >= 0

    def test_merge_equals_union_build(self, spark):
        from pixeltable_spark.operators.sketches import cm_merge, cm_sketch
        a = spark.createDataFrame([(f"t{i % 7}",) for i in range(700)],
                                  "tok string")
        b = spark.createDataFrame([(f"t{i % 11}",) for i in range(550)],
                                  "tok string")
        sa = cm_sketch(a, "tok", 4, 128)
        sb = cm_sketch(b, "tok", 4, 128)
        su = cm_sketch(a.unionAll(b), "tok", 4, 128)
        assert cm_merge(sa, sb) == su
        with pytest.raises(ValueError, match="shape"):
            cm_merge(sa, cm_sketch(b, "tok", 4, 256))

    def test_exact_when_no_collisions(self, spark):
        from pixeltable_spark.operators.sketches import (cm_estimate,
                                                         cm_sketch)
        # 5 values in a wide grid: collisions in ALL 4 rows are
        # vanishingly unlikely, so estimates are exact
        df = spark.createDataFrame(
            [(f"v{i}",) for i in range(5) for _ in range(i + 1)],
            "tok string")
        sk = cm_sketch(df, "tok", depth=4, width=4096, kind="str")
        for i in range(5):
            assert cm_estimate(sk, f"v{i}", "str") == i + 1

"""Scale-trap guards (VERDICT r2 item 7): the two remaining plans that are
correct-but-OOM-at-100x now announce themselves — a warning for the
single-group global running UDA, an error for table-vs-table exact kNN."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

import pixeltable_spark as pxt
from pixeltable_spark.operators.similarity import knn_join


class TestUnmergeableUdaWarns:
    def test_warning_names_merge(self, test_tbl):
        @pxt.uda
        class running_count:
            def __init__(self):
                self.n = 0

            def update(self, v):
                self.n += 1

            def value(self) -> int:
                return self.n

        t = test_tbl
        with pytest.warns(RuntimeWarning, match=r"merge\(other\)"):
            q = t.where(t.c2 < 5).select(
                t.c2, rc=running_count(t.c3, order_by=t.c2))
            q.collect()

    def test_mergeable_uda_does_not_warn(self, test_tbl):
        @pxt.uda
        class running_sum:
            def __init__(self):
                self.s = 0.0

            def update(self, v):
                if v is not None:
                    self.s += v

            def merge(self, other):
                self.s += other.s

            def value(self) -> float:
                return self.s

        t = test_tbl
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            t.where(t.c2 < 5).select(
                t.c2, rs=running_sum(t.c3, order_by=t.c2)).collect()


class TestExactKnnGuard:
    @pytest.fixture()
    def vecs(self, spark):
        return spark.createDataFrame(
            [{"vec_id": i, "embedding": [float(i + 1), float(2 * i + 1)]}
             for i in range(50)])

    def test_large_probe_side_raises(self, vecs):
        with pytest.raises(ValueError, match="n_planes>0|allow_broadcast"):
            knn_join(vecs, vecs, k=2, max_probe_rows=10)

    def test_allow_broadcast_overrides(self, vecs):
        got = knn_join(vecs, vecs, k=1, max_probe_rows=10,
                       allow_broadcast=True).collect()
        # rank-1 of a self-join has cos 1.0 (self, or a collinear tie)
        assert len(got) == 50
        assert all(r.cos == pytest.approx(1.0) for r in got)

    def test_small_probe_side_passes_bounded_count(self, vecs):
        probes = vecs.filter(F.col("vec_id") < 5)
        got = knn_join(probes, vecs, k=1, max_probe_rows=10).collect()
        assert len(got) == 5

    def test_lsh_path_needs_no_guard(self, vecs):
        got = knn_join(vecs, vecs, k=1, n_planes=2,
                       max_probe_rows=10).collect()
        assert len(got) > 0


class TestAsyncRateClusterMath:
    def test_divides_by_default_parallelism(self, spark, monkeypatch):
        from pixeltable_spark import exprs as E

        class FakeFn:
            requests_per_minute = 640.0

        n = spark.sparkContext.defaultParallelism
        assert E._async_rate(FakeFn()) == max(1.0, 640.0 / n)

    def test_offline_fake_unthrottled(self, spark):
        from pixeltable_spark import exprs as E

        class FakeFn:
            requests_per_minute = 1e12

        assert E._async_rate(FakeFn()) == 1e12


class TestAqeSkewJoin:
    """The engine's session enables AQE; this pins that a skewed
    shuffle join actually gets runtime skew-splitting (the 100 TB
    hot-key story: one pathological key must not serialize a join)."""

    def test_skewed_join_splits_hot_partition(self, spark):
        import contextlib
        import io

        confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        }
        saved = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            # 90% of rows share key 0 -> one hot shuffle partition
            left = spark.range(0, 200_000).select(
                F.when(F.col("id") % 10 < 9, 0)
                .otherwise(F.col("id") % 1000).alias("k"),
                F.concat(F.lit("padpadpadpadpadpadpad"),
                         F.col("id").cast("string")).alias("pay"))
            right = spark.range(0, 1000).select(
                F.col("id").alias("k"), F.lit("r").alias("rv"))
            j = left.join(right, "k")
            assert len(j.collect()) == 200_000
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                j.explain()
            plan = buf.getvalue()
            assert "isFinalPlan=true" in plan
            assert "skew=true" in plan, plan
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

"""ML-data prep operators (operators/mldata.py): split determinism and
append-stability, negative-sample contract (determinism, no self-pairs,
<=k slots), NDCG/MRR hand checks, standardize group/global + clipping."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.mldata import (
    weighted_sample_n,
    negative_samples,
    ranking_metrics,
    split_dataset,
    standardize,
)


@pytest.fixture()
def ids(spark):
    return spark.createDataFrame([(i,) for i in range(300)], ["doc_id"])


class TestSplitDataset:
    def test_proportions_and_total(self, spark, ids):
        out = split_dataset(ids, {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r["split"]: r["count"]
                  for r in out.groupBy("split").count().collect()}
        assert sum(counts.values()) == 300
        assert counts["train"] > counts.get("val", 0)
        assert counts["train"] > counts.get("test", 0)

    def test_deterministic_and_seed_sensitive(self, spark, ids):
        a = {r["doc_id"]: r["split"]
             for r in split_dataset(ids, {"a": 0.5, "b": 0.5}).collect()}
        b = {r["doc_id"]: r["split"]
             for r in split_dataset(ids, {"a": 0.5, "b": 0.5}).collect()}
        c = {r["doc_id"]: r["split"]
             for r in split_dataset(ids, {"a": 0.5, "b": 0.5},
                                    seed=7).collect()}
        assert a == b
        assert a != c

    def test_stable_under_append(self, spark, ids):
        before = {r["doc_id"]: r["split"]
                  for r in split_dataset(ids, {"tr": 0.7, "te": 0.3})
                  .collect()}
        bigger = spark.createDataFrame([(i,) for i in range(600)],
                                       ["doc_id"])
        after = {r["doc_id"]: r["split"]
                 for r in split_dataset(bigger, {"tr": 0.7, "te": 0.3})
                 .collect()}
        assert all(after[k] == v for k, v in before.items())

    def test_map_only_plan(self, spark, ids):
        plan = split_dataset(ids, {"a": 0.5, "b": 0.5}) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_validation(self, spark, ids):
        with pytest.raises(ValueError):
            split_dataset(ids, {})
        with pytest.raises(ValueError):
            split_dataset(ids, {"a": 0.0})


class TestNegativeSamples:
    def test_contract(self, spark, ids):
        out = negative_samples(ids, "doc_id", k=3, prefix_len=1).collect()
        assert all(r["neg_id"] != r["doc_id"] for r in out)
        per_anchor = {}
        for r in out:
            per_anchor.setdefault(r["doc_id"], set()).add(r["slot"])
        assert all(len(s) <= 3 and s <= {0, 1, 2}
                   for s in per_anchor.values())
        # 300 rows over 16 buckets: every probe bucket is occupied
        assert all(len(s) == 3 for s in per_anchor.values())

    def test_deterministic(self, spark, ids):
        a = sorted((r["doc_id"], r["slot"], r["neg_id"]) for r in
                   negative_samples(ids, "doc_id", k=2).collect())
        b = sorted((r["doc_id"], r["slot"], r["neg_id"]) for r in
                   negative_samples(ids, "doc_id", k=2).collect())
        assert a == b and len(a) > 0

    def test_no_cartesian_plan(self, spark, ids):
        plan = negative_samples(ids, "doc_id", k=2) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_validation(self, spark, ids):
        with pytest.raises(ValueError):
            negative_samples(ids, "doc_id", k=0)
        with pytest.raises(ValueError):
            negative_samples(ids, "doc_id", prefix_len=9)


class TestRankingMetrics:
    def test_hand_computed(self, spark):
        # q1: ranked rel [0, 2, 1] -> DCG = 2/log2(3) + 1/log2(4)
        #     ideal [2, 1, 0]     -> IDCG = 2/log2(2) + 1/log2(3)
        rows = [("q1", 0, 1), ("q1", 2, 2), ("q1", 1, 3),
                ("q2", 0, 1), ("q2", 0, 2)]
        df = spark.createDataFrame(rows, ["q", "rel", "rnk"])
        out = {r["q"]: (r["ndcg"], r["mrr"], r["hits"])
               for r in ranking_metrics(df, "q", "rel", "rnk", k=10)
               .collect()}
        dcg = 2 / math.log2(3) + 1 / math.log2(4)
        idcg = 2 / math.log2(2) + 1 / math.log2(3)
        assert out["q1"] == (round(dcg / idcg, 6), 0.5, 2)
        assert out["q2"] == (0.0, 0.0, 0)

    def test_k_cut(self, spark):
        rows = [("q", 1, 1), ("q", 5, 9)]
        df = spark.createDataFrame(rows, ["q", "rel", "rnk"])
        out = ranking_metrics(df, "q", "rel", "rnk", k=5).collect()[0]
        assert out["hits"] == 1 and out["ndcg"] == 1.0


class TestStandardize:
    @pytest.fixture()
    def feats(self, spark):
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
                ("b", 10.0), ("b", 10.0)]
        return spark.createDataFrame(rows, ["g", "x"])

    def test_grouped(self, spark, feats):
        out = standardize(feats, ["x"], by=["g"]).collect()
        got = sorted((r["g"], r["x"], r["x_z"]) for r in out)
        assert got[0] == ("a", 1.0, -1.0)
        assert got[1] == ("a", 2.0, 0.0)
        assert got[2] == ("a", 3.0, 1.0)
        # zero-variance group -> NULL
        assert got[3][2] is None and got[4][2] is None

    def test_global_with_clip(self, spark, feats):
        out = standardize(feats, ["x"], clip_sigma=1.0).collect()
        zs = [r["x_z"] for r in out]
        assert all(z is not None and -1.0 <= z <= 1.0 for z in zs)

    def test_validation(self, spark, feats):
        with pytest.raises(ValueError):
            standardize(feats, [])


class TestWeightedSampleN:
    @pytest.fixture()
    def weighted(self, spark):
        rows = [(i, "g", 1000.0 if i == 0 else 1.0) for i in range(40)]
        return spark.createDataFrame(rows, ["doc_id", "g", "w"])

    def test_deterministic_and_seed_sensitive(self, spark, weighted):
        a = sorted(r["doc_id"] for r in weighted_sample_n(
            weighted, 5, "w", by=["g"]).collect())
        b = sorted(r["doc_id"] for r in weighted_sample_n(
            weighted, 5, "w", by=["g"]).collect())
        c = sorted(r["doc_id"] for r in weighted_sample_n(
            weighted, 5, "w", by=["g"], seed=3).collect())
        assert a == b and len(a) == 5
        assert a != c

    def test_weight_drives_inclusion(self, spark, weighted):
        # doc 0 carries 1000x the weight: across 12 seeds it should be
        # sampled nearly always (P[miss] ~ (1 - 1000/1039)^5 ~ 1e-7)
        hits = sum(
            any(r["doc_id"] == 0 for r in weighted_sample_n(
                weighted, 5, "w", by=["g"], seed=s).collect())
            for s in range(12))
        assert hits >= 11

    def test_nonpositive_and_null_excluded(self, spark):
        rows = [(1, 1.0), (2, 0.0), (3, -4.0), (4, None)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        out = weighted_sample_n(df, 10, "w").collect()
        assert [r["doc_id"] for r in out] == [1]

    def test_per_group_cut(self, spark):
        rows = [(i, "a" if i < 30 else "b", 1.0) for i in range(50)]
        df = spark.createDataFrame(rows, ["doc_id", "g", "w"])
        out = weighted_sample_n(df, 7, "w", by=["g"]).collect()
        by_g = {}
        for r in out:
            by_g[r["g"]] = by_g.get(r["g"], 0) + 1
        assert by_g == {"a": 7, "b": 7}

    def test_validation(self, spark, weighted):
        with pytest.raises(ValueError):
            weighted_sample_n(weighted, 0, "w")


class TestRobustScale:
    def test_hand_computed(self, spark):
        from pixeltable_spark.operators.mldata import robust_scale
        # g=a: values 1..5 -> med 3, IQR 4-2=2; outlier group g=b
        rows = [("a", float(v)) for v in [1, 2, 3, 4, 5]] + \
               [("b", 7.0), ("b", 7.0)]
        df = spark.createDataFrame(rows, ["g", "x"])
        out = {(r["g"], r["x"]): r["x_r"]
               for r in robust_scale(df, ["x"], by=["g"]).collect()}
        assert out[("a", 3.0)] == 0.0
        assert out[("a", 5.0)] == 1.0
        assert out[("a", 1.0)] == -1.0
        assert out[("b", 7.0)] is None  # zero IQR

    def test_outlier_resistance(self, spark):
        from pixeltable_spark.operators.mldata import robust_scale
        base = [float(v) for v in range(1, 101)]
        clean = spark.createDataFrame([(v,) for v in base], ["x"])
        dirty = spark.createDataFrame(
            [(v,) for v in base + [1e9]], ["x"])
        rc = {r["x"]: r["x_r"] for r in robust_scale(clean, ["x"]).collect()}
        rd = {r["x"]: r["x_r"] for r in robust_scale(dirty, ["x"]).collect()}
        # the scale of ordinary points barely moves despite the 1e9 spike
        assert abs(rc[50.0] - rd[50.0]) < 0.02

    def test_validation(self, spark):
        from pixeltable_spark.operators.mldata import robust_scale
        df = spark.createDataFrame([(1.0,)], ["x"])
        with pytest.raises(ValueError):
            robust_scale(df, [])


class TestShuffleShards:
    def test_deterministic_across_partitioning(self, spark):
        from pixeltable_spark.operators.mldata import shuffle_shards
        df1 = spark.range(500).withColumnRenamed("id", "doc_id")
        df2 = df1.repartition(17)                   # different layout
        a = {r["doc_id"]: (r["shard"], r["shuffle_key"])
             for r in shuffle_shards(df1, 8).collect()}
        b = {r["doc_id"]: (r["shard"], r["shuffle_key"])
             for r in shuffle_shards(df2, 8).collect()}
        assert a == b
        # different seed reshuffles
        c = {r["doc_id"]: (r["shard"], r["shuffle_key"])
             for r in shuffle_shards(df1, 8, seed=1).collect()}
        assert c != a
        # shards are roughly balanced (binomial: 500/8 ± a wide margin)
        from collections import Counter
        sizes = Counter(s for s, _k in a.values())
        assert len(sizes) == 8 and max(sizes.values()) < 3 * 500 / 8

    def test_n_shards_validated(self, spark):
        import pytest as _pt

        from pixeltable_spark.operators.mldata import shuffle_shards
        df = spark.range(3).withColumnRenamed("id", "doc_id")
        with _pt.raises(ValueError, match="positive"):
            shuffle_shards(df, 0)

"""ML-data prep operators (operators/mldata.py): split determinism and
append-stability, negative-sample contract (determinism, no self-pairs,
<=k slots), NDCG/MRR hand checks, standardize group/global + clipping."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pixeltable_spark.operators.mldata import (
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

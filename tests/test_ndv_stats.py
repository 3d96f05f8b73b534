"""Manifest-resident HLL NDV sketches (ndv.py + catalog
add_ndv_stats / approx_count_distinct): approximate COUNT(DISTINCT)
from table metadata — per-file sketches built at commit over live MVCC
rows, register-max merged at read, refreshed file-granularly by
copy-on-write mutations."""
import math

import pytest

import pixeltable_spark as pxt
from pixeltable_spark.exceptions import Error, NotFoundError
from pixeltable_spark.ndv import ndv_build, ndv_estimate, ndv_merge


@pytest.fixture()
def cat(spark, tmp_path):
    return pxt.Catalog(spark, str(tmp_path / "wh"))


def _mk(cat, n=3000, mod=97):
    t = cat.create_table("t", {"k": pxt.Int(False), "s": pxt.String(True)},
                         n_buckets=4)
    t.add_ndv_stats("k")
    t.add_ndv_stats("s")
    t.insert([{"k": i, "s": f"v{i % mod}"} for i in range(n)])
    return t


class TestSketchMath:
    def test_estimate_within_3sigma(self):
        for n in (0, 1, 50, 500, 20000):
            sk = ndv_build(range(n), p=11)
            est = ndv_estimate(sk)
            # standard error 1.04/sqrt(2048) ≈ 2.3%; allow 3σ + small-n slack
            assert abs(est - n) <= max(3, 3 * 0.023 * n), (n, est)

    def test_merge_is_set_union(self):
        a = ndv_build(range(0, 1000), p=11)
        b = ndv_build(range(500, 1500), p=11)
        u = ndv_merge([a, b])
        # union == sketch built over the union (register max == global max)
        assert u == ndv_build(range(0, 1500), p=11)

    def test_duplicates_and_nulls_ignored(self):
        a = ndv_build([1, 1, 1, None, 2, None, 2], p=11)
        assert a == ndv_build([1, 2], p=11)

    def test_mixed_precision_refused(self):
        with pytest.raises(ValueError, match="mixed precisions"):
            ndv_merge([ndv_build([1], p=11), ndv_build([1], p=12)])

    def test_int_float_canonicalization(self):
        # 5 and 5.0 hash identically (same canonical key as the blooms)
        assert ndv_build([5], p=11) == ndv_build([5.0], p=11)


class TestTableNdv:
    def test_estimate_and_incremental_commits(self, cat):
        t = _mk(cat)
        est = t.approx_count_distinct("k")
        assert abs(est - 3000) / 3000 < 0.08
        assert t.approx_count_distinct("s") in range(90, 105)
        # a second commit's files merge in
        t.insert([{"k": i, "s": "x"} for i in range(3000, 5000)])
        est2 = t.approx_count_distinct("k")
        assert abs(est2 - 5000) / 5000 < 0.08

    def test_delete_and_update_refresh(self, cat):
        t = _mk(cat)
        t.delete(t.ref().k >= 1000)
        est = t.approx_count_distinct("k")
        # dead row-versions stay in the rewritten files but are
        # filtered at sketch build — the estimate tracks live rows
        assert abs(est - 1000) / 1000 < 0.08
        t.update({"s": "zz"}, where=t.ref().k < 500)
        s_est = t.approx_count_distinct("s")
        # live cats: v0..v96 (from k in [500,1000)) plus 'zz'
        assert abs(s_est - 98) < 8

    def test_zero_scan(self, cat, spark):
        """The estimate runs NO Spark job — it is a driver-side
        metadata fold (the 100 TB contract)."""
        t = _mk(cat, n=500)
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        t.approx_count_distinct("k")
        assert tracker.getJobIdsForGroup(None) == before

    def test_backfill_on_existing_table(self, cat):
        t = cat.create_table("t2", {"k": pxt.Int(False)})
        t.insert([{"k": i % 700} for i in range(2000)])
        t.add_ndv_stats("k")   # backfills the existing snapshot
        assert abs(t.approx_count_distinct("k") - 700) / 700 < 0.08

    def test_unregistered_and_unknown_column(self, cat):
        t = cat.create_table("t3", {"k": pxt.Int(False)})
        with pytest.raises(NotFoundError, match="no NDV sketch"):
            t.approx_count_distinct("k")
        with pytest.raises(NotFoundError, match="unknown column"):
            t.add_ndv_stats("nope")
        with pytest.raises(ValueError, match="precision"):
            t.add_ndv_stats("k", precision=20)

    def test_empty_table_is_zero(self, cat):
        t = cat.create_table("t4", {"k": pxt.Int(False)})
        t.add_ndv_stats("k")
        assert t.approx_count_distinct("k") == 0

    def test_persists_across_reload(self, cat, spark, tmp_path):
        t = _mk(cat, n=800)
        want = t.approx_count_distinct("k")
        cat2 = pxt.Catalog(spark, str(tmp_path / "wh"))
        t2 = cat2.get_table("t")
        assert t2.ndv_cols == {"k": 11, "s": 11}
        assert t2.approx_count_distinct("k") == want

    def test_rename_carries_drop_clears(self, cat):
        t = _mk(cat, n=400)
        t.rename_column("k", "key")
        assert "key" in t.ndv_cols and "k" not in t.ndv_cols
        est = t.approx_count_distinct("key")
        assert abs(est - 400) / 400 < 0.1
        t.drop_ndv_stats("key")
        with pytest.raises(NotFoundError):
            t.approx_count_distinct("key")
        t.drop_column("s")
        assert "s" not in t.ndv_cols


class TestJvmHllFunctions:
    """The JVM DataSketches fast path (functions hll_sketch_agg /
    hll_union_agg / hll_sketch_estimate): per-shard BINARY sketches
    that persist and re-union later — complements the metadata layer
    (different sketch impl; agreement is within error bounds)."""

    def test_sketch_union_estimate_roundtrip(self, spark):
        from pyspark.sql import functions as F

        from pixeltable_spark import functions as pxtf

        df = spark.range(0, 10000).selectExpr(
            "id as k", "cast(id % 4 as int) as shard")
        # per-shard sketches re-unioned later ≈ global estimate (the
        # DataSketches union is NOT bit-lossless across sparse/dense
        # mode transitions — both land within the error bound)
        shards = df.groupBy("shard").agg(
            F.hll_sketch_agg("k").alias("sk"))
        est_union = shards.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
        ).first()["e"]
        est_global = df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("k")).alias("e")
        ).first()["e"]
        assert abs(est_union - 10000) / 10000 < 0.05
        assert abs(est_global - 10000) / 10000 < 0.05
        # engine Function wrappers resolve and aggregate
        assert pxtf.hll_sketch_agg.name == "hll_sketch_agg"
        assert pxtf.hll_sketch_agg.is_agg
        assert not pxtf.hll_sketch_estimate.is_agg


class TestNdvInterplay:
    """Adversarial interplay: the sketches must stay true through
    every other path that rewrites or re-lists files."""

    def test_optimize_rewrite_keeps_estimate(self, cat):
        t = _mk(cat, n=1200)
        before = t.approx_count_distinct("k")
        t.insert([{"k": i, "s": "x"} for i in range(1200, 1500)])
        t.optimize()   # compaction rewrites buckets -> fresh sketches
        est = t.approx_count_distinct("k")
        assert abs(est - 1500) / 1500 < 0.08
        assert before != 0

    def test_revert_rolls_estimate_back(self, cat):
        t = _mk(cat, n=1000)
        v1_est = t.approx_count_distinct("k")
        t.insert([{"k": i, "s": "y"} for i in range(1000, 2000)])
        assert t.approx_count_distinct("k") > v1_est
        t.revert()
        # current files are v1's again; the metadata fold follows
        assert t.approx_count_distinct("k") == v1_est

    def test_checkpoint_collapse_carries_sketches(self, cat, monkeypatch):
        from pixeltable_spark.catalog import Table
        monkeypatch.setattr(Table, "_CHECKPOINT_SEGMENTS", 3)
        t = _mk(cat, n=200)
        for i in range(5):   # > threshold: forces a checkpoint collapse
            t.insert([{"k": 200 + 100 * i + j, "s": "c"}
                      for j in range(100)])
        est = t.approx_count_distinct("k")
        assert abs(est - 700) / 700 < 0.08

    def test_zorder_keeps_estimate(self, cat):
        t = _mk(cat, n=800)
        t.optimize(zorder_by=["k"])
        assert abs(t.approx_count_distinct("k") - 800) / 800 < 0.08

    def test_purge_does_not_resurrect_dead_rows(self, cat):
        t = _mk(cat, n=1000)
        t.delete(t.ref().k >= 400)
        v = t.version
        t.optimize(purge_before=v)   # physically drops expired rows
        est = t.approx_count_distinct("k")
        assert abs(est - 400) / 400 < 0.1


class TestTableStats:
    def test_stats_zero_scan_summary(self, cat, spark):
        t = _mk(cat, n=1000, mod=50)
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        st = t.stats()
        assert tracker.getJobIdsForGroup(None) == before  # no Spark job
        assert st["n_files"] >= 1 and st["total_bytes"] > 0
        assert st["version"] == t.version
        k = st["columns"]["k"]
        assert k["min"] == 0 and k["max"] == 999
        assert k["null_frac"] == 0.0
        assert abs(k["approx_ndv"] - 1000) / 1000 < 0.08
        s = st["columns"]["s"]
        assert s["min"] == "v0" and abs(s["approx_ndv"] - 50) < 8

    def test_stats_null_fraction(self, cat):
        t = cat.create_table("tn", {"k": pxt.Int(False),
                                    "v": pxt.Float(True)})
        t.insert([{"k": i, "v": (None if i % 4 == 0 else 1.0 * i)}
                  for i in range(400)])
        st = t.stats()
        assert st["columns"]["v"]["null_frac"] == pytest.approx(0.25)
        assert "approx_ndv" not in st["columns"]["v"]  # not registered

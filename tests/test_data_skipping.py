"""Manifest-stats data skipping: per-file min/max from parquet footers
recorded at commit, file pruning for simple predicates and time travel
(the Delta/Iceberg skipping design on the plain-parquet manifest store)."""

from __future__ import annotations

import json
import os

import pytest

import pixeltable_spark as pxt


@pytest.fixture()
def skip_tbl(spark, tmp_path):
    cat = pxt.Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("t", {"k": pxt.Int(False), "txt": pxt.String()})
    # three separate inserts -> three disjoint file sets with disjoint k
    for lo in (0, 100, 200):
        t.insert([{"k": lo + i, "txt": f"row {lo + i}"} for i in range(10)])
    return t


def _manifest(t) -> dict:
    with open(os.path.join(t.path, "CURRENT")) as f:
        cur = json.load(f)
    return t._resolve_manifest(cur["manifest"])


class TestStatsCollection:
    def test_manifest_has_stats(self, skip_tbl):
        m = _manifest(skip_tbl)
        assert m["files"] and set(m["stats"]) == set(m["files"])
        # every file's k range must be inside one insert's band
        for f, st in m["stats"].items():
            lo, hi = st["k"]
            assert hi - lo < 100
            assert "_rowid" in st and "_v_min" in st

    def test_stats_carried_forward_without_recompute(self, skip_tbl, monkeypatch):
        import pixeltable_spark.catalog as cat_mod
        seen = []
        orig = cat_mod.Table._collect_stats

        def spy(self, relpaths):
            seen.append(list(relpaths))
            return orig(self, relpaths)

        monkeypatch.setattr(cat_mod.Table, "_collect_stats", spy)
        skip_tbl.insert([{"k": 999, "txt": "x"}])
        # only the NEW files were read for stats
        assert seen and all(len(batch) <= 2 for batch in seen)
        prev = set(_manifest(skip_tbl)["files"])
        for batch in seen:
            for f in batch:
                assert f in prev


class TestPruning:
    def test_scan_prunes_files(self, skip_tbl):
        t = skip_tbl
        ref = t.ref()
        full = t._current_files()
        pruned = t._prune_files(full, t._current_stats(), [("k", ">=", 200)])
        assert 0 < len(pruned) < len(full)
        rows = t.scan(ref.k >= 200).select(ref.k).order_by(ref.k).collect()
        assert [r["k"] for r in rows] == list(range(200, 210))

    def test_scan_matches_unpruned(self, skip_tbl):
        t = skip_tbl
        ref = t.ref()
        for pred in (ref.k == 105, ref.k < 5, (ref.k >= 100) & (ref.k < 110)):
            a = sorted(r["k"] for r in t.scan(pred).select(ref.k).collect())
            b = sorted(r["k"] for r in
                       t.ref().where(pred).select(ref.k).collect())
            assert a == b

    def test_prune_everything_keeps_schema(self, skip_tbl):
        t = skip_tbl
        ref = t.ref()
        q = t.scan(ref.k == 10_000).select(ref.k, ref.txt)
        assert q.collect() == []

    def test_string_stats_prune(self, skip_tbl):
        t = skip_tbl
        pruned = t._prune_files(t._current_files(), t._current_stats(),
                                [("txt", "==", "row 205")])
        assert 0 < len(pruned) < len(t._current_files())

    def test_unknown_column_does_not_prune(self, skip_tbl):
        t = skip_tbl
        files = t._current_files()
        assert t._prune_files(files, t._current_stats(),
                              [("nope", "==", 1)]) == files


class TestTimeTravelPruning:
    def test_old_version_skips_new_files(self, skip_tbl):
        t = skip_tbl
        v_before = t.version
        t.insert([{"k": 1000 + i, "txt": "late"} for i in range(5)])
        ranges = [("_v_min", "<=", v_before), ("_v_max", ">", v_before)]
        pruned = t._prune_files(t._current_files(), t._current_stats(), ranges)
        assert len(pruned) < len(t._current_files())
        ref0 = t.ref(version=v_before)
        ks = sorted(r["k"] for r in ref0.select(ref0.k).collect())
        assert ks == sorted(list(range(10)) + list(range(100, 110))
                            + list(range(200, 210)))

    def test_update_then_old_read_correct(self, skip_tbl):
        t = skip_tbl
        ref = t.ref()
        v0 = t.version
        t.update({"txt": pxt.Literal("changed")}, where=ref.k == 5)
        r1 = t.ref()
        now = [r["txt"] for r in r1.where(r1.k == 5).select(r1.txt).collect()]
        r0 = t.ref(version=v0)
        old = [r["txt"] for r in r0.where(r0.k == 5).select(r0.txt).collect()]
        assert now == ["changed"] and old == ["row 5"]


class TestOptimize:
    def test_compacts_to_one_file_per_bucket(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh2"))
        t = cat.create_table("t", {"k": pxt.Int(False)}, n_buckets=4)
        for batch in range(5):
            t.insert([{"k": batch * 10 + i} for i in range(8)])
        before = t._current_files()
        rows_before = sorted(r["k"] for r in t.collect())
        res = t.optimize()
        after = t._current_files()
        assert res["files_after"] == len(after) < len(before)
        per_bucket: dict = {}
        for f in after:
            per_bucket.setdefault(t._bucket_of(f), []).append(f)
        assert all(len(v) == 1 for v in per_bucket.values()), per_bucket
        assert sorted(r["k"] for r in t.collect()) == rows_before
        # stats present for the compacted files too
        assert set(t._current_stats()) == set(after)

    def test_noop_when_already_compact(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh3"))
        t = cat.create_table("t", {"k": pxt.Int(False)}, n_buckets=2)
        t.insert([{"k": i} for i in range(4)])
        t.optimize()
        files = t._current_files()
        res = t.optimize()
        assert res["compacted_buckets"] == 0
        assert t._current_files() == files

    def test_time_travel_survives_optimize(self, skip_tbl):
        t = skip_tbl
        ref = t.ref()
        v0 = t.version
        t.update({"txt": pxt.Literal("upd")}, where=ref.k == 3)
        t.optimize()
        r0 = t.ref(version=v0)
        old = [r["txt"] for r in r0.where(r0.k == 3).select(r0.txt).collect()]
        r1 = t.ref()
        new = [r["txt"] for r in r1.where(r1.k == 3).select(r1.txt).collect()]
        assert old == ["row 3"] and new == ["upd"]

    def test_purge_before_reclaims_expired(self, skip_tbl):
        t = skip_tbl
        ref = t.ref()
        t.delete(where=ref.k < 5)
        v = t.version
        raw_before = t._store_df().count()
        t.optimize(purge_before=v)
        raw_after = t._store_df().count()
        assert raw_after == raw_before - 5
        # live content unchanged
        ks = sorted(r["k"] for r in t.collect())
        assert ks == sorted(list(range(5, 10)) + list(range(100, 110))
                            + list(range(200, 210)))

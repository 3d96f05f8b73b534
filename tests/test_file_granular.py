"""File-granular mutation battery (the Delta MERGE two-pass shape;
reference mutates rows in place via Postgres, store.py:27-58 — the
parquet analog is copy-on-write of exactly the files holding matched
rows).

Pins the property the write path claims at 100 TB: a mutation's commit
replaces ONLY the files that hold matched rows — every other current
file carries over into the new manifest by identical relpath, is never
re-read and never re-written. Bucket-granular COW (the previous design)
rewrites N/n_buckets rows for a 1-row update; file-granular COW rewrites
one file.
"""

from __future__ import annotations

import pytest

import pixeltable_spark as pxt
from pixeltable_spark.exprs import ColumnRef


def _mk(spark, tmp_path, n_commits=4, rows_per=200, n_buckets=2):
    """A table built from several inserts: each commit adds files with
    near-DISJOINT k ranges (bucket_chunk=256 so commits span multiple
    rowid chunks), so min/max stats can prove which files a narrow-k
    mutation can touch."""
    cat = pxt.Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table(
        "t", {"k": pxt.Int(False), "v": pxt.Float(True)},
        primary_key=["k"], n_buckets=n_buckets, bucket_chunk=256)
    for c in range(n_commits):
        base = c * rows_per
        t.insert([{"k": base + i, "v": float(base + i)}
                  for i in range(rows_per)])
    return cat, t


def _files(t):
    return set(t._current_files())


class TestFileGranularMutations:
    def test_narrow_update_touches_one_commits_files(self, spark, tmp_path):
        cat, t = _mk(spark, tmp_path)
        before = _files(t)
        # chunked bucketing: each 200-row commit fits one rowid chunk →
        # ONE file per commit (not one per bucket)
        assert len(before) >= 4
        # k=450 lives in commit 3's files only (rows 400..599); stats on
        # k prune every other commit's files, and only the one file whose
        # bucket holds rowid 450 actually matches
        st = t.update({"v": 0.5}, where=ColumnRef("k", t.schema["k"]) == 450)
        assert st.num_rows == 1
        after = _files(t)
        removed = before - after
        added = after - before
        assert len(removed) == 1, f"expected 1 rewritten file, got {removed}"
        assert len(added) == 1
        # untouched files carried over by identical relpath
        assert before - removed <= after
        got = {r["k"]: r["v"] for r in t.user_df().collect()}
        assert got[450] == 0.5 and got[449] == 449.0 and len(got) == 800

    def test_narrow_delete_touches_one_file(self, spark, tmp_path):
        cat, t = _mk(spark, tmp_path)
        before = _files(t)
        st = t.delete(where=ColumnRef("k", t.schema["k"]) == 123)
        assert st.num_rows == 1
        after = _files(t)
        assert len(before - after) == 1
        assert len(after - before) == 1
        assert t.count() == 799
        # the expired row-version is still in the rewritten file (MVCC):
        # time travel sees it
        assert t.df(version=4).count() == 800

    def test_zero_match_mutation_bumps_version_without_write(
            self, spark, tmp_path):
        cat, t = _mk(spark, tmp_path, n_commits=2)
        before, v0 = _files(t), t.version
        st = t.update({"v": 1.0},
                      where=ColumnRef("k", t.schema["k"]) == 10**9)
        assert st.num_rows == 0
        assert t.version == v0 + 1
        assert _files(t) == before

    def test_batch_update_prunes_by_key(self, spark, tmp_path):
        cat, t = _mk(spark, tmp_path)
        before = _files(t)
        st = t.batch_update([{"k": 700, "v": -1.0}, {"k": 710, "v": -2.0}])
        assert st.num_rows == 2
        after = _files(t)
        # both keys live in commit 4 (rows 600..799); at most that
        # commit's files (one per bucket) are rewritten
        assert len(before - after) <= 2
        got = {r["k"]: r["v"] for r in t.user_df().collect()}
        assert got[700] == -1.0 and got[710] == -2.0 and got[705] == 705.0

    def test_wide_update_still_correct(self, spark, tmp_path):
        cat, t = _mk(spark, tmp_path, n_commits=2, rows_per=100)
        t.update({"v": ColumnRef("v", t.schema["v"]) + 1000.0})
        got = {r["k"]: r["v"] for r in t.user_df().collect()}
        assert got[0] == 1000.0 and got[199] == 1199.0

    def test_revert_restores_and_carries_over(self, spark, tmp_path):
        cat, t = _mk(spark, tmp_path)
        t.update({"v": 9.9}, where=ColumnRef("k", t.schema["k"]) == 42)
        before = _files(t)
        t.revert()
        after = _files(t)
        # only the file(s) the update rewrote are touched by the revert
        assert len(before - after) <= 2
        got = {r["k"]: r["v"] for r in t.user_df().collect()}
        assert got[42] == 42.0 and len(got) == 800

    def test_recompute_columns_file_granular(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh"))
        t = cat.create_table("t", {"k": pxt.Int(False)}, n_buckets=2,
                             bucket_chunk=256)
        for c in range(3):
            t.insert([{"k": c * 100 + i} for i in range(100)])
        kref = ColumnRef("k", t.schema["k"])
        t.add_computed_column("k2", kref * 2, pxt.Int())
        before = _files(t)
        st = t.recompute_columns(["k2"], where=kref == 150)
        assert st.num_rows == 1
        after = _files(t)
        assert len(before - after) == 1
        got = {r["k"]: r["k2"] for r in t.user_df().collect()}
        assert got[150] == 300 and got[151] == 302

    def test_view_propagation_is_file_granular(self, spark, tmp_path):
        # 2400 rows span 3 rowid chunks, so the view materializes into
        # multiple files and a one-row change can leave some untouched
        cat, t = _mk(spark, tmp_path, rows_per=600)
        kref = ColumnRef("k", t.schema["k"])
        vref = ColumnRef("v", t.schema["v"])
        view = cat.create_view("big", t, predicate=vref >= 0.0,
                               extra_columns={"half": (vref * 0.5,
                                                       pxt.Float())},
                               bucket_chunk=800)
        assert view.count() == 2400
        vbefore = set(view._current_files())
        assert len(vbefore) >= 2
        t.update({"v": 2.0}, where=kref == 450)
        vafter = set(view._current_files())
        # the view rewrote only the file(s) holding rowid 450's view row
        assert len(vbefore - vafter) <= 2
        assert len(vbefore & vafter) >= len(vbefore) - 2
        got = {r["k"]: (r["v"], r["half"]) for r in
               view.df().select("k", "v", "half").collect()}
        assert got[450] == (2.0, 1.0) and got[449] == (449.0, 224.5)

    def test_update_entering_view_appends_without_expiry(
            self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh"))
        t = cat.create_table(
            "t", {"k": pxt.Int(False), "v": pxt.Float(True)}, n_buckets=2)
        t.insert([{"k": i, "v": float(-i - 1)} for i in range(50)])
        vref = ColumnRef("v", t.schema["v"])
        view = cat.create_view("pos", t, predicate=vref > 0.0)
        assert view.count() == 0
        # rows ENTER the view predicate: nothing to expire, pure append
        t.update({"v": 5.0}, where=ColumnRef("k", t.schema["k"]) < 3)
        assert view.count() == 3
        # and leave again
        t.update({"v": -5.0}, where=ColumnRef("k", t.schema["k"]) < 2)
        assert view.count() == 1


class TestEmptyIncrement:
    def test_empty_increment_adds_no_files(self, spark, tmp_path):
        """An insert that yields no view rows must not append the flat
        empty-marker file to a populated bucketed view store (it would
        flip the store into legacy whole-table-rewrite mode)."""
        cat = pxt.Catalog(spark, str(tmp_path / "wh"))
        t = cat.create_table(
            "t", {"k": pxt.Int(False), "v": pxt.Float(True)},
            n_buckets=2, bucket_chunk=256)
        t.insert([{"k": i, "v": float(i)} for i in range(50)])
        vref = ColumnRef("v", t.schema["v"])
        view = cat.create_view("pos", t, predicate=vref >= 10.0)
        assert view.count() == 40
        vfiles = set(view._current_files())
        t.insert([{"k": 100 + i, "v": 1.0} for i in range(20)])  # none pass
        assert view.count() == 40
        assert set(view._current_files()) == vfiles
        # and a passing increment still lands
        t.insert([{"k": 200, "v": 99.0}])
        assert view.count() == 41


class TestBloomPrunedMutation:
    def test_point_update_with_bloom(self, spark, tmp_path):
        cat, t = _mk(spark, tmp_path, n_commits=3, rows_per=100)
        t.add_bloom_filter("k")
        before = _files(t)
        st = t.update({"v": 7.0}, where=ColumnRef("k", t.schema["k"]) == 222)
        assert st.num_rows == 1
        after = _files(t)
        assert len(before - after) == 1
        got = {r["k"]: r["v"] for r in t.user_df().collect()}
        assert got[222] == 7.0 and got[221] == 221.0

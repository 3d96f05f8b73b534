"""Bloom-filter file skipping and z-order clustering (beyond-reference
lakehouse scale features on the manifest store; same roles as Delta bloom
indexes and OPTIMIZE ZORDER BY). Blooms prune equality lookups min/max
stats can't (high-cardinality unsorted keys span ~the full range in every
file); z-order makes min/max pruning effective on EVERY clustered column
at once instead of only the leading sort key."""

from __future__ import annotations

import json
import os

import pytest

import pixeltable_spark as pxt
from pixeltable_spark.catalog import (_bloom_build, _bloom_key,
                                      _bloom_might_contain, _bloom_params)


def _manifest(t) -> dict:
    with open(os.path.join(t.path, "CURRENT")) as f:
        cur = json.load(f)
    return t._resolve_manifest(cur["manifest"])


class TestBloomUnit:
    def test_no_false_negatives(self):
        vals = [f"url-{i}" for i in range(500)]
        b = _bloom_build(vals, 0.01)
        assert all(_bloom_might_contain(b, v) for v in vals)

    def test_fpp_near_target(self):
        vals = [f"url-{i}" for i in range(2000)]
        b = _bloom_build(vals, 0.01)
        probes = [f"absent-{i}" for i in range(5000)]
        fp = sum(_bloom_might_contain(b, p) for p in probes) / len(probes)
        assert fp < 0.03  # target 0.01, generous margin

    def test_int_float_equality_collides(self):
        # col == 5 and col == 5.0 must hash identically
        assert _bloom_key(5) == _bloom_key(5.0)
        assert _bloom_key(True) != _bloom_key(1)

    def test_none_values_skipped(self):
        b = _bloom_build([None, None, "a"], 0.01)
        assert _bloom_might_contain(b, "a")
        assert _bloom_build([None, None], 0.01) is None

    def test_params_sane(self):
        m, k = _bloom_params(1000, 0.01)
        assert 9000 <= m <= 10500 and 5 <= k <= 9


@pytest.fixture()
def bloom_tbl(spark, tmp_path):
    cat = pxt.Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("t", {"url": pxt.String(), "n": pxt.Int()})
    # interleaved keys: every file's min/max url range overlaps every
    # other's, so min/max stats alone cannot prune a point lookup
    for batch in range(3):
        t.insert([{"url": f"https://ex.com/{i}-{batch}", "n": i}
                  for i in range(50)])
    return t


class TestBloomSkipping:
    def test_backfill_writes_blooms(self, bloom_tbl):
        t = bloom_tbl
        t.add_bloom_filter("url")
        m = _manifest(t)
        assert all("__bloom__url" in st for st in m["stats"].values())

    def test_point_lookup_prunes(self, bloom_tbl):
        t = bloom_tbl
        files = t._current_files()
        # absent key INSIDE every file's string min/max range: min/max
        # stats alone cannot prune it
        probe = [("url", "==", "https://ex.com/30-9")]
        minmax_kept = t._prune_files(files, t._current_stats(), probe)
        t.add_bloom_filter("url")
        stats = t._current_stats()
        kept_none = t._prune_files(files, stats, probe)
        assert len(kept_none) < len(minmax_kept)
        assert len(kept_none) <= 2  # fpp stragglers at most
        # a present key keeps its file
        kept = t._prune_files(files, stats,
                              [("url", "==", "https://ex.com/7-1")])
        assert 1 <= len(kept) < len(files)

    def test_scan_results_identical(self, bloom_tbl):
        t = bloom_tbl
        ref = t.ref()
        before = sorted(r["n"] for r in
                        t.scan(ref.url == "https://ex.com/7-1").collect())
        t.add_bloom_filter("url")
        after = sorted(r["n"] for r in
                       t.scan(ref.url == "https://ex.com/7-1").collect())
        assert before == after == [7]
        assert t.scan(ref.url == "https://ex.com/30-9").count() == 0

    def test_new_files_get_blooms_incrementally(self, bloom_tbl):
        t = bloom_tbl
        t.add_bloom_filter("url")
        t.insert([{"url": "https://new.example/x", "n": 999}])
        m = _manifest(t)
        assert all("__bloom__url" in st for st in m["stats"].values())
        files = t._current_files()
        kept = t._prune_files(files, t._current_stats(),
                              [("url", "==", "https://new.example/x")])
        assert 1 <= len(kept) < len(files)

    def test_survives_reload(self, bloom_tbl, spark):
        t = bloom_tbl
        t.add_bloom_filter("url", fpp=0.02)
        cat2 = pxt.Catalog(spark, t.catalog.root)
        t2 = cat2.get_table("t")
        assert t2.bloom_cols == {"url": 0.02}
        t2.insert([{"url": "https://reload.example/y", "n": 1}])
        m = _manifest(t2)
        assert all("__bloom__url" in st for st in m["stats"].values())

    def test_in_list_pruning(self, bloom_tbl):
        t = bloom_tbl
        t.add_bloom_filter("url")
        files = t._current_files()
        stats = t._current_stats()
        # batched point lookup: keep only files admitting SOME listed key
        kept = t._prune_files(
            files, stats,
            [("url", "in", ["https://ex.com/7-1", "https://ex.com/9-2"])])
        assert 1 <= len(kept) < len(files)
        none = t._prune_files(
            files, stats,
            [("url", "in", ["https://ex.com/30-9", "https://ex.com/31-9"])])
        assert len(none) <= 2
        # empty IN-list is always-false: pruning everything is correct
        assert t._prune_files(files, stats, [("url", "in", [])]) == []
        # end-to-end: scan with isin matches the unpruned filter
        ref = t.ref()
        got = sorted(r["n"] for r in t.scan(
            ref.url.isin(["https://ex.com/7-1", "https://ex.com/9-2"])
        ).collect())
        assert got == [7, 9]

    def test_unknown_column_raises(self, bloom_tbl):
        with pytest.raises(Exception):
            bloom_tbl.add_bloom_filter("nope")

    def test_drop_bloom(self, bloom_tbl):
        t = bloom_tbl
        t.add_bloom_filter("url")
        t.drop_bloom_filter("url")
        assert t.bloom_cols == {}
        t.insert([{"url": "u", "n": 1}])  # commits fine without blooms


@pytest.fixture()
def z_tbl(spark, tmp_path):
    cat = pxt.Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("pts", {"x": pxt.Int(False), "y": pxt.Int(False)})
    # x and y independent: lexicographic sort by x leaves y untight
    rows = [{"x": (i * 131) % 1024, "y": (i * 257) % 1024}
            for i in range(4096)]
    t.insert(rows)
    return t


class TestZOrder:
    def test_rows_unchanged(self, z_tbl):
        t = z_tbl
        before = sorted((r["x"], r["y"]) for r in t.ref().collect())
        res = t.optimize(zorder_by=["x", "y"], target_files=16)
        assert res["zorder_by"] == ["x", "y"]
        after = sorted((r["x"], r["y"]) for r in t.ref().collect())
        assert before == after

    def test_multi_column_pruning_improves(self, z_tbl):
        t = z_tbl
        t.optimize(zorder_by=["x", "y"], target_files=16)
        files = t._current_files()
        assert len(files) >= 8  # the rewrite actually split into many files
        stats = t._current_stats()
        ranges = [("x", ">=", 0), ("x", "<", 128),
                  ("y", ">=", 0), ("y", "<", 128)]
        kept = t._prune_files(files, stats, ranges)
        # a 1/8 x 1/8 box touches a small corner of z-space; without
        # clustering every file would survive
        assert len(kept) <= len(files) / 2
        ref = t.ref()
        got = t.scan((ref.x < 128) & (ref.y < 128)).count()
        want = sum(1 for i in range(4096)
                   if (i * 131) % 1024 < 128 and (i * 257) % 1024 < 128)
        assert got == want

    def test_time_travel_survives_zorder(self, z_tbl):
        t = z_tbl
        v = t.version
        t.insert([{"x": 9999, "y": 9999}])
        t.optimize(zorder_by=["x", "y"], target_files=8)
        assert t.ref(version=v).count() == 4096
        assert t.ref().count() == 4097

    def test_unsupported_column_rejected(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh2"))
        t = cat.create_table("s", {"s": pxt.Array(pxt.Float())})
        t.insert([{"s": [1.0, 2.0]}])
        with pytest.raises(ValueError, match="zorder_by"):
            t.optimize(zorder_by=["s"])

    def test_string_column_clusters(self, spark, tmp_path):
        """String z-order: 48-bit UTF-8 prefix key clusters lexicographic
        neighborhoods, so a prefix-range predicate prunes files."""
        cat = pxt.Catalog(spark, str(tmp_path / "wh4"))
        t = cat.create_table("s", {"host": pxt.String(), "n": pxt.Int()})
        hosts = [f"{p}{i:04d}.example.com" for i in range(400)
                 for p in ("alpha-", "beta-", "gamma-", "zeta-")]
        t.insert([{"host": h, "n": i} for i, h in enumerate(hosts)])
        before = sorted((r["host"], r["n"]) for r in t.ref().collect())
        t.optimize(zorder_by=["host", "n"], target_files=16)
        after = sorted((r["host"], r["n"]) for r in t.ref().collect())
        assert before == after
        files = t._current_files()
        assert len(files) >= 8
        kept = t._prune_files(files, t._current_stats(),
                              [("host", ">=", "beta-"), ("host", "<", "c")])
        assert len(kept) <= len(files) / 2
        ref = t.ref()
        assert t.scan((ref.host >= "beta-") & (ref.host < "c")).count() == 400

    def test_constant_and_null_columns(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh3"))
        t = cat.create_table("c", {"a": pxt.Int(), "b": pxt.Int()})
        t.insert([{"a": 7, "b": i if i % 3 else None} for i in range(100)])
        t.optimize(zorder_by=["a", "b"], target_files=4)
        assert t.ref().count() == 100


class TestStringStatTruncation:
    def test_manifest_bounded_and_pruning_safe(self, spark, tmp_path):
        from pixeltable_spark.catalog import (_STR_STAT_MAX,
                                              _truncate_str_stats)
        lo, hi = _truncate_str_stats("a" * 100, "b" * 100, 8)
        assert lo == "a" * 8 and hi == "b" * 7 + "c" and "b" * 100 <= hi
        assert _truncate_str_stats("x", "\U0010FFFF" * 9, 8)[1] is None
        cat = pxt.Catalog(spark, str(tmp_path / "wh"))
        t = cat.create_table("d", {"k": pxt.String(), "body": pxt.String()})
        t.insert([{"k": f"key-{i:03d}", "body": f"prefix-{i:03d} " + "z" * 500}
                  for i in range(50)])
        stats = t._current_stats()
        for st in stats.values():
            for col, v in st.items():
                if col.startswith("__bloom__") or not isinstance(v, list):
                    continue
                for bound in v:
                    if isinstance(bound, str):
                        assert len(bound) <= _STR_STAT_MAX + 1
        # pruning on the long column still correct (conservative bounds)
        ref = t.ref()
        got = t.scan(ref.body >= "prefix-045").count()
        assert got == 5


class TestNullCountSkipping:
    def test_is_null_pruning(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh"))
        t = cat.create_table("n", {"k": pxt.Int(False), "v": pxt.Int()})
        t.insert([{"k": i, "v": i} for i in range(40)])          # no nulls
        t.insert([{"k": 100 + i, "v": None} for i in range(40)])  # all null
        t.insert([{"k": 200 + i, "v": None if i % 2 else i}
                  for i in range(40)])                            # mixed
        files = t._current_files()
        stats = t._current_stats()
        assert any("__nulls__v" in st for st in stats.values())
        only_null = t._prune_files(files, stats, [("v", "isnull", None)])
        only_set = t._prune_files(files, stats, [("v", "notnull", None)])
        assert len(only_null) < len(files)      # no-null files pruned
        assert len(only_set) < len(files)       # all-null files pruned
        ref = t.ref()
        assert t.scan(ref.v.is_null()).count() == 60
        assert t.scan(~(ref.v == None)).count() == 60  # noqa: E711
        got = sorted(r["k"] for r in t.scan(ref.v.is_null()).collect())
        assert got[:3] == [100, 101, 102]

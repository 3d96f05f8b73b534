"""Executor-local persistent media file cache (reference
exec/cache_prefetch_node.py FileCache + tests/test_file_cache.py):
LRU-by-size eviction, hit-path recency bumps, atomicity, pluggable
opener, and end-to-end reuse through prefetch_payloads across queries
and across Python worker processes."""

from __future__ import annotations

import os
import time
import uuid

import pytest
from pyspark.sql import Row

from pixeltable_spark.operators.file_cache import FileCache, shared_cache
from pixeltable_spark.operators.multimodal import prefetch_payloads


class CountingOpener:
    """Fake opener that tallies fetches (driver-side tests only)."""

    def __init__(self, data: dict):
        self.data = data
        self.calls: list = []

    def __call__(self, key: str) -> bytes:
        self.calls.append(key)
        return self.data[key]


class TestFileCache:
    def test_hit_avoids_refetch(self, tmp_path):
        c = FileCache(str(tmp_path / "fc"), capacity_bytes=1 << 20)
        op = CountingOpener({"k1": b"payload-one"})
        assert c.get_or_fetch("k1", op) == b"payload-one"
        assert c.get_or_fetch("k1", op) == b"payload-one"
        assert c.get_or_fetch("k1", op) == b"payload-one"
        assert op.calls == ["k1"], "fetched more than once"

    def test_persists_across_cache_objects(self, tmp_path):
        d = str(tmp_path / "fc")
        op = CountingOpener({"k": b"x" * 100})
        FileCache(d).get_or_fetch("k", op)
        # a NEW cache object over the same dir (= worker restart) hits
        assert FileCache(d).get_or_fetch("k", op) == b"x" * 100
        assert op.calls == ["k"]

    def test_eviction_by_size_drops_oldest(self, tmp_path):
        c = FileCache(str(tmp_path / "fc"), capacity_bytes=250)
        c.put("a", b"a" * 100)
        time.sleep(0.02)
        c.put("b", b"b" * 100)
        time.sleep(0.02)
        c.put("c", b"c" * 100)  # 300 bytes > 250 -> oldest ('a') evicted
        assert c.lookup("a") is None
        assert c.lookup("b") == b"b" * 100
        assert c.lookup("c") == b"c" * 100
        assert c.total_bytes() <= 250

    def test_lru_recency_bump_protects_hit_entries(self, tmp_path):
        c = FileCache(str(tmp_path / "fc"), capacity_bytes=250)
        c.put("a", b"a" * 100)
        time.sleep(0.02)
        c.put("b", b"b" * 100)
        time.sleep(0.02)
        assert c.lookup("a") is not None  # touch 'a' -> 'b' is now LRU
        time.sleep(0.02)
        c.put("c", b"c" * 100)
        assert c.lookup("b") is None, "recency bump ignored"
        assert c.lookup("a") is not None
        assert c.lookup("c") is not None

    def test_opener_errors_not_cached(self, tmp_path):
        c = FileCache(str(tmp_path / "fc"))
        calls = []

        def flaky(key):
            calls.append(key)
            if len(calls) == 1:
                raise OSError("transient")
            return b"ok"

        with pytest.raises(OSError):
            c.get_or_fetch("k", flaky)
        assert c.get_or_fetch("k", flaky) == b"ok"
        assert len(calls) == 2
        assert c.get_or_fetch("k", flaky) == b"ok"  # now cached
        assert len(calls) == 2

    def test_shared_cache_is_per_dir_singleton(self, tmp_path):
        d = str(tmp_path / "fc")
        assert shared_cache(d, 100) is shared_cache(d, 100)
        assert shared_cache(d, 100) is not shared_cache(d, 200)


class TestPrefetchWithCache:
    def _mk_media(self, tmp_path, n=6):
        src = tmp_path / "src"
        src.mkdir()
        paths = []
        for i in range(n):
            p = src / f"m{i}.bin"
            p.write_bytes(f"media-{i}".encode() * 20)
            paths.append(str(p))
        return paths

    def test_second_query_survives_source_deletion(self, spark, tmp_path):
        """The end-to-end proof that the cache, not the source, serves
        the second query: run prefetch, DELETE the source files, run the
        same prefetch again — every payload must still come back."""
        paths = self._mk_media(tmp_path)
        cache_dir = str(tmp_path / "cache")
        df = spark.createDataFrame(
            [Row(media_id=i, media_path=p) for i, p in enumerate(paths)],
            "media_id int, media_path string")
        out1 = prefetch_payloads(df, cache_dir=cache_dir).collect()
        assert all(r["payload"] is not None for r in out1)
        for p in paths:
            os.remove(p)
        out2 = {r["media_id"]: r for r in
                prefetch_payloads(df, cache_dir=cache_dir).collect()}
        assert all(out2[i]["payload"] is not None
                   and out2[i][f"_fetch_error_payload"] is None
                   for i in range(len(paths)))
        assert bytes(out2[0]["payload"]) == b"media-0" * 20
        # control: WITHOUT the cache the same second query must fail
        ctrl = prefetch_payloads(df).collect()
        assert all(r["payload"] is None for r in ctrl)

    def test_cache_eviction_under_spark(self, spark, tmp_path):
        """A tiny byte cap forces eviction on the executor side; the
        query still returns every payload (cache is an optimization,
        never a correctness dependency)."""
        paths = self._mk_media(tmp_path, n=8)
        cache_dir = str(tmp_path / "cache2")
        df = spark.createDataFrame(
            [Row(media_id=i, media_path=p) for i, p in enumerate(paths)],
            "media_id int, media_path string")
        out = prefetch_payloads(df, cache_dir=cache_dir,
                                cache_bytes=300).collect()
        assert all(r["payload"] is not None for r in out)
        c = FileCache(cache_dir, capacity_bytes=300)
        assert c.total_bytes() <= 300
        assert 0 < c.num_entries() < len(paths)

    def test_missing_file_error_column(self, spark, tmp_path):
        df = spark.createDataFrame(
            [Row(media_id=1, media_path=str(tmp_path / "nope.bin")),
             Row(media_id=2, media_path=None)],
            "media_id int, media_path string")
        rows = {r["media_id"]: r for r in
                prefetch_payloads(df, cache_dir=str(tmp_path / "c")).collect()}
        assert rows[1]["payload"] is None and "Error" in rows[1]["_fetch_error_payload"]
        assert rows[2]["payload"] is None and rows[2]["_fetch_error_payload"] == "null path"

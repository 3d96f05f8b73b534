"""Executor-local persistent media file cache (LRU by size).

The reference keeps a local LRU file cache so repeated queries over
remote media don't re-download every time (reference
exec/cache_prefetch_node.py + tests/test_file_cache.py); pixeltable's
FileCache evicts by least-recent use with a byte-size cap. Same design
here, adapted to Spark's execution model:

* the cache lives on EXECUTOR-LOCAL disk (one directory per machine,
  shared by that machine's Python workers) — at 100 TB the whole point
  is that a re-run of a query over remote media touches the object
  store only for keys this executor has never seen;
* entries are content-addressed by the SOURCE key (md5 of the URL/path),
  written atomically (tmp + rename) so concurrent workers on one machine
  never observe torn files, and "recent use" is the file mtime, bumped
  on every hit — the on-disk state IS the LRU index, so the cache
  survives process restarts with no sidecar metadata to corrupt;
* eviction walks the directory and removes oldest-mtime entries until
  under the cap; it is best-effort and crash-safe (losing a cache entry
  only costs a re-fetch).

The opener is pluggable: `get_or_fetch(key, opener)` takes whatever
fetch function the deployment needs (local open, s3 GET, http) — the
cache itself never interprets keys.
"""

from __future__ import annotations

import hashlib
import os
import threading
import uuid as _uuid
from typing import Callable, Optional

DEFAULT_CAPACITY_BYTES = 10 << 30  # 10 GiB — a real deployment sizes
                                   # this to the executor's scratch disk


def default_cache_dir() -> str:
    return os.environ.get(
        "PXT_SPARK_MEDIA_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "pixeltable_spark", "media"))


class FileCache:
    """Content-keyed LRU byte cache on local disk. Thread-safe within a
    process; safe to share a directory across processes (atomic writes,
    best-effort eviction)."""

    def __init__(self, cache_dir: Optional[str] = None,
                 capacity_bytes: int = DEFAULT_CAPACITY_BYTES):
        self.dir = cache_dir or default_cache_dir()
        self.capacity = int(capacity_bytes)
        self._lock = threading.Lock()
        os.makedirs(self.dir, exist_ok=True)

    # -- key/path mapping ---------------------------------------------------
    def _entry_path(self, key: str) -> str:
        return os.path.join(self.dir,
                            hashlib.md5(key.encode("utf-8")).hexdigest()
                            + ".bin")

    # -- public api ----------------------------------------------------------
    def lookup(self, key: str) -> Optional[bytes]:
        """Cached bytes for `key`, bumping its recency; None on miss."""
        p = self._entry_path(key)
        try:
            with open(p, "rb") as f:
                data = f.read()
            # bump mtime = mark most-recently-used (the LRU clock)
            os.utime(p, None)
            return data
        except OSError:
            return None

    def put(self, key: str, data: bytes) -> None:
        """Insert/overwrite an entry (atomic), then evict if over cap."""
        p = self._entry_path(key)
        tmp = p + ".tmp-" + _uuid.uuid4().hex[:8]
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            # fsync before the rename (same discipline as the catalog's
            # _atomic_write): without it a power loss can persist the
            # rename but not the data, and lookup would serve truncated
            # bytes as valid media forever
            os.fsync(f.fileno())
        os.rename(tmp, p)
        self._evict_if_needed()

    def get_or_fetch(self, key: str,
                     opener: Callable[[str], bytes]) -> bytes:
        """Cached bytes for `key`, fetching+caching via `opener` on a
        miss. Only SUCCESSFUL fetches are cached; opener exceptions
        propagate (the caller decides error policy per row)."""
        data = self.lookup(key)
        if data is not None:
            return data
        data = opener(key)
        if data is not None:
            self.put(key, data)
        return data

    def clear(self) -> None:
        for name in os.listdir(self.dir):
            if name.endswith(".bin"):
                try:
                    os.remove(os.path.join(self.dir, name))
                except OSError:
                    pass

    def total_bytes(self) -> int:
        tot = 0
        for name in os.listdir(self.dir):
            if name.endswith(".bin"):
                try:
                    tot += os.path.getsize(os.path.join(self.dir, name))
                except OSError:
                    pass
        return tot

    def num_entries(self) -> int:
        return sum(1 for n in os.listdir(self.dir) if n.endswith(".bin"))

    # -- eviction -------------------------------------------------------------
    def _evict_if_needed(self) -> None:
        """Drop least-recently-used entries until total size <= capacity.
        Serialized per process; races with other processes are harmless
        (an entry deleted twice or resurrected costs one re-fetch)."""
        with self._lock:
            entries = []
            tot = 0
            for name in os.listdir(self.dir):
                if not name.endswith(".bin"):
                    continue
                p = os.path.join(self.dir, name)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                entries.append((st.st_mtime, st.st_size, p))
                tot += st.st_size
            if tot <= self.capacity:
                return
            for _mtime, size, p in sorted(entries):
                try:
                    os.remove(p)
                    tot -= size
                except OSError:
                    pass
                if tot <= self.capacity:
                    return


# one cache per (dir, capacity) per process — executors reuse it across
# Arrow batches and across queries (spark.python.worker.reuse keeps the
# worker alive, and the directory itself outlives every process)
_CACHES: dict = {}
_CACHES_LOCK = threading.Lock()


def shared_cache(cache_dir: Optional[str] = None,
                 capacity_bytes: int = DEFAULT_CAPACITY_BYTES) -> FileCache:
    key = (cache_dir or default_cache_dir(), int(capacity_bytes))
    with _CACHES_LOCK:
        c = _CACHES.get(key)
        if c is None:
            c = _CACHES[key] = FileCache(key[0], key[1])
        return c

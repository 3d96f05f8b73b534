"""Pluggable commit-protocol backends for the table store.

The engine's commit protocol has exactly two storage-dependent
primitives (everything else — segment/manifest writes under unique
names, data-file writes — is plain unconditional object puts):

* **mutation_guard** — how racing writers are kept from clobbering each
  other: either a held mutex for the whole mutation (pessimistic) or
  nothing at all (optimistic — conflicts surface at commit time);
* **swap_current** — the commit point: publish a new CURRENT pointer,
  atomically failing if another writer moved it since this mutation
  read its base snapshot (compare-and-swap).

``PosixCommitStore`` is the shared-filesystem implementation the engine
has always had: a per-table advisory ``flock`` held for the whole
mutation + a plain atomic rename for the swap (the lock already
excludes racers). ``flock`` releases on process death, so a crashed
writer can never wedge the table.

``ObjectStoreCommitStore`` is the S3/GCS-shaped implementation: **no
lock is ever held across the mutation** (object stores have no locks
and mutations can span minutes); instead the swap is a *conditional
put* — publish CURRENT only if it still carries the token observed at
read time, else fail with ConcurrencyError and let the engine retry
the whole mutation against the rebased snapshot (the Delta Lake
LogStore / Iceberg conditional-commit protocol; S3 now supports this
natively via If-Match/If-None-Match preconditions). Because mutations
race freely, vacuum must not delete files younger than a retention
window — an in-flight writer's uncommitted data/segment files look
unreferenced until its commit lands (same reason Delta's VACUUM has a
retention period).

This module runs on a local filesystem, so the conditional put is
*emulated*: a microscopic flock is taken around the single
read-compare-write of the CURRENT pointer — emulating only the
server-side atomicity a real conditional PUT provides, never held
across user work. The engine-visible semantics (optimistic
concurrency, commit-time conflict detection, retry-with-rebase) are
exactly the object-store ones, which is what the concurrency and
fault-injection suites pin down for both backends.

Reference parity: the reference serializes writers through Postgres
row locks (tests/test_concurrent.py); here the same contract is met by
either backend.
"""

from __future__ import annotations

import fcntl
import json
import os
import time
import uuid as _uuid
from contextlib import contextmanager
from typing import Optional

from .exceptions import ConcurrencyError


def _atomic_write(path: str, data: str) -> None:
    tmp = path + ".tmp-" + _uuid.uuid4().hex[:8]
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)  # atomic on POSIX


def _current_manifest(current_path: str) -> Optional[str]:
    """The manifest CURRENT references, or None when unset/unreadable."""
    try:
        with open(current_path) as f:
            return json.load(f)["manifest"]
    except (OSError, KeyError, json.JSONDecodeError):
        return None


class CommitStore:
    """Abstract commit backend. Subclasses set the class attrs and
    implement mutation_guard / swap_current."""

    name = "abstract"
    #: how many times the engine retries a WHOLE mutation after a
    #: commit-time conflict (0 = surface ConcurrencyError immediately)
    commit_retries = 0
    #: vacuum skips files younger than this (seconds) — nonzero for
    #: optimistic backends where in-flight writers' files look orphaned
    vacuum_min_age_s = 0.0

    @contextmanager
    def mutation_guard(self, table_path: str, table_name: str,
                       timeout_s: float):
        raise NotImplementedError

    def swap_current(self, current_path: str, payload: str,
                     expected_manifest: Optional[str],
                     table_name: str) -> None:
        """Publish CURRENT := payload iff it still references
        `expected_manifest` (None = unconditional). Raises
        ConcurrencyError on mismatch."""
        raise NotImplementedError

    def _check(self, current_path: str, expected_manifest: Optional[str],
               table_name: str) -> None:
        """expected None = unconditional put; "" = CURRENT must not
        exist yet (If-None-Match); a relpath = CURRENT must still
        reference it (If-Match)."""
        if expected_manifest is None:
            return
        if not os.path.exists(current_path):
            if expected_manifest == "":
                return
            # CURRENT never disappears once created; treat as conflict
            raise ConcurrencyError(
                f"concurrent modification of table {table_name!r}: "
                f"CURRENT vanished (expected {expected_manifest})")
        now = _current_manifest(current_path)
        if now != expected_manifest:
            raise ConcurrencyError(
                f"concurrent modification of table {table_name!r}: "
                f"CURRENT moved from {expected_manifest or '<none>'} to "
                f"{now} during this mutation; re-read and retry")


class PosixCommitStore(CommitStore):
    """Pessimistic shared-filesystem backend: per-table flock held for
    the whole mutation; the swap is a plain atomic rename (the held
    lock already excludes racing committers)."""

    name = "posix"
    commit_retries = 0
    vacuum_min_age_s = 0.0

    @contextmanager
    def mutation_guard(self, table_path: str, table_name: str,
                       timeout_s: float):
        os.makedirs(table_path, exist_ok=True)
        fh = open(os.path.join(table_path, "LOCK"), "a+")
        try:
            deadline = time.time() + timeout_s
            while True:
                try:
                    fcntl.flock(fh.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except OSError:
                    if time.time() >= deadline:
                        raise ConcurrencyError(
                            f"table {table_name!r}: write lock not acquired "
                            f"within {timeout_s:.0f}s — another writer "
                            "holds it (PXT_SPARK_LOCK_TIMEOUT tunes the "
                            "wait)")
                    time.sleep(0.05)
            try:
                yield
            finally:
                fcntl.flock(fh.fileno(), fcntl.LOCK_UN)
        finally:
            fh.close()

    def swap_current(self, current_path: str, payload: str,
                     expected_manifest: Optional[str],
                     table_name: str) -> None:
        # the mutation_guard lock is held: check-then-write is race-free
        self._check(current_path, expected_manifest, table_name)
        _atomic_write(current_path, payload)


class ObjectStoreCommitStore(CommitStore):
    """Optimistic object-store-shaped backend: no lock across the
    mutation; the swap is a conditional put (fails on a moved CURRENT)
    and the engine retries the whole mutation on conflict. The
    conditional put's server-side atomicity is emulated locally with a
    flock held only around the single read-compare-write."""

    name = "object-store"
    commit_retries = int(os.environ.get("PXT_SPARK_COMMIT_RETRIES", "6"))
    vacuum_min_age_s = float(os.environ.get(
        "PXT_SPARK_VACUUM_MIN_AGE", "3600"))

    @contextmanager
    def mutation_guard(self, table_path: str, table_name: str,
                       timeout_s: float):
        os.makedirs(table_path, exist_ok=True)
        yield  # optimistic: conflicts surface at swap_current

    def swap_current(self, current_path: str, payload: str,
                     expected_manifest: Optional[str],
                     table_name: str) -> None:
        lock_path = current_path + ".caslock"
        with open(lock_path, "a+") as fh:
            fcntl.flock(fh.fileno(), fcntl.LOCK_EX)  # microscopic window
            try:
                self._check(current_path, expected_manifest, table_name)
                _atomic_write(current_path, payload)
            finally:
                fcntl.flock(fh.fileno(), fcntl.LOCK_UN)


_STORES = {"posix": PosixCommitStore,
           "object-store": ObjectStoreCommitStore,
           "optimistic": ObjectStoreCommitStore}


def resolve_commit_store(spec) -> CommitStore:
    """Accepts an instance, a registered name, or None (then the
    PXT_SPARK_COMMIT_STORE env var, default 'posix')."""
    if isinstance(spec, CommitStore):
        return spec
    name = spec or os.environ.get("PXT_SPARK_COMMIT_STORE", "posix")
    try:
        return _STORES[name]()
    except KeyError:
        raise ValueError(
            f"unknown commit store {name!r}; expected one of "
            f"{sorted(_STORES)}") from None

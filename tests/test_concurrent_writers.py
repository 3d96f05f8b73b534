"""Concurrent-writer safety for the manifest store (reference
tests/test_concurrent.py: concurrent inserts/updates against one table;
the reference serializes conflicting writers on Postgres row locks —
here the per-table flock + rebase protocol in catalog.py _write_lock).

Covered:
  * N racing inserters through SEPARATE catalog handles (separate fds,
    so the flock path is genuinely exercised) — no lost versions, no
    lost rows, disjoint rowid ranges
  * racing update vs delete — serialized, final state consistent
  * a stale handle rebases on the latest committed state instead of
    last-write-wins overwriting another writer's commit
  * the lock dies with its holder (no wedged table after a crash)
  * true multiprocess inserters (own SparkSession per process)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading

import pytest

import pixeltable_spark as pxt
from pixeltable_spark.exprs import ColumnRef


SCHEMA = {"k": "int", "v": "float"}


def _mk_schema():
    return {"k": pxt.Int(False), "v": pxt.Float(True)}


def _mk(cat, name="t"):
    t = cat.create_table(name, _mk_schema(), primary_key=["k"])
    t.insert([{"k": i, "v": float(i)} for i in range(10)])
    return t


def test_racing_inserters_lose_nothing(spark, tmp_path):
    """8 threads x 3 single-row inserts, each thread through its OWN
    catalog handle (own Table object, own lock fd). Every insert must
    land: final count = 10 + 24, version = 1 + 24, rowids distinct."""
    wh = str(tmp_path / "wh")
    _mk(pxt.Catalog(spark, wh))
    n_threads, n_inserts = 8, 3
    errs: list = []

    def worker(tid: int):
        try:
            h = pxt.Catalog(spark, wh).get_table("t")
            for j in range(n_inserts):
                h.insert([{"k": 1000 + tid * 100 + j, "v": float(tid)}])
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errs, errs
    t = pxt.Catalog(spark, wh).get_table("t")
    total = n_threads * n_inserts
    assert t.count() == 10 + total
    assert t.version == 1 + total, "lost version (last-write-wins)"
    rowids = [r["_rowid"] for r in t.df().select("_rowid").collect()]
    assert len(set(rowids)) == len(rowids) == 10 + total
    # every version is time-travel readable and monotone in row count
    assert t.df(version=1).count() == 10
    assert t.df(version=1 + total // 2).count() == 10 + total // 2


def test_racing_update_and_delete(spark, tmp_path):
    """A concurrent update and delete on overlapping rows serialize:
    both commit (in either order), nothing is lost, and the final state
    is one of the two serial histories."""
    wh = str(tmp_path / "wh")
    t0 = _mk(pxt.Catalog(spark, wh))
    barrier = threading.Barrier(2)
    errs: list = []

    def do_update():
        try:
            h = pxt.Catalog(spark, wh).get_table("t")
            barrier.wait()
            h.update({"v": 99.0}, where=ColumnRef("k", h.schema["k"]) < 5)
        except Exception as e:  # noqa: BLE001
            errs.append(("update", e))

    def do_delete():
        try:
            h = pxt.Catalog(spark, wh).get_table("t")
            barrier.wait()
            h.delete(where=ColumnRef("k", h.schema["k"]) >= 7)
        except Exception as e:  # noqa: BLE001
            errs.append(("delete", e))

    ts = [threading.Thread(target=do_update), threading.Thread(target=do_delete)]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errs, errs
    t = pxt.Catalog(spark, wh).get_table("t")
    assert t.version == 3  # create-insert=1, then two serialized mutations
    rows = {r["k"]: r["v"] for r in t.collect()}
    assert set(rows) == set(range(7))           # 7,8,9 deleted
    assert all(rows[k] == 99.0 for k in range(5))
    assert all(rows[k] == float(k) for k in (5, 6))
    # both serial histories retained for time travel
    assert t.df(version=1).count() == 10


def test_stale_handle_rebases(spark, tmp_path):
    """Handle B opened before A's commit must rebase (reload version,
    next_rowid, CURRENT) instead of committing over A's snapshot."""
    wh = str(tmp_path / "wh")
    a = _mk(pxt.Catalog(spark, wh))
    b = pxt.Catalog(spark, wh).get_table("t")   # snapshot of v1 state
    a.insert([{"k": 100, "v": 1.0}])            # A commits v2
    assert b.version == 1                        # B is stale
    b.insert([{"k": 200, "v": 2.0}])            # B must rebase to v2 first
    assert b.version == 3
    fresh = pxt.Catalog(spark, wh).get_table("t")
    assert fresh.count() == 12                   # neither insert lost
    ks = {r["k"] for r in fresh.collect()}
    assert {100, 200} <= ks
    rowids = [r["_rowid"] for r in fresh.df().select("_rowid").collect()]
    assert len(set(rowids)) == 12                # disjoint rowid ranges


def test_lock_released_on_holder_death(spark, tmp_path):
    """flock releases when the holding process dies — a crashed writer
    cannot wedge the table."""
    wh = str(tmp_path / "wh")
    t = _mk(pxt.Catalog(spark, wh))
    lock_path = os.path.join(t.path, "LOCK")
    # subprocess grabs the lock, then dies hard (no clean release)
    code = (
        "import fcntl, os, sys\n"
        f"f = open({lock_path!r}, 'a+')\n"
        "fcntl.flock(f.fileno(), fcntl.LOCK_EX)\n"
        "print('locked', flush=True)\n"
        "os._exit(1)\n"
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=30)
    assert "locked" in p.stdout
    t.insert([{"k": 500, "v": 5.0}])  # must not time out
    assert t.count() == 11


def test_lock_timeout_raises_concurrency_error(spark, tmp_path, monkeypatch):
    """A held lock surfaces as ConcurrencyError after the timeout, not a
    hang or a silent last-write-wins."""
    import fcntl

    from pixeltable_spark.catalog import Table
    from pixeltable_spark.exceptions import ConcurrencyError

    wh = str(tmp_path / "wh")
    t = _mk(pxt.Catalog(spark, wh))
    monkeypatch.setattr(Table, "_LOCK_TIMEOUT_S", 0.5)
    holder = open(os.path.join(t.path, "LOCK"), "a+")
    # a SEPARATE process holds the lock (same-process fds under flock
    # share the lock once acquired; use a thread-held fd via subprocess)
    code = (
        "import fcntl, sys, time\n"
        f"f = open({os.path.join(t.path, 'LOCK')!r}, 'a+')\n"
        "fcntl.flock(f.fileno(), fcntl.LOCK_EX)\n"
        "print('locked', flush=True)\n"
        "time.sleep(10)\n"
    )
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, text=True)
    try:
        assert p.stdout.readline().strip() == "locked"
        with pytest.raises(ConcurrencyError, match="write lock"):
            t.insert([{"k": 600, "v": 6.0}])
    finally:
        p.kill()
        p.wait()
        holder.close()


def test_multiprocess_inserters(tmp_path):
    """The real thing: 2 OS processes, each with its own SparkSession,
    each inserting 3 batches into the same table. No lost rows, no lost
    versions, disjoint rowids."""
    wh = str(tmp_path / "wh")
    script = r"""
import sys
sys.path.insert(0, "/root/repo")
import pixeltable_spark as pxt
wh, wid, create = sys.argv[1], int(sys.argv[2]), sys.argv[3] == "1"
spark = pxt.get_session(app_name=f"ccw{wid}", shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
cat = pxt.Catalog(spark, wh)
if create:
    t = cat.create_table("t", {"k": pxt.Int(False), "v": pxt.Float(True)},
                         primary_key=["k"], if_exists="ignore")
else:
    import time
    for _ in range(300):
        try:
            t = cat.get_table("t")
            break
        except Exception:
            time.sleep(0.2)
for j in range(3):
    t.insert([{"k": wid * 1000 + j, "v": float(wid)}])
print("DONE", wid, flush=True)
"""
    env = dict(os.environ)
    procs = [subprocess.Popen(
        [sys.executable, "-c", script, wh, str(i), "1" if i == 0 else "0"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    meta = json.load(open(os.path.join(wh, "t", "meta.json")))
    assert meta["version"] == 6, meta         # 6 inserts -> 6 versions
    assert meta["next_rowid"] == 6            # 6 rows, disjoint ranges
    import duckdb
    cur = json.load(open(os.path.join(wh, "t", "CURRENT")))
    mf = json.load(open(os.path.join(wh, "t", cur["manifest"])))
    # replay the segment log independently of any engine handle
    # (v4 entries are {"p": path, ...} dicts; older ones bare strings)
    live: dict = {}
    for entry in mf["segments"]:
        srel = entry["p"] if isinstance(entry, dict) else entry
        seg = json.load(open(os.path.join(wh, "t", srel)))
        for r in seg.get("remove", ()):
            live.pop(r, None)
        live.update(seg.get("add", {}))
    files = [os.path.join(wh, "t", f) for f in sorted(live)]
    con = duckdb.connect()
    ks = sorted(r[0] for r in con.execute(
        "SELECT k FROM read_parquet(?)", [files]).fetchall())
    assert ks == [0, 1, 2, 1000, 1001, 1002]

"""Managed serving daemon — the reference's ``service`` proxy-daemon
lifecycle (reference service/proxy_daemon.py:48-268: port-lock file,
pid liveness probe, idempotent start, stop/status/reset) wrapped around
the stdlib TableServer (serving.py).

Contract (same as the reference):

* one daemon per warehouse, registered by a JSON *port lock*
  (``<warehouse>/_daemon/port.lock`` holding ``{"port", "pid",
  "host", "started_at"}``);
* ``status`` reads the lock and probes the pid — a lock whose process
  died is STALE and reads as "not running" (crash-safe: no unlock step
  is ever required);
* ``start`` is idempotent: a live daemon short-circuits to its
  endpoint; a stale lock is silently replaced;
* ``stop`` terminates by pid (SIGTERM, in-process shutdown when the
  daemon lives in this process) and removes the lock.

Spark-first note: the daemon hosts the Spark *driver*; requests fan out
to the cluster, so the HTTP head stays single-process per warehouse
exactly like the reference's per-db proxy daemon.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from typing import Any, Optional

from .exceptions import Error

_LOCK_NAME = "port.lock"


def daemon_home(warehouse: str) -> str:
    """The daemon's state directory under the warehouse (reference
    proxy_home: a per-db directory beside the data)."""
    return os.path.join(warehouse, "_daemon")


def _lock_path(warehouse: str) -> str:
    return os.path.join(daemon_home(warehouse), _LOCK_NAME)


def _pid_alive(pid: int) -> bool:
    """True if `pid` is a live process; a zombie (exited, unreaped)
    counts as dead (reference proxy_daemon.py _pid_alive — the POSIX
    arm; this engine targets Linux executors)."""
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by another user
    except OSError:
        return False
    try:
        with open(f"/proc/{pid}/stat", encoding="ascii") as f:
            state = f.read().rsplit(") ", 1)[1].split()[0]
    except (OSError, IndexError):
        return True  # no /proc: trust os.kill
    return state != "Z"


def read_port_lock(warehouse: str) -> Optional[dict]:
    """``{"port", "pid", "host", ...}`` for a LIVE daemon, else None
    (absent lock, stale lock, or a claim-in-progress placeholder that
    has no published port yet)."""
    info = _read_lock_raw(warehouse)
    if info is None or info.get("port") is None:
        return None
    return info if _pid_alive(int(info.get("pid", -1))) else None


def _read_lock_raw(warehouse: str) -> Optional[dict]:
    """The lock file's contents without liveness/placeholder filtering
    (None when absent or unparseable)."""
    try:
        with open(_lock_path(warehouse)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def endpoint(warehouse: str) -> Optional[str]:
    info = read_port_lock(warehouse)
    if info is None:
        return None
    return f"http://{info.get('host', '127.0.0.1')}:{info['port']}"


def _write_lock(warehouse: str, host: str, port: int) -> None:
    os.makedirs(daemon_home(warehouse), exist_ok=True)
    tmp = _lock_path(warehouse) + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"port": port, "pid": os.getpid(), "host": host,
                   "started_at": time.time()}, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, _lock_path(warehouse))


def _claim_lock(warehouse: str) -> bool:
    """Atomically claim the daemon slot for this process with
    ``os.open(O_CREAT|O_EXCL)`` — the fix for the check-then-write
    race where two concurrent starts both pass the liveness probe,
    both start servers, and the later rename orphans the first
    daemon. Writes a placeholder lock (our pid, no port yet; filtered
    out by read_port_lock) and returns True on ownership. A live
    daemon's lock returns False; a stale lock is cleared
    (pid-verified) and the claim retried."""
    os.makedirs(daemon_home(warehouse), exist_ok=True)
    path = _lock_path(warehouse)
    payload = json.dumps({"port": None, "pid": os.getpid(),
                          "host": None, "claimed_at": time.time()})
    for _ in range(16):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                         0o644)
        except FileExistsError:
            info = _read_lock_raw(warehouse)
            if info is None:
                # unreadable — either vanished between open and read
                # (retry) or garbage; never blind-delete, retry and let
                # the bounded loop surface persistent garbage
                time.sleep(0.01)
                continue
            pid = int(info.get("pid", -1))
            if _pid_alive(pid):
                return False  # live daemon or a racer mid-claim
            _remove_lock(warehouse, pid)  # stale: owner-verified clear
            continue
        try:
            os.write(fd, payload.encode())
            os.fsync(fd)
        finally:
            os.close(fd)
        return True
    return False


def _publish_lock(warehouse: str, host: str, port: int) -> bool:
    """Replace this process's claim placeholder with the real
    endpoint, then re-read to confirm ownership (a crashed-claim
    cleanup racing in between would mean we don't own the slot).
    Returns True when the published lock is ours."""
    _write_lock(warehouse, host, port)
    info = _read_lock_raw(warehouse)
    return bool(info) and int(info.get("pid", -1)) == os.getpid()


def _remove_lock(warehouse: str, pid: Optional[int] = None) -> None:
    """Remove the lock, but never another live daemon's (the stale-lock
    race: only the owner, or a caller that just verified staleness,
    may clear it)."""
    try:
        with open(_lock_path(warehouse)) as f:
            info = json.load(f)
        if pid is not None and int(info.get("pid", -1)) != pid:
            return
    except (OSError, ValueError):
        pass
    try:
        os.remove(_lock_path(warehouse))
    except OSError:
        pass


def start_daemon(catalog, host: str = "127.0.0.1", port: int = 0):
    """Start the serving daemon IN THIS PROCESS (background thread) and
    register it in the port lock. Idempotent: if a live daemon already
    serves this warehouse, returns None and leaves it alone (reference
    start contract). Returns the TableServer when this call started
    one."""
    wh = catalog.root
    if read_port_lock(wh) is not None:
        return None
    if not _claim_lock(wh):
        return None  # a racer claimed the slot first
    from .serving import TableServer
    try:
        srv = TableServer(catalog, host, port).start()
    except BaseException:
        _remove_lock(wh, os.getpid())
        raise
    if not _publish_lock(wh, srv.host, srv.port):
        srv.stop()
        return None
    return srv


def stop_daemon(warehouse: str, server=None,
                timeout_s: float = 10.0) -> bool:
    """Stop the daemon for `warehouse`. In-process servers shut down
    directly (pass `server`); external ones get SIGTERM and a bounded
    liveness wait. Returns True if a daemon was stopped, False if none
    was running. The lock is removed either way."""
    info = read_port_lock(warehouse)
    if server is not None:
        server.stop()
    if info is None:
        _remove_lock(warehouse)
        return server is not None
    pid = int(info["pid"])
    if pid == os.getpid():
        # in-process daemon without a handle: the caller owns the
        # server thread; just clear the registration
        _remove_lock(warehouse, pid)
        return True
    try:
        os.kill(pid, signal.SIGTERM)
    except OSError:
        _remove_lock(warehouse, pid)
        return False
    deadline = time.time() + timeout_s
    while time.time() < deadline and _pid_alive(pid):
        time.sleep(0.05)
    if _pid_alive(pid):
        raise Error(f"daemon pid {pid} did not exit within {timeout_s}s")
    _remove_lock(warehouse, pid)
    return True


def daemon_status(warehouse: str) -> dict:
    """``{"running": bool, "endpoint"?, "pid"?, "healthy"?}`` — the lock
    probe plus an HTTP /health round trip (reference health check)."""
    info = read_port_lock(warehouse)
    if info is None:
        return {"running": False}
    out: dict[str, Any] = {"running": True, "pid": info["pid"],
                           "endpoint": endpoint(warehouse)}
    try:
        import urllib.request
        with urllib.request.urlopen(out["endpoint"] + "/health",
                                    timeout=3) as r:
            out["healthy"] = json.loads(r.read()).get("status") == "ok"
    except Exception:  # noqa: BLE001 — health is best-effort advisory
        out["healthy"] = False
    return out


def spawn_daemon(warehouse: str, host: str = "127.0.0.1",
                 port: int = 8080, wait_s: float = 120.0) -> dict:
    """Launch a DETACHED daemon process (``python -m
    pixeltable_spark.cli serve --register-daemon``) for `warehouse` and
    wait until its port lock appears and /health answers. Idempotent
    like start_daemon. Returns the status dict. The child owns its own
    SparkSession (one driver per daemon — the reference's per-db
    proxy process model)."""
    st = daemon_status(warehouse)
    if st.get("running"):
        return st
    # clear a stale lock pid-verified only — never a slot a racer just
    # claimed (the child's --register-daemon claim handles the rest)
    stale = _read_lock_raw(warehouse)
    if stale is not None:
        pid = int(stale.get("pid", -1))
        if not _pid_alive(pid):
            _remove_lock(warehouse, pid if pid > 0 else None)
    cmd = [sys.executable, "-m", "pixeltable_spark.cli",
           "--home", warehouse, "serve", "--host", host,
           "--port", str(port), "--register-daemon"]
    log = os.path.join(daemon_home(warehouse), "daemon.log")
    os.makedirs(daemon_home(warehouse), exist_ok=True)
    with open(log, "ab") as lf:
        subprocess.Popen(cmd, stdout=lf, stderr=lf,
                         start_new_session=True)
    deadline = time.time() + wait_s
    while time.time() < deadline:
        st = daemon_status(warehouse)
        if st.get("running") and st.get("healthy"):
            return st
        time.sleep(0.25)
    raise Error(f"daemon did not become healthy within {wait_s}s "
                f"(see {log})")

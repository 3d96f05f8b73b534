"""HTTP client for the serving daemon — the reference's proxy client
(reference service/proxy_client.py:50 ProxyClient: client-side
transport that re-raises server errors as the identical engine
exceptions) over the stdlib, matched to this engine's JSON routes
(serving.py) instead of the reference's /rpc envelope.

Usage::

    from pixeltable_spark.client import Client
    c = Client.for_warehouse("/path/warehouse")   # via the port lock
    c.list_tables()
    c.rows("films", limit=5)
    c.insert("films", [{"name": "x", "revenue": 1.0}])
    c.query("films", where={"name": "x"}, select=["revenue"])

Errors come back with the server's HTTP status and are re-raised as the
matching engine exception class (NotFoundError for 404, Error
otherwise) — same contract as the reference client.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Any, Optional

from .exceptions import Error, NotFoundError


class Client:
    """Minimal JSON/HTTP client for a TableServer / managed daemon."""

    def __init__(self, endpoint: str, timeout_s: float = 120.0):
        self.endpoint = endpoint.rstrip("/")
        self.timeout_s = timeout_s

    @classmethod
    def for_warehouse(cls, warehouse: str,
                      timeout_s: float = 120.0) -> "Client":
        """Resolve the daemon endpoint through the warehouse port lock
        (daemon.py); raises if no live daemon serves it."""
        from . import daemon
        ep = daemon.endpoint(warehouse)
        if ep is None:
            raise Error(f"no live serving daemon for {warehouse!r} "
                        "(start one with `serve --daemon`)")
        return cls(ep, timeout_s)

    # -- transport -----------------------------------------------------
    def _call(self, method: str, path: str,
              body: Optional[dict] = None) -> dict:
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            self.endpoint + path, method=method, data=data,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            try:
                msg = json.loads(e.read()).get("error", str(e))
            except Exception:  # noqa: BLE001 — non-JSON error body
                msg = str(e)
            if e.code == 404:
                raise NotFoundError(msg) from None
            raise Error(msg) from None

    # -- API -----------------------------------------------------------
    def health(self) -> bool:
        return self._call("GET", "/health").get("status") == "ok"

    def list_tables(self) -> list:
        return self._call("GET", "/tables")["tables"]

    def get_metadata(self, table: str) -> dict:
        return self._call("GET", f"/tables/{table}")

    def history(self, table: str) -> list:
        return self._call("GET", f"/tables/{table}/history")["versions"]

    def rows(self, table: str, limit: int = 100,
             offset: int = 0) -> list:
        return self._call(
            "GET", f"/tables/{table}/rows?limit={limit}&offset={offset}"
        )["rows"]

    def insert(self, table: str, rows: list) -> dict:
        return self._call("POST", f"/tables/{table}/insert",
                          {"rows": rows})

    def query(self, table: str, where: Optional[dict] = None,
              select: Optional[list] = None, limit: int = 100) -> list:
        return self._call("POST", f"/tables/{table}/query",
                          {"where": where or {}, "select": select,
                           "limit": limit})["rows"]

    def deployed_routes(self) -> dict:
        """Bundle-server route index (deploy.py serve_bundle)."""
        return self._call("GET", "/deployed")

    def run_deployed(self, route: str,
                     limit: Optional[int] = None) -> list:
        body: dict[str, Any] = {}
        if limit is not None:
            body["limit"] = limit
        return self._call("POST", f"/deployed/{route}", body)["rows"]

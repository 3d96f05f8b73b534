"""Deploy bundles — the reference's ``serving/deploy.py`` capability
(reference deploy.py:24 build_deploy_bundle: package catalog metadata
for the relevant tables + deployment/service route config into one
artifact) re-expressed Spark-first:

* a bundle is ONE tarball holding ``bundle.json``: the deployment name,
  engine version, per-table metadata (schema, computed-column
  signatures, version pin, primary key), and the ROUTE table — each
  route is either a built-in table route (rows / insert / query) or a
  **serialized Query** (the round-9 ``Query.as_dict`` JSON, which
  rebinds by catalog table name at load);
* ``load_deploy_bundle`` validates the bundle against a live catalog
  (tables exist, schemas compatible, pinned versions readable) and
  returns the bound routes;
* ``serve_bundle`` starts a TableServer restricted to the bundle's
  tables and mounts each named-query route at
  ``POST /deployed/<route>`` (body = query parameters are not yet
  templated — the route executes its serialized plan verbatim).

The reference also ships conda/lockfile envs in its bundle; on Spark
the execution env is the cluster image, so the bundle carries an
``env`` stanza (spark version, required python packages) that
``load_deploy_bundle`` CHECKS rather than installs — same contract,
honest about who owns dependencies at 1000 executors.
"""

from __future__ import annotations

import json
import tarfile
import time
from typing import Any, Optional

from .exceptions import Error, NotFoundError

BUNDLE_FORMAT_VERSION = 1


def _table_md(t) -> dict:
    return {
        "schema": {c: ct.as_dict() for c, ct in t.schema.items()},
        "computed": {name: repr(cc.expr)
                     for name, cc in t.computed.items()},
        "primary_key": list(t.primary_key or []),
        "version": t.version,
    }


def build_deploy_bundle(catalog, name: str, out_path: str,
                        tables: Optional[list] = None,
                        routes: Optional[dict] = None,
                        pin_versions: bool = False) -> str:
    """Package `tables` (default: every table the routes touch, else all
    catalog tables) and `routes` into a deploy bundle tarball at
    `out_path`. `routes` maps route name -> a Query (serialized via
    as_dict) or a dict ``{"table": ..., "kind": "rows"|"insert"}`` for
    the built-in routes. `pin_versions=True` stamps each table's
    CURRENT version so the deployment serves a frozen snapshot."""
    route_specs: dict[str, Any] = {}
    table_names: set = set()
    for rname, spec in (routes or {}).items():
        if hasattr(spec, "as_dict"):           # a Query
            d = spec.as_dict()
            route_specs[rname] = {"kind": "query", "query": d}
            table_names.add(d["from"]["table"])
            table_names.update(j["tbl"]["table"] for j in d["joins"])
        elif isinstance(spec, dict) and "table" in spec:
            route_specs[rname] = {"kind": spec.get("kind", "rows"),
                                  "table": spec["table"]}
            table_names.add(spec["table"])
        else:
            raise ValueError(
                f"route {rname!r}: pass a Query or "
                "{'table': ..., 'kind': 'rows'|'insert'}")
    if tables is not None:
        table_names.update(tables)
    if not table_names:
        table_names = set(catalog.list_tables())
    md: dict[str, dict] = {}
    for tn in sorted(table_names):
        t = catalog.get_table(tn)              # raises NotFound early
        entry = _table_md(t)
        if not pin_versions:
            entry.pop("version")
        md[tn] = entry
    import pyspark

    bundle = {
        "format_version": BUNDLE_FORMAT_VERSION,
        "name": name,
        "created_at": time.time(),
        "env": {"spark": pyspark.__version__,
                "packages": ["pyspark", "pyarrow", "pandas", "numpy"]},
        "tables": md,
        "routes": route_specs,
    }
    with tarfile.open(out_path, "w:gz") as tf:
        data = json.dumps(bundle, indent=1).encode()
        info = tarfile.TarInfo("bundle.json")
        info.size = len(data)
        import io as _io
        tf.addfile(info, _io.BytesIO(data))
    return out_path


def load_deploy_bundle(catalog, path: str) -> dict:
    """Read + VALIDATE a bundle against `catalog`: every table exists,
    every bundled column resolves with the same type kind, pinned
    versions are readable. Returns the bundle dict with each query
    route rebound to an executable Query under ``"_bound"``."""
    with tarfile.open(path, "r:gz") as tf:
        member = tf.extractfile("bundle.json")
        if member is None:
            raise Error(f"{path}: no bundle.json inside")
        bundle = json.loads(member.read())
    ver = bundle.get("format_version", 0)
    if ver > BUNDLE_FORMAT_VERSION:
        raise Error(f"bundle format {ver} is newer than this engine "
                    f"understands ({BUNDLE_FORMAT_VERSION})")
    for tn, md in bundle.get("tables", {}).items():
        t = catalog.get_table(tn)              # NotFoundError if absent
        have = {c: ct.as_dict() for c, ct in t.schema.items()}
        for c, want in md.get("schema", {}).items():
            if c not in have and c not in t.computed:
                raise Error(f"bundle table {tn!r}: column {c!r} missing "
                            "from the live table")
            if c in have and have[c].get("kind") != want.get("kind"):
                raise Error(
                    f"bundle table {tn!r}: column {c!r} is "
                    f"{have[c].get('kind')} live but {want.get('kind')} "
                    "in the bundle")
        pin = md.get("version")
        if pin is not None:
            t._validate_version(pin)           # raises if unreadable
    from .plans.query import Query
    for rname, spec in bundle.get("routes", {}).items():
        if spec.get("kind") == "query":
            spec["_bound"] = Query.from_dict(spec["query"], catalog)
    return bundle


def serve_bundle(catalog, path: str, host: str = "127.0.0.1",
                 port: int = 0):
    """Start a TableServer extended with the bundle's named-query routes
    at ``POST /deployed/<route>`` (returns ``{"rows": [...]}``, limit
    capped by the optional body ``limit``). The built-in table routes
    keep working for the bundle's tables. Returns the server."""
    bundle = load_deploy_bundle(catalog, path)
    from .serving import TableServer

    class BundleServer(TableServer):
        def _route(self, method, parts, qs, body):
            if len(parts) == 2 and parts[0] == "deployed":
                spec = bundle["routes"].get(parts[1])
                if spec is None:
                    raise NotFoundError(f"no deployed route {parts[1]!r}")
                if spec.get("kind") == "query" and method == "POST":
                    q = spec["_bound"]
                    limit = body.get("limit")
                    if limit is not None:
                        q = q.limit(int(limit))
                    return 200, {"rows": q.collect()}
                if spec.get("kind") == "rows" and method == "GET":
                    return super()._route(
                        "GET", ["tables", spec["table"], "rows"], qs, body)
                if spec.get("kind") == "insert" and method == "POST":
                    return super()._route(
                        "POST", ["tables", spec["table"], "insert"],
                        qs, body)
            if parts == ["deployed"] and method == "GET":
                return 200, {"name": bundle["name"],
                             "routes": sorted(bundle["routes"])}
            return super()._route(method, parts, qs, body)

    return BundleServer(catalog, host, port).start()

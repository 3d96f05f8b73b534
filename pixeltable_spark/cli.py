"""Command-line interface: the analog of the reference's ``pixeltable_cli``
(reference pixeltable_cli/client/commands/ — ls, describe, schema, count,
rows, history, drop, drop-dir, mv, revert, status, serve), re-expressed
direct-mode: the reference CLI talks HTTP to a daemon wrapping a Postgres
catalog; here the engine IS the process (a SparkSession + manifest
catalog), so commands call the library directly and ``serve`` exposes the
same HTTP slice serving.py already implements.

Extra, Spark-first: ``query`` runs ad-hoc SQL with the warehouse's tables
(and any parquet directory) registered as temp views — the "just let me
SELECT" path a Spark engine can offer for free.

Usage::

    python -m pixeltable_spark.cli ls
    python -m pixeltable_spark.cli describe my_table
    python -m pixeltable_spark.cli rows my_table -n 5
    python -m pixeltable_spark.cli query "SELECT count(*) FROM docs" \
        --register docs=/data/documents.parquet
    python -m pixeltable_spark.cli serve --port 8080
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Optional


def _init(args: argparse.Namespace):
    from . import globals_api as g
    return g.init(home_dir=args.home)


def _table(args: argparse.Namespace):
    from . import globals_api as g
    g.init(home_dir=args.home)
    return g.get_table(args.table)


def _emit(obj: Any, as_json: bool) -> None:
    if as_json:
        print(json.dumps(obj, indent=2, default=str))
    elif isinstance(obj, list):
        for item in obj:
            print(item if not isinstance(item, dict)
                  else "  ".join(f"{k}={v}" for k, v in item.items()))
    else:
        print(obj)


def cmd_ls(args) -> int:
    from . import globals_api as g
    g.init(home_dir=args.home)
    _emit(g.ls(args.path), args.json)
    return 0


def cmd_describe(args) -> int:
    t = _table(args)
    print(t.describe())
    return 0


def cmd_schema(args) -> int:
    t = _table(args)
    md = t.get_metadata()  # TableMetadata TypedDict
    cols = {name: c["type_"] + (" (computed)" if c["is_computed"] else "")
            for name, c in md["columns"].items()}
    _emit(cols if args.json else [f"{k}: {v}" for k, v in cols.items()],
          args.json)
    return 0


def cmd_count(args) -> int:
    print(_table(args).count())
    return 0


def cmd_rows(args) -> int:
    t = _table(args)
    rows = t.head(args.n).collect()  # Query.collect() yields dicts
    _emit(rows, args.json)
    return 0


def cmd_history(args) -> int:
    t = _table(args)
    print(t.history_report(args.n))
    return 0


def cmd_drop(args) -> int:
    from . import globals_api as g
    g.init(home_dir=args.home)
    g.drop_table(args.table)
    print(f"dropped {args.table}")
    return 0


def cmd_drop_dir(args) -> int:
    from . import globals_api as g
    g.init(home_dir=args.home)
    g.drop_dir(args.path, force=args.force)
    print(f"dropped dir {args.path}")
    return 0


def cmd_mv(args) -> int:
    from . import globals_api as g
    g.init(home_dir=args.home)
    g.move(args.src, args.dst)
    print(f"moved {args.src} -> {args.dst}")
    return 0


def cmd_revert(args) -> int:
    t = _table(args)
    t.revert()
    print(f"reverted {args.table} to version {t.version}")
    return 0


def cmd_status(args) -> int:
    from . import get_session
    from . import globals_api as g
    cat = _init(args)
    spark = get_session()
    info = {
        "spark_version": spark.version,
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "warehouse": cat.root if hasattr(cat, "root") else args.home,
        "tables": g.list_tables(),
    }
    _emit(info if args.json else [f"{k}: {v}" for k, v in info.items()],
          args.json)
    return 0


def cmd_query(args) -> int:
    from . import get_session
    from . import globals_api as g
    from .sources.registry import table_from_parquet
    g.init(home_dir=args.home)
    spark = get_session()
    for spec in args.register or []:
        name, _, path = spec.partition("=")
        if not path:
            print(f"--register expects name=path, got {spec!r}",
                  file=sys.stderr)
            return 2
        table_from_parquet(spark, path, name).df() \
            .createOrReplaceTempView(name)
    for name in g.list_tables():
        try:
            g.get_table(name).df().createOrReplaceTempView(name)
        except Exception:  # noqa: BLE001 — views/snapshots may not resolve
            pass
    df = spark.sql(args.sql)
    rows = df.limit(args.n).collect()
    if args.json:
        print(json.dumps([r.asDict(recursive=True) for r in rows],
                         default=str))
    else:
        cols = df.columns
        print("\t".join(cols))
        for r in rows:
            print("\t".join(str(r[c]) for c in cols))
    return 0


def cmd_serve(args) -> int:
    if args.daemon:
        # managed-daemon mode (reference service/proxy_daemon.py
        # lifecycle): detach a child that registers the port lock,
        # wait for /health, print the endpoint, return
        from . import daemon as dmod
        wh = args.home or os.environ.get("PXT_SPARK_HOME") \
            or os.path.join(os.path.expanduser("~"), ".pixeltable_spark")
        st = dmod.spawn_daemon(wh, host=args.host, port=args.port)
        print(json.dumps(st) if args.json
              else f"daemon running: {st['endpoint']} (pid {st['pid']})")
        return 0
    from .serving import TableServer
    cat = _init(args)
    if args.register_daemon:
        # claim the slot BEFORE binding a server: registering while a
        # live daemon holds the lock would hijack its registration and
        # strand it (spawn_daemon guards this, but the flag is
        # callable directly); --force explicitly takes the slot over
        from . import daemon as dmod
        if getattr(args, "force", False):
            dmod._remove_lock(cat.root)
        if not dmod._claim_lock(cat.root):
            live = dmod.read_port_lock(cat.root) or {}
            print(f"a live daemon is already registered for {cat.root}"
                  f" (pid {live.get('pid')}, port {live.get('port')});"
                  " use serve-stop first or pass --force",
                  file=sys.stderr)
            return 2
    srv = TableServer(cat, host=args.host, port=args.port)
    if args.register_daemon:
        from . import daemon as dmod
        if not dmod._publish_lock(cat.root, srv.host, srv.port):
            print("lost the daemon slot while starting; exiting",
                  file=sys.stderr)
            srv.stop()
            return 2
        import atexit
        atexit.register(dmod._remove_lock, cat.root, os.getpid())
        import signal as _sig
        _sig.signal(_sig.SIGTERM, lambda *_: sys.exit(0))
    print(f"serving on {srv.host}:{srv.port} (ctrl-c to stop)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
    return 0


def cmd_deploy_build(args) -> int:
    from . import deploy
    cat = _init(args)
    routes = {}
    for spec in args.route or []:
        name, _, rest = spec.partition("=")
        table, _, kind = rest.partition(":")
        if not table:
            print(f"--route expects name=table[:rows|insert], got {spec!r}",
                  file=sys.stderr)
            return 2
        routes[name] = {"table": table, "kind": kind or "rows"}
    p = deploy.build_deploy_bundle(
        cat, args.name, args.out,
        tables=args.tables.split(",") if args.tables else None,
        routes=routes, pin_versions=args.pin_versions)
    print(p)
    return 0


def cmd_deploy_serve(args) -> int:
    from . import deploy
    cat = _init(args)
    srv = deploy.serve_bundle(cat, args.bundle,
                              host=args.host, port=args.port)
    print(f"serving bundle on {srv.host}:{srv.port} (ctrl-c to stop)")
    try:
        srv._httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
    return 0


def cmd_serve_status(args) -> int:
    from . import daemon as dmod
    wh = args.home or os.environ.get("PXT_SPARK_HOME") \
        or os.path.join(os.path.expanduser("~"), ".pixeltable_spark")
    st = dmod.daemon_status(wh)
    print(json.dumps(st))
    return 0 if st.get("running") else 1


def cmd_serve_stop(args) -> int:
    from . import daemon as dmod
    wh = args.home or os.environ.get("PXT_SPARK_HOME") \
        or os.path.join(os.path.expanduser("~"), ".pixeltable_spark")
    stopped = dmod.stop_daemon(wh)
    print("stopped" if stopped else "not running")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pixeltable-spark",
        description="Direct-mode CLI over the pixeltable_spark engine")
    p.add_argument("--home", default=None,
                   help="warehouse directory (default: engine home)")
    p.add_argument("--json", action="store_true",
                   help="machine-readable output")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("ls", help="list tables/dirs at a path")
    sp.add_argument("path", nargs="?", default="")
    sp.set_defaults(fn=cmd_ls)

    for name, fn, hlp in [("describe", cmd_describe, "table summary"),
                          ("schema", cmd_schema, "column name -> type"),
                          ("count", cmd_count, "row count")]:
        sp = sub.add_parser(name, help=hlp)
        sp.add_argument("table")
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("rows", help="first n rows (rowid order)")
    sp.add_argument("table")
    sp.add_argument("-n", type=int, default=10)
    sp.set_defaults(fn=cmd_rows)

    sp = sub.add_parser("history", help="version history report")
    sp.add_argument("table")
    sp.add_argument("-n", type=int, default=None)
    sp.set_defaults(fn=cmd_history)

    sp = sub.add_parser("drop", help="drop a table")
    sp.add_argument("table")
    sp.set_defaults(fn=cmd_drop)

    sp = sub.add_parser("drop-dir", help="drop a directory")
    sp.add_argument("path")
    sp.add_argument("--force", action="store_true")
    sp.set_defaults(fn=cmd_drop_dir)

    sp = sub.add_parser("mv", help="move/rename a table or dir")
    sp.add_argument("src")
    sp.add_argument("dst")
    sp.set_defaults(fn=cmd_mv)

    sp = sub.add_parser("revert", help="revert a table one version")
    sp.add_argument("table")
    sp.set_defaults(fn=cmd_revert)

    sp = sub.add_parser("status", help="engine + warehouse status")
    sp.set_defaults(fn=cmd_status)

    sp = sub.add_parser("query", help="ad-hoc SQL over warehouse tables")
    sp.add_argument("sql")
    sp.add_argument("-n", type=int, default=100,
                    help="max rows to print (the plan still runs "
                         "distributed; only the print is capped)")
    sp.add_argument("--register", action="append", metavar="NAME=PATH",
                    help="register a parquet file/dir as a view")
    sp.set_defaults(fn=cmd_query)

    sp = sub.add_parser("serve", help="HTTP serving layer (serving.py)")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8080)
    sp.add_argument("--daemon", action="store_true",
                    help="detach a managed daemon (port-lock + health "
                         "wait) and return")
    sp.add_argument("--register-daemon", action="store_true",
                    help="(internal) foreground serve that registers "
                         "the warehouse port lock")
    sp.add_argument("--force", action="store_true",
                    help="with --register-daemon: take the slot over "
                         "even if a live daemon is registered")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("deploy-build",
                        help="package tables + routes into a deploy "
                             "bundle (deploy.py)")
    sp.add_argument("name")
    sp.add_argument("out")
    sp.add_argument("--tables", default=None,
                    help="comma-separated table names (default: route "
                         "tables, else all)")
    sp.add_argument("--route", action="append", metavar="NAME=TABLE[:KIND]",
                    help="built-in route; KIND is rows (default) or insert")
    sp.add_argument("--pin-versions", action="store_true")
    sp.set_defaults(fn=cmd_deploy_build)

    sp = sub.add_parser("deploy-serve",
                        help="validate a bundle and serve its routes")
    sp.add_argument("bundle")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8080)
    sp.set_defaults(fn=cmd_deploy_serve)

    sp = sub.add_parser("serve-status",
                        help="managed-daemon status (port lock + health)")
    sp.set_defaults(fn=cmd_serve_status)

    sp = sub.add_parser("serve-stop", help="stop the managed daemon")
    sp.set_defaults(fn=cmd_serve_stop)

    return p


def main(argv: Optional[list] = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except Exception as e:  # noqa: BLE001 — CLI boundary: message, not trace
        print(f"error: {type(e).__name__}: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())

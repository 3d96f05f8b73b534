"""HTTP serving layer over catalog tables — the reference's ``serving``
package (reference serving/_fastapi.py: table routes for insert / query /
metadata; serving/deploy.py endpoint registration) re-expressed on the
stdlib so it runs with zero extra dependencies (same decision as the MCP
client in functions/query_template.py): a ``ThreadingHTTPServer`` whose
handlers call the same Catalog/Table methods the Python API uses.

Routes (JSON in/out):

    GET  /tables                         -> {"tables": [...]}
    GET  /tables/{name}                  -> TableMetadata
    GET  /tables/{name}/rows?limit=&offset= -> {"rows": [...]}
    POST /tables/{name}/insert   {"rows": [...]} -> UpdateStatus fields
    POST /tables/{name}/query    {"where": {col: value, ...},
                                  "select": [cols], "limit": n} -> rows
    GET  /health                         -> {"status": "ok"}

The query route's ``where`` is equality-only by design — the serving
tier is a lookup/ingest head, not a SQL gateway; analytical queries
belong in the engine API. Spark-first note: the driver hosting this
server is exactly the reference's single-node serving daemon; each
request runs a (small, limit-bounded) Spark job, so the pattern scales
with the cluster behind the driver rather than the HTTP head.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional
from urllib.parse import parse_qs, urlparse

from .catalog import Catalog
from .exceptions import Error, NotFoundError


def _json_default(v: Any):
    try:
        return v.isoformat()
    except AttributeError:
        return repr(v)


class TableServer:
    """Serve a Catalog over HTTP. ``serve_forever`` blocks; ``start``
    runs the loop in a daemon thread (tests, notebooks)."""

    def __init__(self, catalog: Catalog, host: str = "127.0.0.1",
                 port: int = 0):
        self.catalog = catalog
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt: str, *args: Any) -> None:
                pass  # quiet; the engine logs through Spark

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload, default=_json_default).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _reply_html(self, html: str) -> None:
                body = html.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _dispatch(self, method: str) -> None:
                try:
                    url = urlparse(self.path)
                    parts = [p for p in url.path.split("/") if p]
                    if method == "GET" and parts in ([], ["dashboard"]):
                        self._reply_html(_DASHBOARD_HTML)
                        return
                    qs = {k: v[0] for k, v in parse_qs(url.query).items()}
                    body = {}
                    if method == "POST":
                        n = int(self.headers.get("Content-Length", 0) or 0)
                        body = json.loads(self.rfile.read(n) or b"{}")
                    code, payload = outer._route(method, parts, qs, body)
                    self._reply(code, payload)
                except NotFoundError as e:
                    self._reply(404, {"error": str(e)})
                except Error as e:
                    self._reply(e.code.http_status, {"error": str(e)})
                except Exception as e:  # noqa: BLE001
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

            def do_GET(self) -> None:
                self._dispatch("GET")

            def do_POST(self) -> None:
                self._dispatch("POST")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    # -- routing -----------------------------------------------------------
    def _route(self, method: str, parts: list[str], qs: dict,
               body: dict) -> tuple[int, dict]:
        if parts == ["health"]:
            return 200, {"status": "ok"}
        if len(parts) == 3 and parts[0] == "tables" and \
                parts[2] == "history" and method == "GET":
            t = self.catalog.get_table(parts[1])
            return 200, {"versions": [dict(v) if not isinstance(v, dict)
                                      else v for v in t.get_versions()]}
        if parts == ["tables"] and method == "GET":
            return 200, {"tables": self.catalog.list_tables()}
        if len(parts) >= 2 and parts[0] == "tables":
            t = self.catalog.get_table(parts[1])
            rest = parts[2:]
            if not rest and method == "GET":
                return 200, dict(t.get_metadata())
            if rest == ["rows"] and method == "GET":
                limit = int(qs.get("limit", 100))
                offset = int(qs.get("offset", 0))
                ref = t.ref()
                rows = (ref.select(*[ref[c] for c in t.column_names()])
                        .limit(limit, offset).collect())
                return 200, {"rows": rows}
            if rest == ["insert"] and method == "POST":
                st = t.insert(body.get("rows", []))
                return 200, {"num_rows": int(st),
                             "op": getattr(st, "op", "insert"),
                             "num_excs": getattr(st, "num_excs", 0),
                             "new_version": t.version}
            if rest == ["query"] and method == "POST":
                ref = t.ref()
                cols = body.get("select") or t.column_names()
                q = ref.select(*[ref[c] for c in cols])
                for col, val in (body.get("where") or {}).items():
                    q = q.where(ref[col] == val)
                q = q.limit(int(body.get("limit", 100)))
                return 200, {"rows": q.collect()}
        raise NotFoundError(f"no route: {method} /{'/'.join(parts)}")

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "TableServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)


def serve(catalog: Optional[Catalog] = None, host: str = "127.0.0.1",
          port: int = 0) -> TableServer:
    """Start serving a catalog (default: the process-wide one) in a
    background thread; returns the server (``.port`` for ephemeral
    binds). Reference: serving/deploy.py's endpoint registration."""
    if catalog is None:
        from .globals_api import _cat
        catalog = _cat()
    return TableServer(catalog, host, port).start()

# Minimal single-file dashboard over the JSON API — the analog of the
# reference's dashboard/ web UI (table browser + row preview + history),
# stdlib-served, vanilla JS, no build step.
_DASHBOARD_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>pixeltable-spark</title>
<style>
 body{font-family:system-ui,sans-serif;margin:0;display:flex;height:100vh}
 #side{width:220px;border-right:1px solid #ddd;padding:12px;overflow:auto}
 #main{flex:1;padding:16px;overflow:auto}
 h1{font-size:16px;margin:0 0 12px}
 .tbl{cursor:pointer;padding:6px 8px;border-radius:6px}
 .tbl:hover{background:#f0f0f5}.tbl.sel{background:#e4e4f0;font-weight:600}
 table{border-collapse:collapse;margin-top:8px;font-size:13px}
 td,th{border:1px solid #ddd;padding:4px 8px;text-align:left}
 th{background:#fafafa}
 .meta{color:#666;font-size:13px;margin:4px 0}
 button{margin:8px 8px 8px 0}
</style></head><body>
<div id=side><h1>pixeltable-spark</h1><div id=tables>loading...</div></div>
<div id=main><div class=meta>select a table</div></div>
<script>
const J = (u,o)=>fetch(u,o).then(r=>r.json());
let cur=null;
function esc(x){const d=document.createElement('div');
  d.textContent=x==null?'':String(x);return d.innerHTML}
function renderRows(rows){if(!rows.length)return'<p>(no rows)</p>';
  const cols=Object.keys(rows[0]);
  return '<table><tr>'+cols.map(c=>'<th>'+esc(c)+'</th>').join('')+'</tr>'+
    rows.map(r=>'<tr>'+cols.map(c=>'<td>'+esc(r[c])+'</td>').join('')+
    '</tr>').join('')+'</table>'}
async function openTable(name){cur=name;
  document.querySelectorAll('.tbl').forEach(e=>
    e.classList.toggle('sel',e.textContent===name));
  const md=await J('/tables/'+name);
  const cols=Object.entries(md.columns||{}).map(([k,v])=>
    k+': '+(v.type_||v)).join(', ');
  document.getElementById('main').innerHTML=
    '<h1>'+esc(name)+'</h1>'+
    '<div class=meta>version '+esc(md.version)+' &middot; '+esc(md.kind)+
    '</div><div class=meta>'+esc(cols)+'</div>'+
    '<button onclick=loadRows()>rows</button>'+
    '<button onclick=loadHistory()>history</button>'+
    '<div id=content></div>';
  loadRows()}
async function loadRows(){const d=await J('/tables/'+cur+'/rows?limit=50');
  document.getElementById('content').innerHTML=renderRows(d.rows||[])}
async function loadHistory(){const d=await J('/tables/'+cur+'/history');
  document.getElementById('content').innerHTML=renderRows(d.versions||[])}
J('/tables').then(d=>{
  document.getElementById('tables').innerHTML=(d.tables||[]).map(t=>
    '<div class=tbl onclick=openTable(this.textContent)>'+esc(t)+
    '</div>').join('')||'(no tables)'})
</script></body></html>"""


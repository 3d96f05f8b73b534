"""@query templates and LLM tool-calling surface.

@query (reference func/query_template_function.py:16-45): a parameterized,
named retrieval function — the RAG building block. In pixeltable the
params become Variable exprs bound at call time; on Spark a template is
simply a Python function producing a DataFrame, plus a batched form for
per-row invocation inside pipelines (the correlated-query rewrite:
instead of running the template once per row, run it ONCE against the
distinct parameter set and broadcast-join the results back — the only
formulation that scales).

pxt.tools / invoke_tools (reference func/tools.py:27-88,
globals.py:1078,1118): wrap UDFs/templates as LLM tools and execute the
tool calls an LLM response selects. mcp_udfs (reference func/mcp.py:14-42)
is stubbed behind an import-try since no MCP client library ships here.
"""

from __future__ import annotations

import inspect
import json
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QueryTemplate:
    """A named, parameterized query returning a DataFrame."""

    def __init__(self, fn: Callable[..., Any]):
        self.fn = fn
        self.name = fn.__name__
        self.signature = inspect.signature(fn)

    def __call__(self, *args: Any, **kwargs: Any):
        return self.fn(*args, **kwargs)

    def batch_join(self, df: DataFrame, param_cols: dict[str, str],
                   result_prefix: str = "") -> DataFrame:
        """Per-row template application at scale: evaluate the template once
        per DISTINCT parameter combination, broadcast-join results back.
        The scalable rewrite of 'call a retrieval query for every row'."""
        param_names = list(param_cols)
        distinct = df.select(*[F.col(c).alias(p) for p, c in param_cols.items()]).distinct()
        pieces = []
        for row in distinct.collect():
            params = {p: row[p] for p in param_names}
            res = self.fn(**params)
            for p in param_names:
                res = res.withColumn(f"__param_{p}", F.lit(params[p]))
            pieces.append(res)
        if not pieces:
            raise ValueError("no parameter rows")
        union = pieces[0]
        for p in pieces[1:]:
            union = union.unionByName(p)
        if result_prefix:
            for c in union.columns:
                if not c.startswith("__param_"):
                    union = union.withColumnRenamed(c, result_prefix + c)
        cond = [df[c] == union[f"__param_{p}"] for p, c in param_cols.items()]
        joined = df.join(F.broadcast(union), on=cond, how="left")
        return joined.drop(*[f"__param_{p}" for p in param_names])


def query(fn: Callable) -> QueryTemplate:
    """@query decorator (reference func/query_template_function.py)."""
    return QueryTemplate(fn)


class Tool:
    """A UDF/template wrapped as an LLM tool (reference func/tools.py:27)."""

    def __init__(self, fn: Callable, name: Optional[str] = None,
                 description: Optional[str] = None):
        self.fn = fn
        self.name = name or getattr(fn, "name", None) or fn.__name__
        self.description = description or (fn.__doc__ or "").strip()
        target = fn.fn if isinstance(fn, QueryTemplate) else (
            getattr(fn, "py_fn", None) or fn)
        self.signature = inspect.signature(target)
        try:
            import typing
            self._hints = typing.get_type_hints(target)
        except Exception:  # noqa: BLE001 — unresolvable forward refs
            self._hints = {}

    def spec(self) -> dict:
        if getattr(self, "parameters_schema", None) is not None:
            # MCP tools carry the server-declared JSON schema verbatim
            return {"name": self.name, "description": self.description,
                    "parameters": self.parameters_schema}
        params = {}
        for pname, p in self.signature.parameters.items():
            if p.kind in (inspect.Parameter.VAR_KEYWORD,
                          inspect.Parameter.VAR_POSITIONAL):
                continue
            params[pname] = {"type": _json_type(self._hints.get(pname, p.annotation))}
        return {
            "name": self.name,
            "description": self.description,
            "parameters": {"type": "object", "properties": params,
                           "required": list(params)},
        }

    def invoke(self, **kwargs: Any) -> Any:
        from ..exprs import Function
        if isinstance(self.fn, Function):
            if self.fn.py_fn is None:
                raise ValueError(f"tool {self.name} has no python body")
            return self.fn.py_fn(**kwargs)
        return self.fn(**kwargs)


def _json_type(ann: Any) -> str:
    return {int: "integer", float: "number", bool: "boolean",
            str: "string"}.get(ann, "string")


class ToolChoice:
    """Provider-agnostic tool-choice directive (reference
    func/tools.py:81): exactly one of auto / required / a specific
    tool."""

    def __init__(self, auto: bool = False, required: bool = False,
                 tool: Optional[str] = None,
                 parallel_tool_calls: bool = True):
        self.auto = auto
        self.required = required
        self.tool = tool
        self.parallel_tool_calls = parallel_tool_calls

    def as_dict(self) -> dict:
        return {"auto": self.auto, "required": self.required,
                "tool": self.tool,
                "parallel_tool_calls": self.parallel_tool_calls}

    def __repr__(self) -> str:
        return f"ToolChoice({self.as_dict()})"


class Tools(list):
    """The reference's Tools container (func/tools.py:88) as a list
    subclass, so every existing list[Tool] consumer (invoke_tools, the
    provider modules) keeps working unchanged."""

    @property
    def tools(self) -> "list[Tool]":
        return list(self)

    def specs(self) -> list[dict]:
        """Provider-ready tool specs (the reference's ser_model)."""
        return [t.spec() for t in self]

    def choice(self, auto: bool = False, required: bool = False,
               tool=None, parallel_tool_calls: bool = True) -> ToolChoice:
        if sum([auto, required, tool is not None]) != 1:
            raise ValueError(
                "Exactly one of `auto`, `required`, or `tool` must be "
                "specified.")
        tool_name = None
        if tool is not None:
            for t in self:
                if t is tool or t.fn is tool or t.name == tool:
                    tool_name = t.name
                    break
            if tool_name is None:
                raise ValueError(f"unknown tool: {tool!r}")
        return ToolChoice(auto=auto, required=required, tool=tool_name,
                          parallel_tool_calls=parallel_tool_calls)


def tools(*fns: Callable) -> Tools:
    """pxt.tools(...) (reference globals.py:1078) — returns a Tools
    container (a list subclass with .choice()/.specs())."""
    return Tools(f if isinstance(f, Tool) else Tool(f) for f in fns)


def invoke_tools(tool_list: list[Tool], llm_response: "dict | str") -> list[dict]:
    """Execute the tool calls named in an LLM response
    (reference globals.py:1118 invoke_tools). Accepts an OpenAI-style
    response dict or a raw JSON string of tool_calls."""
    if isinstance(llm_response, str):
        llm_response = json.loads(llm_response)
    calls = llm_response.get("tool_calls", [])
    by_name = {t.name: t for t in tool_list}
    out = []
    for call in calls:
        name = call.get("name") or call.get("function", {}).get("name")
        raw_args = call.get("arguments") or call.get("function", {}).get("arguments", "{}")
        try:
            args = json.loads(raw_args) if isinstance(raw_args, str) else raw_args
        except json.JSONDecodeError as e:
            out.append({"name": name, "error": f"malformed arguments: {e}"})
            continue
        if name not in by_name:
            out.append({"name": name, "error": f"unknown tool {name!r}"})
            continue
        try:
            out.append({"name": name, "result": by_name[name].invoke(**args)})
        except Exception as e:  # noqa: BLE001
            out.append({"name": name, "error": f"{type(e).__name__}: {e}"})
    return out


class _McpClient:
    """Minimal MCP streamable-HTTP client (JSON-RPC 2.0 over POST) built on
    stdlib urllib — the public protocol the reference's `mcp` library
    speaks (reference func/mcp.py:14-42 uses streamablehttp_client).
    Handles both plain-JSON and SSE-framed responses and the
    Mcp-Session-Id handshake."""

    def __init__(self, url: str, timeout: float = 30.0):
        self.url = url
        self.timeout = timeout
        self.session_id: "str | None" = None
        self._next_id = 0

    def _post(self, payload: dict) -> "dict | None":
        import urllib.request

        headers = {
            "Content-Type": "application/json",
            "Accept": "application/json, text/event-stream",
        }
        if self.session_id:
            headers["Mcp-Session-Id"] = self.session_id
        req = urllib.request.Request(
            self.url, data=json.dumps(payload).encode(), headers=headers)
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            sid = resp.headers.get("Mcp-Session-Id")
            if sid:
                self.session_id = sid
            body = resp.read().decode()
            ctype = resp.headers.get("Content-Type", "")
        if not body:
            return None
        if "text/event-stream" in ctype:
            msg = self._parse_sse(body, payload.get("id"))
            if msg is None:
                return None
        else:
            msg = json.loads(body)
        if "error" in msg:
            raise RuntimeError(f"MCP error: {msg['error']}")
        return msg

    @staticmethod
    def _parse_sse(body: str, want_id: "int | str | None") -> "dict | None":
        """SSE framing per the spec: events are blank-line delimited,
        multi-line data: fields join with newline (one leading space after
        the colon stripped). The server may interleave other JSON-RPC
        messages (notifications, server requests) on the stream — the
        response is matched by JSON-RPC id, not stream position."""
        events: list[str] = []
        cur: list[str] = []
        for ln in body.splitlines():
            if ln == "":
                if cur:
                    events.append("\n".join(cur))
                    cur = []
                continue
            if ln.startswith("data:"):
                cur.append(ln[5:].removeprefix(" "))
        if cur:
            events.append("\n".join(cur))
        fallback: "dict | None" = None
        for ev in events:
            try:
                parsed = json.loads(ev)
            except (ValueError, TypeError):
                continue
            if not isinstance(parsed, dict):
                continue
            if want_id is not None and parsed.get("id") == want_id:
                return parsed
            if fallback is None or ("id" in parsed and "id" not in fallback):
                fallback = parsed
        return fallback

    def request(self, method: str, params: "dict | None" = None) -> dict:
        self._next_id += 1
        msg = self._post({"jsonrpc": "2.0", "id": self._next_id,
                          "method": method, "params": params or {}})
        return (msg or {}).get("result", {})

    def notify(self, method: str) -> None:
        self._post({"jsonrpc": "2.0", "method": method})

    def initialize(self) -> None:
        self.request("initialize", {
            "protocolVersion": "2025-03-26",
            "capabilities": {},
            "clientInfo": {"name": "pixeltable_spark", "version": "0.1"},
        })
        self.notify("notifications/initialized")


def mcp_udfs(server_url: str) -> list[Tool]:
    """Import an MCP server's tools as callable Tools
    (reference func/mcp.py:14-42 mcp_udfs): initialize the session, list
    tools, and wrap each as a Tool whose invoke() posts a `tools/call`
    JSON-RPC request. Built on the public streamable-HTTP protocol with
    stdlib urllib — no client library needed."""
    client = _McpClient(server_url)
    client.initialize()
    listed = client.request("tools/list").get("tools", [])
    out = []
    for spec in listed:
        name = spec["name"]
        schema = spec.get("inputSchema", {"type": "object", "properties": {}})

        def call(_name=name, **kwargs: Any):
            res = client.request("tools/call",
                                 {"name": _name, "arguments": kwargs})
            if res.get("isError"):
                raise RuntimeError(f"MCP tool {_name} failed: {res}")
            content = res.get("content", [])
            texts = [c.get("text") for c in content if c.get("type") == "text"]
            if len(texts) == 1:
                try:
                    return json.loads(texts[0])
                except (ValueError, TypeError):
                    return texts[0]
            return texts or res
        call.__name__ = name
        call.__doc__ = spec.get("description", "")
        t = Tool(call, name=name, description=spec.get("description", ""))
        t.parameters_schema = schema  # server-declared JSON schema
        out.append(t)
    return out

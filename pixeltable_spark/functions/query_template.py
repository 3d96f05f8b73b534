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
        params = {}
        for pname, p in self.signature.parameters.items():
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


def tools(*fns: Callable) -> list[Tool]:
    """pxt.tools(...) (reference globals.py:1078)."""
    return [f if isinstance(f, Tool) else Tool(f) for f in fns]


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


def mcp_udfs(server_url: str) -> list[Tool]:
    """Import MCP server tools as UDFs (reference func/mcp.py:14-42).
    Requires an MCP client library, not present in this container."""
    raise NotImplementedError(
        "MCP client not available in this environment; when installed, list "
        "the server's tools and wrap each as a Tool whose invoke() posts a "
        "tools/call request")

"""Scalar + aggregate function library.

The analog of the reference's ``functions/`` package (reference
pixeltable/functions/, 20,808 LoC). Every function is a registered
:class:`~pixeltable_spark.exprs.Function` with a Spark Column builder
(JVM-side, codegen'd — the equivalent of the reference's ``to_sql``
pushdown overloads, e.g. reference functions/globals.py:60,107,154,206,257)
and, where Spark lacks a native equivalent, a Python fallback that the
compiler wraps in an Arrow-batched pandas UDF.

Builtin aggregates sum/count/min/max/mean (reference
functions/globals.py:21,72,115,167,214) are window-capable: calling them
with group_by=/order_by= produces a running aggregate over
ROWS UNBOUNDED PRECEDING..CURRENT ROW (reference
exprs/function_call.py:239-253 — pixeltable's only window form).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import functions as F

from ..exprs import Expr, Function, FunctionCall
from ..type_system import ColumnType, TypeKind

# (TypeKind, method_name) -> callable(base_expr, *args, **kwargs) -> Expr
_METHOD_REGISTRY: dict[tuple[TypeKind, str], Callable] = {}


def register_method(kind: TypeKind, name: str, builder: Callable) -> None:
    _METHOD_REGISTRY[(kind, name)] = builder


def lookup_method(col_type: ColumnType, name: str) -> Optional[Callable]:
    return _METHOD_REGISTRY.get((col_type.kind, name))


# ---------------------------------------------------------------------------
# builtin aggregates (window-capable)
# ---------------------------------------------------------------------------

sum = Function("sum", ColumnType.float_(), spark_fn=F.sum, is_agg=True, allows_window=True)  # noqa: A001
count = Function("count", ColumnType.int_(), spark_fn=F.count, is_agg=True, allows_window=True)
min = Function("min", ColumnType.float_(), spark_fn=F.min, is_agg=True, allows_window=True)  # noqa: A001
max = Function("max", ColumnType.float_(), spark_fn=F.max, is_agg=True, allows_window=True)  # noqa: A001
mean = Function("mean", ColumnType.float_(), spark_fn=F.avg, is_agg=True, allows_window=True)

# Spark-native extras exposed first-class (SURVEY §2.4 "free in Spark")
count_distinct = Function("count_distinct", ColumnType.int_(), spark_fn=F.countDistinct, is_agg=True)
approx_count_distinct = Function(
    "approx_count_distinct", ColumnType.int_(), spark_fn=F.approx_count_distinct, is_agg=True
)
# Apache DataSketches HLL (Spark 3.5+ built-ins, JVM-side): the
# query-time fast path for approximate distincts — sketches are
# BINARY columns you can persist per shard/partition and re-union
# later (hll_union_agg), complementing the metadata-resident python
# sketches (ndv.py) that answer without any scan at all. NOTE: a
# different sketch implementation than ndv.py — estimates from the
# two layers agree within error bounds, not bit-for-bit.
hll_sketch_agg = Function("hll_sketch_agg", ColumnType.binary(),
                          spark_fn=F.hll_sketch_agg, is_agg=True)
hll_union_agg = Function("hll_union_agg", ColumnType.binary(),
                         spark_fn=F.hll_union_agg, is_agg=True)
hll_sketch_estimate = Function("hll_sketch_estimate", ColumnType.int_(),
                               spark_fn=F.hll_sketch_estimate)
hll_union = Function("hll_union", ColumnType.binary(),
                     spark_fn=F.hll_union)
stddev = Function("stddev", ColumnType.float_(), spark_fn=F.stddev, is_agg=True, allows_window=True)
variance = Function("variance", ColumnType.float_(), spark_fn=F.variance, is_agg=True, allows_window=True)

# collect values into a JSON list (reference functions/json.py make_list)
make_list = Function(
    "make_list", ColumnType.json(), spark_fn=lambda c: F.to_json(F.collect_list(c)),
    is_agg=True,
)

# window-only ranking/navigation functions (beyond-reference Spark extras;
# called with group_by=/order_by= like any window UDA)
row_number = Function("row_number", ColumnType.int_(),
                      spark_fn=lambda: F.row_number(), ranking=True)
rank = Function("rank", ColumnType.int_(), spark_fn=lambda: F.rank(), ranking=True)
dense_rank = Function("dense_rank", ColumnType.int_(),
                      spark_fn=lambda: F.dense_rank(), ranking=True)
lag = Function("lag", ColumnType.float_(),
               spark_fn=lambda c, offset=1: F.lag(c, offset), ranking=True)
lead = Function("lead", ColumnType.float_(),
                spark_fn=lambda c, offset=1: F.lead(c, offset), ranking=True)


# ---------------------------------------------------------------------------
# JSON-array higher-order sugar (reference functions/globals.py:267 map,
# :314 filter, :362 sort): build a JsonMapperExpr with R bound per element
# ---------------------------------------------------------------------------

def map(expr, fn):  # noqa: A001
    """Apply `fn` to each element of a JSON array (reference
    functions/globals.py:267): `map(t.data, lambda x: x * 2)`. Typed
    mappers compile to a JVM `transform()`; untyped ones run the Python
    element semantics."""
    from ..exprs import JsonMapperExpr, R, to_expr
    return JsonMapperExpr(to_expr(expr), to_expr(fn(R)), op="map")


def filter(expr, predicate):  # noqa: A001
    """Keep the elements of a JSON array where `predicate` holds
    (reference functions/globals.py:314). JVM `filter()` over the raw
    element text when the predicate compiles — elements keep their exact
    original JSON rendering."""
    from ..exprs import JsonMapperExpr, R, to_expr
    return JsonMapperExpr(to_expr(expr), to_expr(predicate(R)), op="filter")


def sort(expr, key=None, *, asc: bool = True):
    """Sort a JSON array, optionally by `key(x)` (reference
    functions/globals.py:362). A typed key compiles to a JVM
    `array_sort` comparator; identity/JSON keys use Python value
    ordering."""
    from ..exprs import JsonMapperExpr, R, to_expr
    k = to_expr(key(R)) if key is not None else R
    return JsonMapperExpr(to_expr(expr), k, op="sort", asc=asc)


def count_star() -> FunctionCall:
    return Function("count", ColumnType.int_(), spark_fn=lambda: F.count(F.lit(1)), is_agg=True)()


# submodules register their methods on import
from . import array, date, json, math, string, timestamp  # noqa: E402,F401
from . import audio, document, image, llm, video, vision  # noqa: E402,F401
# provider modules (reference functions/<provider>.py) — import-light:
# each gates its SDK behind a lazy ClientCache, so importing here is cheap
from . import anthropic, bedrock, bfl, deepseek, fabric, fal  # noqa: E402,F401
from . import fireworks, gemini, groq, huggingface, jina, llama_cpp  # noqa: E402,F401
from . import mistralai, nebius, ollama, openai, openrouter, replicate  # noqa: E402,F401
from . import reve, runwayml, together, twelvelabs, vllm, voyageai  # noqa: E402,F401
from . import whisper, whisperx, yolox  # noqa: E402,F401
from . import net, util  # noqa: E402,F401
from . import uuid as uuid_fns  # noqa: E402,F401
from . import uuid_net_util  # noqa: E402,F401
from .query_template import Tool, invoke_tools, mcp_udfs, query, tools  # noqa: E402,F401
from .udf import uda, udf  # noqa: E402,F401

__all__ = [
    "sum", "count", "min", "max", "mean", "count_distinct",
    "approx_count_distinct", "stddev", "variance", "make_list", "count_star",
    "hll_sketch_agg", "hll_union_agg", "hll_sketch_estimate", "hll_union",
    "row_number", "rank", "dense_rank", "lag", "lead",
    "string", "math", "timestamp", "date", "json", "array",
    "image", "video", "audio", "vision", "document", "llm", "util",
    "anthropic", "bedrock", "bfl", "deepseek", "fabric", "fal",
    "fireworks", "gemini", "groq", "huggingface", "jina", "llama_cpp",
    "mistralai", "nebius", "ollama", "openai", "openrouter", "replicate",
    "reve", "runwayml", "together", "twelvelabs", "vllm", "voyageai",
    "whisper", "whisperx", "yolox",
    "query", "tools", "invoke_tools", "mcp_udfs", "Tool",
    "udf", "uda", "register_method", "lookup_method",
]


def cast(expr: "Expr", target_type: ColumnType) -> "Expr":
    """Top-level cast (reference functions/globals.py:12) — sugar for
    Expr.astype; the reference exposes both spellings."""
    from ..exprs import to_expr
    return to_expr(expr).astype(target_type)

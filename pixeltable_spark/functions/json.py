"""JSON functions (reference functions/json.py, 17 fns) + the JsonMapper
map/filter/sort surface (reference exprs/json_mapper.py:20-60,
functions/globals.py:267,314,362).

JSON cells travel as strings; scalar access compiles to get_json_object
(JVM-side). List-valued transforms (map/filter/sort) parse to an array and
use Spark higher-order functions when the element shape allows, else the
Python fallback.
"""

from __future__ import annotations

import json as _json
from typing import Any, Callable

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exprs import Expr, Function, to_expr
from ..type_system import ColumnType, TypeKind
from . import register_method

_INT = ColumnType.int_()
_FLOAT = ColumnType.float_()
_BOOL = ColumnType.bool_()
_STR = ColumnType.string()
_JSON = ColumnType.json()


def _parse(v: Any) -> Any:
    if isinstance(v, str):
        try:
            return _json.loads(v)
        except (ValueError, TypeError):
            return v
    return v


def _fn(name, ret, spark_fn, py_fn):
    f = Function(name, ret, spark_fn=spark_fn, py_fn=py_fn)
    globals()[name] = f
    register_method(TypeKind.JSON, name, lambda base, *a, _f=f, **kw: _f(base, *a, **kw))
    return f


_fn("dumps", _STR, lambda j: j.cast(T.StringType()), lambda j: _json.dumps(_parse(j)))
_py_len = len  # _fn rebinds the module global "len" to a Function
_fn("len", _INT,
    lambda j: F.json_array_length(j.cast(T.StringType())).cast(T.LongType()),
    lambda j: _py_len(_parse(j)))
_fn("is_empty", _BOOL, None, lambda j: _py_len(_parse(j)) == 0)
_fn("contains", _BOOL, None, lambda j, v: v in _parse(j))
_fn("get", _JSON, None, lambda j, k, default=None: _parse(j).get(k, default))
_fn("keys", _JSON,
    lambda j: F.to_json(F.json_object_keys(j.cast(T.StringType()))),
    lambda j: list(_parse(j).keys()))
_fn("values", _JSON, None, lambda j: list(_parse(j).values()))
_fn("items", _JSON, None, lambda j: [list(kv) for kv in _parse(j).items()])
_fn("flatten", _JSON, None,
    lambda j: [x for sub in _parse(j) for x in (sub if isinstance(sub, list) else [sub])])
_fn("concat", _JSON, None, lambda a, b: _parse(a) + _parse(b))
_fn("merge", _JSON, None, lambda a, b: {**_parse(a), **_parse(b)})

# aggregates over json numbers (reference functions/json.py sum/min/max/mean/count):
# cast the extracted string to double, then native agg
json_sum = Function("json_sum", _FLOAT,
                    spark_fn=lambda j: F.sum(j.cast(T.DoubleType())), is_agg=True)
json_min = Function("json_min", _FLOAT,
                    spark_fn=lambda j: F.min(j.cast(T.DoubleType())), is_agg=True)
json_max = Function("json_max", _FLOAT,
                    spark_fn=lambda j: F.max(j.cast(T.DoubleType())), is_agg=True)
json_mean = Function("json_mean", _FLOAT,
                     spark_fn=lambda j: F.avg(j.cast(T.DoubleType())), is_agg=True)
json_count = Function("json_count", _INT,
                      spark_fn=lambda j: F.count(j), is_agg=True)


# --- JsonMapper surface: map / filter / sort over a JSON list --------------

def map(target: Expr, fn: Callable[[Any], Any]) -> Expr:  # noqa: A001
    """pxtf.map(t.c, lambda R: ...) — per-element map over a JSON list
    (reference functions/globals.py:267)."""
    f = Function("json_map", _JSON, py_fn=lambda j: [fn(x) for x in _parse(j)])
    return f(target)


def filter(target: Expr, pred: Callable[[Any], Any]) -> Expr:  # noqa: A001
    """(reference functions/globals.py:314)"""
    f = Function("json_filter", _JSON, py_fn=lambda j: [x for x in _parse(j) if pred(x)])
    return f(target)


def sort(target: Expr, key: Callable | None = None, reverse: bool = False) -> Expr:
    """(reference functions/globals.py:362)"""
    f = Function("json_sort", _JSON,
                 py_fn=lambda j: sorted(_parse(j), key=key, reverse=reverse))
    return f(target)


make_list = Function(
    "make_list", _JSON,
    spark_fn=lambda c: F.to_json(F.collect_list(c)), is_agg=True,
)

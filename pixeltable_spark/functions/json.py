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

# per-cell numeric reductions over a JSON array (reference
# functions/json.py sum:171/min:209/max:227/mean:245/count:263 — methods,
# not aggregates: t.detections.scores.sum()). Reference semantics: raise
# for a non-number array; empty array → 0 for sum, null for min/max/mean.


def _num_array(v: Any, fn_name: str) -> list:
    arr = _parse(v)
    if not isinstance(arr, list) or any(
            not isinstance(x, (int, float)) or isinstance(x, bool)
            for x in arr):
        raise ValueError(f"{fn_name}() is only defined for a JSON array of numbers")
    return arr


import builtins as _bi  # noqa: E402 — _fn rebinds sum/min/max below


def _cell_reduce(name, empty, reduce_fn):
    def py(j):
        nums = _num_array(j, name)
        return reduce_fn(nums) if _bi.len(nums) > 0 else empty

    _fn(name, _FLOAT, None, py)
    globals()[name].pandas_fn = lambda s: s.map(py)


_cell_reduce("sum", 0.0, lambda ns: float(_bi.sum(ns)))
_cell_reduce("min", None, lambda ns: float(_bi.min(ns)))
_cell_reduce("max", None, lambda ns: float(_bi.max(ns)))
_cell_reduce("mean", None, lambda ns: _bi.sum(ns) / _bi.len(ns))


def _count_py(j, value):
    arr = _parse(j)
    if not isinstance(arr, list):
        raise ValueError("count() is only defined for a JSON array")
    return _bi.sum(1 for x in arr if x == value)


_fn("count", _INT, None, _count_py)

# aggregates over json numbers (Spark extras — cast the extracted string
# to double, then native agg)
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


def list_iterator(df, elements: "str | None" = None,
                  fields: "dict | None" = None,
                  mode: str = "strict",
                  id_col: str = "doc_id", **lists: str):
    """Iterate over JSON list columns (reference functions/json.py:494
    list_iterator): either `elements=` names ONE column holding a list of
    dicts (output columns = `fields` keys — the analog of the reference's
    typed-Json requirement, since a Spark schema must be static), or
    keyword args name several list columns that are zipped per `mode`
    ('strict' raises on length mismatch, 'truncated' stops at the
    shortest, 'padded' fills None). Output: id_col, pos, value columns.
    """
    import itertools

    import pandas as pd
    from pyspark.sql import types as T2

    from ..type_system import ColumnType as _CT

    if (elements is None) == (_bi.len(lists) == 0):
        raise ValueError(
            "list_iterator(): exactly one of `elements` or keyword list "
            "columns must be given")
    if mode not in ("strict", "truncated", "padded"):
        raise ValueError(f"list_iterator(): unknown mode {mode!r}")
    if elements is not None:
        if not fields:
            raise ValueError(
                "list_iterator(elements=...) requires `fields` (the typed "
                "schema of the element dicts)")
        out_names = list(fields)
        out_types = [(t if isinstance(t, _CT) else _CT.json()).spark_type()
                     for t in fields.values()]
    else:
        out_names = list(lists)
        out_types = [T2.StringType()] * _bi.len(out_names)  # JSON strings

    id_type = df.schema[id_col].dataType
    out_schema = T2.StructType(
        [T2.StructField(id_col, id_type), T2.StructField("pos", T2.LongType())]
        + [T2.StructField(n, t) for n, t in zip(out_names, out_types)])

    def op(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if elements is not None:
                    arr = _parse(r[elements])
                    if not isinstance(arr, list):
                        raise ValueError(
                            "list_iterator(): elements column must hold a "
                            "JSON list")
                    for pos, el in enumerate(arr):
                        row = {id_col: r[id_col], "pos": pos}
                        for n in out_names:
                            row[n] = el.get(n) if isinstance(el, dict) else None
                        rows.append(row)
                else:
                    cols = {n: _parse(r[c]) for n, c in lists.items()}
                    vals = list(cols.values())
                    if mode == "strict":
                        lens = {_bi.len(v) for v in vals}
                        if _bi.len(lens) > 1:
                            raise ValueError(
                                "list_iterator(): input lists have "
                                f"different lengths {sorted(lens)} in "
                                "strict mode")
                        zipped = zip(*vals)
                    elif mode == "truncated":
                        zipped = zip(*vals)
                    else:
                        zipped = itertools.zip_longest(*vals, fillvalue=None)
                    for pos, el in enumerate(zipped):
                        row = {id_col: r[id_col], "pos": pos}
                        for n, v in zip(cols, el):
                            row[n] = (v if v is None or isinstance(v, str)
                                      else _json.dumps(v))
                        rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col, "pos"] + out_names)

    return df.mapInPandas(op, out_schema)

"""Array functions (reference functions/array.py:16) + embedding math.

Vector ops (dot/cosine) compile to Spark higher-order functions
(F.zip_with + F.aggregate) — fully JVM-side, no Python in the hot path.
These power similarity search over array<float> embedding columns
(SURVEY §2.6 top-k similarity; the scale path for 100 TB ANN).
"""

from __future__ import annotations

import math as _m

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exprs import Function
from ..type_system import ColumnType, TypeKind
from . import register_method

_FLOAT = ColumnType.float_()
_INT = ColumnType.int_()
_JSON = ColumnType.json()


def _fn(name, ret, spark_fn, py_fn):
    f = Function(name, ret, spark_fn=spark_fn, py_fn=py_fn)
    globals()[name] = f
    register_method(TypeKind.ARRAY, name, lambda base, *a, _f=f, **kw: _f(base, *a, **kw))
    return f


_fn("to_list", _JSON, lambda a: a, lambda a: list(a))
_fn("length", _INT, lambda a: F.size(a).cast(T.LongType()), lambda a: len(a))


def dot_col(a: Column, b: Column) -> Column:
    """sum(a[i]*b[i]) via zip_with + aggregate — codegen'd, no shuffle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm (the
    angle is undefined — and Spark 4's ANSI mode would otherwise kill
    the job with a divide-by-zero on the first zero embedding)."""
    denom = norm_col(a) * norm_col(b)
    return F.when(denom > 0, dot_col(a, b) / denom)


def _py_cosine(a, b):
    denom = (_m.sqrt(sum(x * x for x in a))
             * _m.sqrt(sum(y * y for y in b)))
    if denom == 0:
        return None
    return sum(x * y for x, y in zip(a, b)) / denom


dot = Function("dot", _FLOAT, spark_fn=dot_col,
               py_fn=lambda a, b: sum(x * y for x, y in zip(a, b)))
norm = Function("norm", _FLOAT, spark_fn=norm_col,
                py_fn=lambda a: _m.sqrt(sum(x * x for x in a)))
cosine_similarity = Function(
    "cosine_similarity", _FLOAT, spark_fn=cosine_col, py_fn=_py_cosine)
register_method(TypeKind.ARRAY, "similarity",
                lambda base, other: cosine_similarity(base, other))

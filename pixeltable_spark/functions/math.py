"""Math functions (reference functions/math.py, 14 fns) — all native Spark."""

from __future__ import annotations

import math as _m

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exprs import Function
from ..type_system import ColumnType, TypeKind
from . import register_method

_INT = ColumnType.int_()
_FLOAT = ColumnType.float_()


def _fn(name, ret, spark_fn, py_fn):
    f = Function(name, ret, spark_fn=spark_fn, py_fn=py_fn)
    globals()[name] = f
    for kind in (TypeKind.INT, TypeKind.FLOAT):
        register_method(kind, name, lambda base, *a, _f=f, **kw: _f(base, *a, **kw))
    return f


# _fn rebinds module globals (abs/round/pow/...) to Function objects, so
# py_fn lambdas must use the captured builtins, not the bare names
_py_abs, _py_round, _py_pow = abs, round, pow

_fn("abs", _FLOAT, lambda x: F.abs(x), lambda x: _py_abs(x))
_fn("ceil", _INT, lambda x: F.ceil(x).cast(T.LongType()), lambda x: _m.ceil(x))
_fn("floor", _INT, lambda x: F.floor(x).cast(T.LongType()), lambda x: _m.floor(x))
# Python round() is banker's rounding; Spark's bround matches it.
# digits is a plain-Python kwarg (it selects the codegen'd expression, it's
# not data): pxtf.math.round(x, digits=2)
_fn("round", _FLOAT,
    lambda x, digits=0: F.bround(x, digits),
    lambda x, digits=0: _py_round(x, digits))
_fn("pow", _FLOAT, lambda x, y: F.pow(x, y), lambda x, y: x ** y)
_fn("sqrt", _FLOAT, lambda x: F.sqrt(x), lambda x: _m.sqrt(x))
_fn("exp", _FLOAT, lambda x: F.exp(x), lambda x: _m.exp(x))
_fn("log", _FLOAT,
    lambda x, base=None: F.log(x) if base is None else F.log(x) / F.lit(_m.log(base)),
    lambda x, base=None: _m.log(x) if base is None else _m.log(x, base))
_fn("log10", _FLOAT, lambda x: F.log10(x), lambda x: _m.log10(x))
_fn("bitwise_and", _INT, lambda x, y: x.bitwiseAND(y), lambda x, y: x & y)
_fn("bitwise_or", _INT, lambda x, y: x.bitwiseOR(y), lambda x, y: x | y)
_fn("bitwise_xor", _INT, lambda x, y: x.bitwiseXOR(y), lambda x, y: x ^ y)
_fn("to_int", _INT, lambda x: x.cast(T.LongType()), lambda x: int(x))
_fn("to_float", _FLOAT, lambda x: x.cast(T.DoubleType()), lambda x: float(x))

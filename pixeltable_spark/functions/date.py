"""Date functions (reference functions/date.py, 12 fns)."""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exprs import Function
from ..type_system import ColumnType, TypeKind
from . import register_method

_INT = ColumnType.int_()
_STR = ColumnType.string()
_DATE = ColumnType.date()
_JSON = ColumnType.json()


def _fn(name, ret, spark_fn, py_fn):
    f = Function(name, ret, spark_fn=spark_fn, py_fn=py_fn)
    globals()[name] = f
    register_method(TypeKind.DATE, name, lambda base, *a, _f=f, **kw: _f(base, *a, **kw))
    return f


_fn("year", _INT, lambda d: F.year(d).cast(T.LongType()), lambda d: d.year)
_fn("month", _INT, lambda d: F.month(d).cast(T.LongType()), lambda d: d.month)
_fn("day", _INT, lambda d: F.dayofmonth(d).cast(T.LongType()), lambda d: d.day)
_fn("weekday", _INT,
    lambda d: ((F.dayofweek(d) + 5) % 7).cast(T.LongType()), lambda d: d.weekday())
_fn("isoweekday", _INT,
    lambda d: ((F.dayofweek(d) + 5) % 7 + 1).cast(T.LongType()), lambda d: d.isoweekday())
_fn("isocalendar", _JSON,
    lambda d: F.to_json(F.struct(
        F.year(d).alias("year"), F.weekofyear(d).alias("week"),
        ((F.dayofweek(d) + 5) % 7 + 1).alias("weekday"))),
    lambda d: {"year": d.isocalendar()[0], "week": d.isocalendar()[1],
               "weekday": d.isocalendar()[2]})
_fn("isoformat", _STR, lambda d: F.date_format(d, "yyyy-MM-dd"), lambda d: d.isoformat())
_fn("strftime", _STR, None, lambda d, fmt: d.strftime(fmt))
_fn("toordinal", _INT,
    lambda d: F.datediff(d, F.lit("0001-01-01")).cast(T.LongType()) + 1,
    lambda d: d.toordinal())
_fn("add_days", _DATE,
    lambda d, n: F.date_add(d, n.cast(T.IntegerType())),
    lambda d, n: d + _dt.timedelta(days=n))
_fn("replace", _DATE, None, lambda d, **kw: d.replace(**kw))

make_date = Function(
    "make_date", _DATE,
    spark_fn=lambda y, m, d: F.make_date(y, m, d),
    py_fn=lambda y, m, d: _dt.date(y, m, d),
)

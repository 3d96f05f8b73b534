"""Timestamp functions (reference functions/timestamp.py, 19 fns).

Python-datetime-method semantics over Spark TimestampType. Sessions pin
spark.sql.session.timeZone=UTC so extraction matches the reference's
stored-as-UTC convention (reference type_system.py:928).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exprs import Function
from ..type_system import ColumnType, TypeKind
from . import register_method

_INT = ColumnType.int_()
_FLOAT = ColumnType.float_()
_STR = ColumnType.string()
_TS = ColumnType.timestamp()
_DATE = ColumnType.date()
_JSON = ColumnType.json()


def _fn(name, ret, spark_fn, py_fn, kind=TypeKind.TIMESTAMP):
    f = Function(name, ret, spark_fn=spark_fn, py_fn=py_fn)
    globals()[name] = f
    register_method(kind, name, lambda base, *a, _f=f, **kw: _f(base, *a, **kw))
    return f


_fn("year", _INT, lambda t: F.year(t).cast(T.LongType()), lambda t: t.year)
_fn("month", _INT, lambda t: F.month(t).cast(T.LongType()), lambda t: t.month)
_fn("day", _INT, lambda t: F.dayofmonth(t).cast(T.LongType()), lambda t: t.day)
_fn("hour", _INT, lambda t: F.hour(t).cast(T.LongType()), lambda t: t.hour)
_fn("minute", _INT, lambda t: F.minute(t).cast(T.LongType()), lambda t: t.minute)
_fn("second", _INT, lambda t: F.second(t).cast(T.LongType()), lambda t: t.second)
_fn("microsecond", _INT,
    lambda t: (F.unix_micros(t) % 1_000_000).cast(T.LongType()),
    lambda t: t.microsecond)
_fn("date", _DATE, lambda t: F.to_date(t), lambda t: t.date())
# Python weekday(): Mon=0..Sun=6; Spark dayofweek: Sun=1..Sat=7
_fn("weekday", _INT,
    lambda t: ((F.dayofweek(t) + 5) % 7).cast(T.LongType()),
    lambda t: t.weekday())
_fn("isoweekday", _INT,
    lambda t: ((F.dayofweek(t) + 5) % 7 + 1).cast(T.LongType()),
    lambda t: t.isoweekday())
_fn("isocalendar", _JSON,
    lambda t: F.to_json(F.struct(
        F.year(t).alias("year"), F.weekofyear(t).alias("week"),
        ((F.dayofweek(t) + 5) % 7 + 1).alias("weekday"))),
    lambda t: {"year": t.isocalendar()[0], "week": t.isocalendar()[1],
               "weekday": t.isocalendar()[2]})
_fn("isoformat", _STR,
    lambda t, sep="T", timespec="auto": F.date_format(t, f"yyyy-MM-dd'{sep}'HH:mm:ss"),
    lambda t, sep="T", timespec="auto": t.isoformat(sep=sep, timespec=timespec))
_fn("strftime", _STR, None, lambda t, fmt: t.strftime(fmt))
_fn("replace", _TS, None,
    lambda t, **kw: t.replace(**kw))
_fn("astimezone", _TS, None, lambda t, tz: t.astimezone(__import__("zoneinfo").ZoneInfo(tz)))
_fn("strip_timezone", _TS, None, lambda t: t.replace(tzinfo=None))
_fn("toordinal", _INT,
    lambda t: F.datediff(F.to_date(t), F.lit("0001-01-01")).cast(T.LongType()) + 1,
    lambda t: t.toordinal())
_fn("posix_timestamp", _FLOAT,
    lambda t: F.unix_micros(t) / 1_000_000.0,
    lambda t: t.timestamp())
_fn("epoch_micros", _INT,
    lambda t: F.unix_micros(t),
    lambda t: int(t.timestamp() * 1_000_000))

make_timestamp = Function(
    "make_timestamp", _TS,
    spark_fn=lambda y, mo, d, h=None, mi=None, s=None: F.make_timestamp(
        y, mo, d,
        h if h is not None else F.lit(0),
        mi if mi is not None else F.lit(0),
        s if s is not None else F.lit(0)),
    py_fn=lambda y, mo, d, h=0, mi=0, s=0: _dt.datetime(y, mo, d, h, mi, s),
)

date_trunc = Function(
    "date_trunc", _TS,
    spark_fn=lambda t, unit="day": F.date_trunc(unit, t),
    py_fn=None,
)
register_method(TypeKind.TIMESTAMP, "date_trunc",
                lambda base, unit: date_trunc(base, unit=unit))


def _mk_ts_spark(y, mo, d, h=None, mi=None, s=None, us=None):
    from pyspark.sql import Column as _Col

    def c(x, default=0):
        if x is None:
            return F.lit(default)
        return x if isinstance(x, _Col) else F.lit(x)
    secs = c(s).cast(T.DoubleType()) + c(us).cast(T.DoubleType()) / 1e6
    return F.make_timestamp(c(y), c(mo), c(d), c(h), c(mi), secs)


make_timestamp = Function(
    "make_timestamp", _TS,
    spark_fn=_mk_ts_spark,
    py_fn=lambda y, mo, d, h=0, mi=0, s=0, us=0: _dt.datetime(
        y, mo, d, h, mi, s, us),
)

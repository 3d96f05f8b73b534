"""Small driver-side row lists as pure-JVM literal DataFrames.

`spark.createDataFrame(list)` parallelizes any local list into
defaultParallelism pickled-row partitions; every downstream stage that
touches the frame then schedules a 32-Python-task stage for a handful of
rows (measured 0.3-0.5 s per stage), and coalescing that RDD to one
partition is WORSE — the single task pays the worker round-trips
serially (measured 5-7 s for 32 partitions). For small all-scalar rows
we build a literal ``inline(array(struct(...)))`` plan instead: a
LocalRelation-style JVM scan, one partition, zero Python tasks.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

_ATOMIC = (T.NullType, T.BooleanType, T.ByteType, T.ShortType,
           T.IntegerType, T.LongType, T.FloatType, T.DoubleType,
           T.StringType, T.DateType, T.TimestampType,
           T.TimestampNTZType, T.BinaryType)


def local_df(spark, data, schema, literal_threshold: int = 256):
    """DataFrame from a small driver-side row list WITHOUT the Python
    boundary when possible (small + all-atomic schema); falls back to
    the stock ``createDataFrame`` otherwise. Rows may be dicts, Rows,
    or positional tuples."""
    if isinstance(schema, str):
        try:
            schema = T._parse_datatype_string(schema)
        except Exception:  # noqa: BLE001 — let createDataFrame handle it
            pass
    fields = getattr(schema, "fields", None)
    try:
        n = len(data)
    except TypeError:
        n = None
    if (fields is not None and n is not None
            and 0 < n <= literal_threshold
            and n * len(fields) <= 2048
            and all(isinstance(f.dataType, _ATOMIC) for f in fields)):
        def cell(row, i, f):
            if isinstance(row, dict):
                return row.get(f.name)
            try:
                return row[f.name]  # Row
            except (TypeError, KeyError, ValueError, IndexError):
                return row[i]       # positional tuple
        try:
            structs = [
                F.struct(*[F.lit(cell(r, i, f)).cast(f.dataType)
                           .alias(f.name)
                           for i, f in enumerate(fields)])
                for r in data]
            return (spark.range(0, 1, 1, 1)   # exactly ONE partition
                    .select(F.inline(F.array(*structs))))
        except Exception:  # noqa: BLE001 — fall back to the stock path
            pass
    return spark.createDataFrame(data, schema)

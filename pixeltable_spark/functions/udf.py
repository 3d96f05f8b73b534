"""@udf / @uda decorators — the user extension surface.

The analog of reference func/udf.py:29-250 (@pxt.udf: typed scalar UDF from
signature hints, optional batching) and func/aggregate_function.py:18-328
(@pxt.uda: Aggregator class with init/update/value, window-capable).

Spark mapping: scalar UDFs become Arrow-batched pandas UDFs (never
row-at-a-time over the wire); UDAs run via applyInPandas — grouped form
produces one row per group, window form produces a running value per row
within each partition (reference exprs/function_call.py:447-461 semantics:
ROWS UNBOUNDED PRECEDING..CURRENT ROW).
"""

from __future__ import annotations

import datetime
import inspect
import typing
from typing import Any, Callable, Optional

from ..exprs import Function
from ..type_system import ArrayType, ColumnType


_HINT_MAP = {
    str: ColumnType.string,
    int: ColumnType.int_,
    float: ColumnType.float_,
    bool: ColumnType.bool_,
    bytes: ColumnType.binary,
    datetime.datetime: ColumnType.timestamp,
    datetime.date: ColumnType.date,
    dict: ColumnType.json,
    list: ColumnType.json,
}


def _hint_to_type(hint: Any) -> ColumnType:
    if hint is None or hint is inspect.Parameter.empty:
        return ColumnType.json()
    origin = typing.get_origin(hint)
    if origin is typing.Union:
        args = [a for a in typing.get_args(hint) if a is not type(None)]
        t = _hint_to_type(args[0]) if args else ColumnType.json()
        t.nullable = True
        return t
    if origin in (list, tuple):
        args = typing.get_args(hint)
        if args and args[0] in (int, float):
            return ArrayType(_hint_to_type(args[0]))
        return ColumnType.json()
    if hint in _HINT_MAP:
        return _HINT_MAP[hint]()
    return ColumnType.json()


def async_udf(fn: Optional[Callable] = None, *,
              return_type: Optional[ColumnType] = None,
              requests_per_minute: float = 600.0,
              concurrency: int = 16):
    """@async_udf — an async scalar UDF (provider inference call) executed
    by the batched async runtime: each Arrow batch runs on one event loop
    per worker with a shared token-bucket rate limiter and bounded
    in-flight requests (reference func/udf.py async support +
    exec/expr_eval/schedulers.py resource pools)."""

    def wrap(f: Callable) -> Function:
        hints = typing.get_type_hints(f) if f.__annotations__ else {}
        ret = return_type or _hint_to_type(hints.get("return"))
        func = Function(f.__name__, ret, spark_fn=None, py_fn=None)
        func.async_fn = f  # type: ignore[attr-defined]
        func.is_async = True  # type: ignore[attr-defined]
        func.requests_per_minute = requests_per_minute  # type: ignore[attr-defined]
        func.concurrency = concurrency  # type: ignore[attr-defined]
        return func

    return wrap(fn) if fn is not None else wrap


def udf(fn: Optional[Callable] = None, *, batch_size: Optional[int] = None,
        return_type: Optional[ColumnType] = None):
    """@udf — typed scalar UDF from signature hints
    (reference func/udf.py:29). The compiler wraps it in an Arrow-batched
    pandas UDF over exactly the referenced columns."""

    def wrap(f: Callable) -> Function:
        hints = typing.get_type_hints(f) if f.__annotations__ else {}
        ret = return_type or _hint_to_type(hints.get("return"))
        func = Function(f.__name__, ret, spark_fn=None, py_fn=f)
        func.batch_size = batch_size  # type: ignore[attr-defined]
        return func

    return wrap(fn) if fn is not None else wrap


class Aggregator:
    """Base class for @uda aggregators
    (reference func/aggregate_function.py:276-328)."""

    def update(self, *args: Any) -> None:
        raise NotImplementedError

    def value(self) -> Any:
        raise NotImplementedError


def uda(cls: Optional[type] = None, *, return_type: Optional[ColumnType] = None,
        allows_window: bool = True, requires_order_by: bool = False):
    """@uda — custom aggregate from an init/update/value class
    (reference func/aggregate_function.py:18-59)."""

    def wrap(c: type) -> Function:
        hints = typing.get_type_hints(c.value) if getattr(c.value, "__annotations__", None) else {}
        ret = return_type or _hint_to_type(hints.get("return"))
        func = Function(c.__name__, ret, spark_fn=None, py_fn=None,
                        is_agg=True, allows_window=allows_window)
        func.uda_class = c  # type: ignore[attr-defined]
        func.requires_order_by = requires_order_by  # type: ignore[attr-defined]
        return func

    return wrap(cls) if cls is not None else wrap


class IteratorFn:
    """@iterator — a UDTF: a generator function yielding dicts, exploding
    each input row into N component rows (reference func/iterator.py:48-285,
    iterators/base.py:14-62; drives component views via
    exec/component_iteration_node.py).

    Spark mapping: mapInPandas explode with an emitted ``_pos`` ordinal —
    a narrow transformation, no shuffle, codegen-friendly schema.
    """

    def __init__(self, fn: Callable, output_schema: dict):
        self.fn = fn
        self.name = fn.__name__
        self.output_schema = dict(output_schema)

    def explode(self, df, input_cols: Optional[dict[str, str]] = None,
                keep_cols: Optional[list[str]] = None,
                on_error: str = "abort"):
        """Explode a DataFrame: one output row per yielded dict, carrying
        keep_cols + _pos + the iterator's declared outputs.

        on_error='ignore' (reference exec/exec_context.py ignore_errors):
        a source row whose iterator raises emits ONE row with _pos NULL,
        NULL outputs, and per-output ``_cellmd_<out>`` structs holding
        {errortype, errormsg} — the batch survives, errors stay queryable
        via ``view.<out>.errortype``.
        """
        import pandas as pd
        from pyspark.sql import types as T

        if on_error not in ("abort", "ignore"):
            raise ValueError("on_error must be 'abort' or 'ignore'")

        import inspect as _inspect
        params = list(_inspect.signature(self.fn).parameters)
        input_cols = input_cols or {p: p for p in params}
        keep_cols = keep_cols if keep_cols is not None else [
            c for c in df.columns if c not in input_cols.values()]

        cellmd_t = T.StructType([T.StructField("errortype", T.StringType()),
                                 T.StructField("errormsg", T.StringType())])
        out_fields = [df.schema[c] for c in keep_cols]
        out_fields.append(T.StructField("_pos", T.LongType()))
        for name, ct in self.output_schema.items():
            out_fields.append(T.StructField(name, ct.spark_type()))
        out_names = list(self.output_schema)
        md_names: list[str] = []
        if on_error == "ignore":
            md_names = [f"_cellmd_{n}" for n in out_names]
            out_fields.extend(T.StructField(m, cellmd_t) for m in md_names)
        schema = T.StructType(out_fields)
        fn = self.fn
        all_names = keep_cols + ["_pos"] + out_names + md_names

        def op(batches):
            for pdf in batches:
                rows = []
                for _, r in pdf.iterrows():
                    kwargs = {p: r[c] for p, c in input_cols.items()}
                    base = {c: r[c] for c in keep_cols}
                    try:
                        for pos, item in enumerate(fn(**kwargs)):
                            row = dict(base)
                            row["_pos"] = pos
                            for n in out_names:
                                row[n] = item.get(n)
                            for m in md_names:
                                row[m] = None
                            rows.append(row)
                    except Exception as exc:
                        if on_error == "abort":
                            raise
                        md = {"errortype": type(exc).__name__,
                              "errormsg": str(exc)}
                        row = dict(base)
                        row["_pos"] = None
                        for n in out_names:
                            row[n] = None
                        for m in md_names:
                            row[m] = md
                        rows.append(row)
                yield pd.DataFrame(rows, columns=all_names)

        return df.mapInPandas(op, schema)

    def explode_at(self, df, pos, input_cols: Optional[dict[str, str]] = None,
                   keep_cols: Optional[list[str]] = None):
        """Seekable fetch: ONE output row per input row, at component
        position `pos` (an int, or the name of a column holding the
        per-row position). A class-based iterator implementing
        ``set_pos(pos)`` (reference func/iterator.py:48-285 seekable
        iterators, iterators/base.py:14-62) seeks directly — e.g. frame
        500 of a video without decoding 0..499; plain generators fall
        back to islice.

        Rows whose iterator has fewer than pos+1 components produce no
        output row."""
        import itertools

        import pandas as pd
        from pyspark.sql import functions as F  # noqa: F401
        from pyspark.sql import types as T

        import inspect as _inspect
        target = self.fn.__init__ if _inspect.isclass(self.fn) else self.fn
        params = [p for p in _inspect.signature(target).parameters
                  if p != "self"]
        input_cols = input_cols or {p: p for p in params}
        keep_cols = keep_cols if keep_cols is not None else [
            c for c in df.columns if c not in input_cols.values()]
        pos_col = pos if isinstance(pos, str) else None

        out_fields = [df.schema[c] for c in keep_cols]
        out_fields.append(T.StructField("_pos", T.LongType()))
        for name, ct in self.output_schema.items():
            out_fields.append(T.StructField(name, ct.spark_type()))
        schema = T.StructType(out_fields)
        out_names = list(self.output_schema)
        all_names = keep_cols + ["_pos"] + out_names
        fn = self.fn
        is_class = _inspect.isclass(fn)

        def op(batches):
            for pdf in batches:
                rows = []
                for _, r in pdf.iterrows():
                    p = int(r[pos_col]) if pos_col else int(pos)
                    kwargs = {k: r[c] for k, c in input_cols.items()}
                    it = fn(**kwargs)
                    try:
                        if hasattr(it, "set_pos"):
                            it.set_pos(p)  # O(1)/O(log) seek, no replay
                            item = next(iter(it))
                        else:
                            item = next(itertools.islice(iter(it), p, p + 1))
                    except StopIteration:
                        continue
                    row = {c: r[c] for c in keep_cols}
                    row["_pos"] = p
                    for n in out_names:
                        row[n] = item.get(n)
                    rows.append(row)
                yield pd.DataFrame(rows, columns=all_names)

        return df.mapInPandas(op, schema)

    def as_view_iterator(self, input_cols: Optional[dict[str, str]] = None,
                         on_error: str = "abort"):
        """Adapter for Catalog.create_view(iterator=...): preserves the
        base's system columns (_rowid/_v_min/_v_max) through the explode."""
        def view_it(df):
            keep = [c for c in ("_rowid", "_v_min", "_v_max") if c in df.columns]
            extra = [c for c in df.columns if c not in keep]
            return self.explode(df, input_cols=input_cols,
                                keep_cols=keep + [c for c in extra if c not in (input_cols or {}).values()],
                                on_error=on_error)
        return view_it


def iterator(fn: Optional[Callable] = None, *,
             output_schema: Optional[dict] = None):
    """@iterator decorator (reference func/iterator.py:48). Requires a
    declared output schema: {'word': pxt.String(), 'len': pxt.Int()}."""
    if output_schema is None:
        raise ValueError("@iterator requires output_schema={name: ColumnType}")

    def wrap(f: Callable) -> IteratorFn:
        return IteratorFn(f, output_schema)

    return wrap(fn) if fn is not None else wrap


def run_uda_over_values(uda_cls: type, columns: list[list[Any]],
                        init_kwargs: Optional[dict] = None) -> Any:
    """Grouped evaluation: one aggregator instance per group
    (reference exec/aggregation_node.py:15-123 — minus the pre-sort, which
    Spark's shuffle-based grouping makes unnecessary)."""
    agg = uda_cls(**(init_kwargs or {}))
    for row in zip(*columns):
        agg.update(*row)
    return agg.value()


def run_uda_running(uda_cls: type, columns: list[list[Any]],
                    init_kwargs: Optional[dict] = None) -> list[Any]:
    """Window evaluation: running value per row (rows must already be in
    order-by order within the partition)."""
    agg = uda_cls(**(init_kwargs or {}))
    out = []
    for row in zip(*columns):
        agg.update(*row)
        out.append(agg.value())
    return out

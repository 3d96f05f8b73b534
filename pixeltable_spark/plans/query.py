"""Query clauses + planner: declarative Query -> Spark DataFrame.

The analog of the reference's Query/Planner split
(reference pixeltable/_query.py:447-559 clause lists,
query_clauses.py:14-152, plan.py:913/47-251 Analyzer,
plan.py:1012-1225 physical planning) — but where the reference assembles an
ExecNode tree over Postgres + a Python async evaluator, we assemble ONE
logical DataFrame and let Catalyst/AQE do analysis, pushdown, join
selection, and codegen. The planner's only real jobs on Spark:

* compile Exprs to Columns (JVM fast path) with pandas-UDF fallback,
  filtering with Catalyst-expressible conjuncts FIRST so they reach the
  parquet scan (the reference's sql_where_clause vs filter split,
  reference plan.py:64-70);
* classify select items into grouping / aggregate / window
  (reference plan.py:129-221);
* deterministic md5-keyed sampling (reference exec/sql_node.py:715-889).

Scale notes: joins go through Catalyst/AQE (broadcast for small dims is
automatic under AQE; `join_hint` lets callers force it); global top-k
(order_by+limit) becomes TakeOrderedAndProject, never a full sort; sample(n)
uses orderBy(key).limit(n) for the same reason.
"""

from __future__ import annotations

import hashlib
from typing import Any, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exprs import (
    AliasedExpr,
    ColumnRef,
    CompileCtx,
    CompoundPredicate,
    Expr,
    FunctionCall,
    to_expr,
)
from ..type_system import ColumnType

# max live groups a partition's map-side UDA combine holds before spilling
# a batch of partial-state rows (they re-merge in the reduce stage)
_UDA_COMBINE_FLUSH_AT = 100_000

# proportional stratified sampling collects a per-stratum quota map to the
# driver; refuse beyond this many distinct strata (driver-OOM guard)
MAX_STRATA = 100_000


class JoinClause:
    """One join step (reference _query.py:1359-1446, query_clauses.py:14-40).
    Join types match the reference surface: inner/left/full_outer/cross,
    plus Spark-native extras semi/anti."""

    TYPES = {"inner", "left", "full_outer", "cross", "semi", "anti", "right"}
    _SPARK = {"full_outer": "full_outer", "semi": "left_semi", "anti": "left_anti"}

    def __init__(self, tbl: "TableRef", on: Any, how: str):
        if how not in self.TYPES:
            raise ValueError(f"join type {how!r} not supported")
        self.tbl = tbl
        self.on = on
        self.how = self._SPARK.get(how, how)


class SampleClause:
    """Deterministic repeatable sampling (reference query_clauses.py:96-152,
    exec/sql_node.py:715-889): keyed by md5(seed || '___' || rowid)."""

    def __init__(self, n=None, n_per_stratum=None, fraction=None, seed=0,
                 stratify_by: Optional[Sequence[Expr]] = None):
        if fraction is not None and (n is not None or n_per_stratum is not None):
            raise ValueError("fraction is incompatible with n/n_per_stratum")
        self.n = n
        self.n_per_stratum = n_per_stratum
        self.fraction = fraction
        self.seed = seed
        self.stratify_by = list(stratify_by or [])

    @staticmethod
    def fraction_to_md5_hex(fraction: float) -> str:
        """16-hex-digit threshold: rows with md5-prefix <= threshold are kept
        (reference query_clauses.py:143-152). Clamped to 2^64-1 so
        fraction >= 1.0 keeps every row (a 17-hex string would compare
        lexicographically BELOW most 16-hex prefixes and drop ~94% of rows)."""
        raw = int(fraction * float(1 << 64))
        return format(min(max(raw, 0), (1 << 64) - 1), "016x")


class TableRef:
    """A named, typed table bound to a Spark DataFrame.

    Attribute access returns ColumnRefs: t.l_quantity, t.l_shipdate...
    rowid_cols identify a row deterministically (primary key) — they drive
    head/tail insertion order and repeatable sampling.
    """

    def __init__(self, df: DataFrame, name: str, schema: dict[str, ColumnType],
                 rowid_cols: Optional[list[str]] = None):
        self._df = df
        self._name = name
        self._schema = schema
        self._rowid_cols = rowid_cols or []

    @classmethod
    def from_df(cls, df: DataFrame, name: str,
                rowid_cols: Optional[list[str]] = None,
                json_cols: Sequence[str] = ()) -> "TableRef":
        schema = {}
        for f in df.schema.fields:
            ct = ColumnType.from_spark(f.dataType, f.nullable)
            if f.name in json_cols:
                ct = ColumnType.json(f.nullable)
            schema[f.name] = ct
        return cls(df, name, schema, rowid_cols)

    def __getattr__(self, name: str) -> ColumnRef:
        schema = self.__dict__.get("_schema") or {}
        if name in schema:  # includes system columns like _rowid
            return ColumnRef(name, schema[name], tbl=self)
        if name.startswith("_"):
            raise AttributeError(name)
        raise AttributeError(
            f"table {self.__dict__.get('_name')!r} has no column {name!r}")

    def __getitem__(self, name: str) -> ColumnRef:
        return getattr(self, name)

    def column_names(self) -> list[str]:
        return list(self._schema)

    # -- query builders ----------------------------------------------------
    def _q(self) -> "Query":
        return Query(self)

    def select(self, *items, **named):   return self._q().select(*items, **named)
    def where(self, pred):               return self._q().where(pred)
    def join(self, other, on=None, how="inner"):  return self._q().join(other, on, how)
    def group_by(self, *exprs):          return self._q().group_by(*exprs)
    def order_by(self, *exprs, asc=True): return self._q().order_by(*exprs, asc=asc)
    def limit(self, n, offset=0):        return self._q().limit(n, offset)
    def distinct(self):                  return self._q().distinct()
    def sample(self, **kw):              return self._q().sample(**kw)
    def head(self, n=10):                return self._q().head(n)
    def tail(self, n=10):                return self._q().tail(n)
    def count(self) -> int:              return self._q().count()
    def collect(self):                   return self._q().collect()
    def df(self) -> DataFrame:           return self._df


class Query:
    """Immutable-ish clause accumulator (reference _query.py:447-559)."""

    def __init__(self, tbl: TableRef):
        self.tbl = tbl
        self.joins: list[JoinClause] = []
        self.select_items: list[tuple[Optional[str], Expr]] = []
        self.where_pred: Optional[Expr] = None
        self.group_by_exprs: list[Expr] = []
        self.order_by_items: list[tuple[Expr, bool]] = []
        self.limit_n: Optional[int] = None
        self.offset_n: int = 0
        self.distinct_flag = False
        self.sample_clause: Optional[SampleClause] = None

    def _copy(self) -> "Query":
        q = Query(self.tbl)
        q.joins = list(self.joins)
        q.select_items = list(self.select_items)
        q.where_pred = self.where_pred
        q.group_by_exprs = list(self.group_by_exprs)
        q.order_by_items = list(self.order_by_items)
        q.limit_n, q.offset_n = self.limit_n, self.offset_n
        q.distinct_flag = self.distinct_flag
        q.sample_clause = self.sample_clause
        q._tail_resort = getattr(self, "_tail_resort", False)
        q.having_pred = getattr(self, "having_pred", None)
        return q

    # -- clause builders ---------------------------------------------------
    def select(self, *items, **named) -> "Query":
        q = self._copy()
        q.select_items = []
        for it in items:
            e = to_expr(it)
            name = None
            if isinstance(e, AliasedExpr):
                name, e = e.name, e.components[0]
            elif isinstance(e, ColumnRef):
                name = e.name
            q.select_items.append((name, e))
        for name, it in named.items():
            e = to_expr(it)
            if isinstance(e, AliasedExpr):
                e = e.components[0]
            q.select_items.append((name, e))
        return q

    def where(self, pred: Expr) -> "Query":
        q = self._copy()
        q.where_pred = pred if q.where_pred is None else (q.where_pred & pred)
        return q

    def join(self, other: "TableRef | Query", on=None, how: str = "inner") -> "Query":
        q = self._copy()
        if isinstance(other, Query):
            other = TableRef.from_df(other.df(), f"__subq{len(q.joins)}")
        q.joins.append(JoinClause(other, on, how))
        return q

    def group_by(self, *exprs) -> "Query":
        """Group keys. A catalog table/view HANDLE is also accepted:
        grouping a component view by its base table (or any ancestor
        view) groups by that ancestor's identity columns — base `_rowid`
        plus one `_pos` level per iterator between the ancestor and it
        (reference _query.py:1446-1538 group_by(base_tbl))."""
        from ..type_system import ColumnType
        from ..exprs import ColumnRef
        q = self._copy()
        out = []
        for e in exprs:
            ident = getattr(e, "_component_identity_cols", None)
            if callable(ident):
                out.extend(ColumnRef(c, ColumnType.int_(False))
                           for c in ident())
            else:
                out.append(to_expr(e))
        q.group_by_exprs = out
        return q

    def order_by(self, *exprs, asc: bool = True) -> "Query":
        q = self._copy()
        q.order_by_items = q.order_by_items + [(to_expr(e), asc) for e in exprs]
        return q

    def limit(self, n: int, offset: int = 0) -> "Query":
        q = self._copy()
        q.limit_n, q.offset_n = n, offset
        return q

    def distinct(self) -> "Query":
        q = self._copy()
        q.distinct_flag = True
        return q

    def having(self, pred: Expr) -> "Query":
        """Filter on aggregate outputs (post-group_by). Predicate refs
        resolve against the SELECT-list names."""
        q = self._copy()
        q.having_pred = pred if getattr(q, "having_pred", None) is None \
            else (q.having_pred & pred)  # type: ignore[attr-defined]
        return q

    def sample(self, n=None, n_per_stratum=None, fraction=None, seed=0,
               stratify_by=None) -> "Query":
        q = self._copy()
        strat = [to_expr(e) for e in (stratify_by or [])]
        q.sample_clause = SampleClause(n, n_per_stratum, fraction, seed, strat)
        return q

    def head(self, n: int = 10) -> "Query":
        """First n in insertion (rowid) order (reference _query.py:806-875)."""
        self._require_rowid("head")
        q = self.order_by(*[self.tbl[c] for c in self.tbl._rowid_cols]).limit(n)
        return q

    def tail(self, n: int = 10) -> "Query":
        self._require_rowid("tail")
        q = self._copy()
        q.order_by_items = [(self.tbl[c], False) for c in self.tbl._rowid_cols]
        q.limit_n = n
        q._tail_resort = True  # type: ignore[attr-defined]
        return q

    def _require_rowid(self, op: str) -> None:
        if not self.tbl._rowid_cols:
            raise ValueError(f"{op}() requires a table with rowid/primary-key columns")
        if self.order_by_items or self.joins or self.group_by_exprs or self.sample_clause:
            raise ValueError(f"{op}() cannot be combined with order_by/join/group_by/sample")

    # -- execution ---------------------------------------------------------
    def df(self) -> DataFrame:
        from .. import telemetry
        if not telemetry.active():
            return Planner(self).to_df()
        with telemetry.span("query.compile",
                            attrs=lambda: {"table": getattr(self.tbl, "name",
                                                            "?")}):
            return Planner(self).to_df()

    def collect(self):
        """Execute and materialize the result (reference _query.py:780
        Query.collect -> ResultSet). Returns a ResultSet — a list of
        dicts (backward compatible) with column indexing, .schema,
        .to_pandas() and .to_pydantic() layered on."""
        from ..results import ResultSet
        from ..type_system import ColumnType
        df = self.df()
        schema = {f.name: ColumnType.from_spark(f.dataType, f.nullable)
                  for f in df.schema.fields}
        return ResultSet([r.asDict(recursive=True) for r in df.collect()],
                         schema)

    def cursor(self):
        """Streaming iteration over the result (reference _query.py:271
        ResultCursor): yields Row mappings one partition at a time via
        toLocalIterator — never materializes the full result driver-side."""
        from ..results import ResultCursor
        return ResultCursor(self)

    @property
    def schema(self) -> dict:
        """Result columns as name -> type string (reference Query.schema).
        Planning only — no Spark job runs."""
        from ..type_system import ColumnType
        return {f.name: repr(ColumnType.from_spark(f.dataType, f.nullable))
                for f in self.df().schema.fields}

    def describe(self) -> None:
        """Print a clause-by-clause description of this query (reference
        _query.py Query.describe)."""
        print(repr(self))

    def __repr__(self) -> str:
        parts = [f"from: {getattr(self.tbl, '_name', '?')}"]
        for jc in self.joins:
            parts.append(f"join: {getattr(jc.tbl, '_name', '?')}"
                         f" ({jc.how})")
        if self.select_items:
            parts.append("select: " + ", ".join(
                n or repr(e) for n, e in self.select_items))
        if self.where_pred is not None:
            parts.append(f"where: {self.where_pred!r}")
        if self.group_by_exprs:
            parts.append("group_by: " + ", ".join(
                repr(e) for e in self.group_by_exprs))
        if getattr(self, "having_pred", None) is not None:
            parts.append(f"having: {self.having_pred!r}")
        if self.order_by_items:
            parts.append("order_by: " + ", ".join(
                f"{e!r} {'asc' if a else 'desc'}"
                for e, a in self.order_by_items))
        if self.limit_n is not None:
            parts.append(f"limit: {self.limit_n}"
                         + (f" offset {self.offset_n}" if self.offset_n
                            else ""))
        if self.sample_clause is not None:
            parts.append("sample: ...")
        return "Query(" + "; ".join(parts) + ")"

    # -- serialization (reference _query.py:1904-1985 Query.as_dict/
    # from_dict: persistable query definitions; tables serialize by
    # catalog name + pinned version and rebind at load) ------------------
    def as_dict(self) -> dict:
        from ..exprs import Expr as _Expr

        def tbl_key(tr) -> dict:
            ct = getattr(tr, "_catalog_tbl", None)
            if ct is None:
                raise ValueError(
                    "only queries rooted at catalog tables serialize "
                    "(free DataFrame-backed refs have no stable address)")
            return {"table": ct.name,
                    "version": getattr(tr, "_pinned_version", None)}

        def on_dict(on) -> Any:
            if on is None or isinstance(on, str):
                return on
            if isinstance(on, (list, tuple)) \
                    and all(isinstance(x, str) for x in on):
                return list(on)
            return {"_expr": on.as_dict()}

        d: dict = {
            "_classname": "Query",
            "from": tbl_key(self.tbl),
            "joins": [{"tbl": tbl_key(j.tbl), "on": on_dict(j.on),
                       "how": j.how} for j in self.joins],
            "select": [[n, e.as_dict()] for n, e in self.select_items],
            "where": self.where_pred.as_dict()
            if self.where_pred is not None else None,
            "group_by": [e.as_dict() for e in self.group_by_exprs],
            "having": self.having_pred.as_dict()
            if getattr(self, "having_pred", None) is not None else None,
            "order_by": [[e.as_dict(), asc]
                         for e, asc in self.order_by_items],
            "limit": self.limit_n, "offset": self.offset_n,
            "distinct": self.distinct_flag,
        }
        sc = self.sample_clause
        if sc is not None:
            d["sample"] = {"n": sc.n, "n_per_stratum": sc.n_per_stratum,
                           "fraction": sc.fraction, "seed": sc.seed,
                           "stratify_by": [e.as_dict()
                                           for e in sc.stratify_by]}
        return d

    @classmethod
    def from_dict(cls, d: dict, catalog) -> "Query":
        """Rebuild a serialized query against `catalog` (tables resolve
        by name; a recorded pinned version re-pins)."""
        from ..exprs import Expr as _Expr

        def bind(key: dict):
            t = catalog.get_table(key["table"])
            return t.ref(version=key.get("version"))

        from ..exprs import ColumnRef as _CR

        ref = bind(d["from"])
        q = cls(ref)
        refs = [ref]

        def rebind(e) -> None:
            """Column refs re-attach to whichever bound table carries the
            name (from-table wins ties, matching build-time behavior)."""
            if isinstance(e, _CR):
                want = getattr(e, "tbl_name", None)
                cands = ([tr for tr in refs
                          if getattr(getattr(tr, "_catalog_tbl", None),
                                     "name", None) == want]
                         if want is not None else []) or refs
                for tr in cands:
                    if e.name in tr._schema:
                        e.tbl = tr
                        break
            for c in e.components:
                rebind(c)

        def load(spec):
            e = _Expr.from_dict(spec, ref)
            rebind(e)
            return e

        for j in d.get("joins", []):
            jr = bind(j["tbl"])
            refs.append(jr)
            on = j["on"]
            if isinstance(on, dict):
                on = load(on["_expr"])
            q.joins.append(JoinClause(jr, on, "inner"))
            q.joins[-1].how = j["how"]  # already Spark-normalized
        q.select_items = [(n, load(e)) for n, e in d.get("select", [])]
        if d.get("where") is not None:
            q.where_pred = load(d["where"])
        q.group_by_exprs = [load(e) for e in d.get("group_by", [])]
        if d.get("having") is not None:
            q.having_pred = load(d["having"])
        q.order_by_items = [(load(e), asc)
                            for e, asc in d.get("order_by", [])]
        q.limit_n = d.get("limit")
        q.offset_n = d.get("offset", 0)
        q.distinct_flag = d.get("distinct", False)
        if d.get("sample") is not None:
            s = d["sample"]
            q.sample_clause = SampleClause(
                s["n"], s["n_per_stratum"], s["fraction"], s["seed"],
                [load(e) for e in s["stratify_by"]])
        return q

    # -- mutations through a query handle (reference _query.py:1800-1875:
    # t.where(pred).update/delete/recompute_columns forward the where
    # clause to the underlying catalog table) --------------------------
    def _mutation_target(self, op: str, forbid_view: bool = False):
        if self.joins:
            raise ValueError(f"cannot use {op!r} after join")
        if self.group_by_exprs:
            raise ValueError(f"cannot use {op!r} after group_by")
        if self.order_by_items:
            raise ValueError(f"cannot use {op!r} after order_by")
        if self.select_items:
            raise ValueError(f"cannot use {op!r} after select")
        if self.limit_n is not None:
            raise ValueError(f"cannot use {op!r} after limit")
        if self.sample_clause is not None:
            raise ValueError(f"cannot use {op!r} after sample")
        if self.distinct_flag:
            raise ValueError(f"cannot use {op!r} after distinct")
        tbl = getattr(self.tbl, "_catalog_tbl", None)
        if tbl is None:
            raise ValueError(
                f"{op}() requires a query rooted at a catalog table")
        if getattr(self.tbl, "_pinned_version", None) is not None:
            raise ValueError(f"cannot use {op!r} on a snapshot or "
                             "version-pinned table")
        if forbid_view and type(tbl).__name__ == "View":
            raise ValueError(f"cannot use {op!r} on a view")
        return tbl

    def update(self, value_spec: dict, cascade: bool = True):
        """Update the matching rows of the underlying table (reference
        _query.py:1800 Query.update): the accumulated where clause scopes
        the mutation."""
        tbl = self._mutation_target("update")
        return tbl.update(value_spec, where=self.where_pred,
                          cascade=cascade)

    def delete(self):
        """Delete the matching rows of the underlying base table
        (reference _query.py:1856 Query.delete; views refuse)."""
        tbl = self._mutation_target("delete", forbid_view=True)
        return tbl.delete(where=self.where_pred)

    def recompute_columns(self, *cols, errors_only: bool = False,
                          cascade: bool = True):
        """Recompute computed columns for the matching rows (reference
        _query.py:1831 Query.recompute_columns)."""
        tbl = self._mutation_target("recompute_columns")
        names = [c if isinstance(c, str) else c.name for c in cols]
        return tbl.recompute_columns(*names, where=self.where_pred,
                                     errors_only=errors_only,
                                     cascade=cascade)

    def show(self, n: int = 20) -> list[dict]:
        """First n rows as dicts, printed compactly (reference
        _query.py:800 Query.show)."""
        rows = self.limit(n).collect()
        if rows:
            cols = list(rows[0])
            print(" | ".join(cols))
            for r in rows:
                print(" | ".join(str(r[c]) for c in cols))
        return rows

    def to_pandas(self):
        return self.df().toPandas()

    def explain(self, mode: str = "formatted") -> None:
        self.df().explain(mode)

    # -- set operations (absent in the reference — SURVEY §2.7 notes Spark
    # provides them free; exposed first-class here) -----------------------
    def union_all(self, other: "Query | TableRef") -> "Query":
        df = self.df().unionByName(_as_df(other))
        return TableRef.from_df(df, "__union")._q()

    def union(self, other: "Query | TableRef") -> "Query":
        return self.union_all(other).distinct()

    def intersect(self, other: "Query | TableRef") -> "Query":
        df = self.df().intersect(_as_df(other))
        return TableRef.from_df(df, "__intersect")._q()

    def except_(self, other: "Query | TableRef") -> "Query":
        df = self.df().exceptAll(_as_df(other))
        return TableRef.from_df(df, "__except")._q()

    def count(self) -> int:
        """COUNT(*) of the query result — stays fully in the JVM
        (reference _query.py:1018-1060). Only ordering is stripped (it
        cannot change the count); select/distinct/limit all can."""
        q = self._copy()
        q.order_by_items = []
        # A grouped/aggregated query's count is the number of result rows
        # (groups, or 1 for a global aggregate) — the select list must be
        # kept so the aggregation still happens. Only a plain projection can
        # be dropped to let Catalyst count the bare scan.
        has_agg = any(e.is_agg() for _, e in q.select_items)
        if (not q.distinct_flag and q.limit_n is None
                and not q.group_by_exprs and not has_agg):
            q.select_items = []
        return q.df().count()


class Planner:
    """Assemble the DataFrame. Catalyst takes it from there."""

    def __init__(self, q: Query):
        self.q = q
        self._aliases: dict[int, str] = {}

    # -- ColumnRef resolution with join disambiguation --------------------
    def _ctx(self) -> CompileCtx:
        aliases = self._aliases

        def resolve(ref: ColumnRef) -> Column:
            if ref.tbl is not None and id(ref.tbl) in aliases:
                return F.col(f"{aliases[id(ref.tbl)]}.{ref.name}")
            return F.col(ref.name)

        return CompileCtx(resolve)

    def to_df(self) -> DataFrame:
        q = self.q
        base = q.tbl
        if q.joins:
            self._aliases[id(base)] = "t0"
            df = base.df().alias("t0")
            for i, jc in enumerate(q.joins):
                self._aliases[id(jc.tbl)] = f"t{i + 1}"
        else:
            df = base.df()
        ctx = self._ctx()

        for i, jc in enumerate(q.joins):
            right = jc.tbl.df().alias(f"t{i + 1}")
            if jc.on is None:
                df = df.crossJoin(right) if jc.how == "cross" else df.join(right, how=jc.how)
            elif isinstance(jc.on, Expr):
                df = df.join(right, on=jc.on.compile(ctx), how=jc.how)
            else:
                on = [jc.on] if isinstance(jc.on, str) else list(jc.on)
                df = df.join(right, on=on, how=jc.how)

        # WHERE: Catalyst-expressible conjuncts first (pushdown), UDF conjuncts after
        if q.where_pred is not None:
            fast, slow = self._split_where(q.where_pred, ctx)
            for c in fast:
                df = df.filter(c)
            for e in slow:
                df = df.filter(e.compile(ctx))

        if q.sample_clause is not None:
            df = self._apply_sample(df, q.sample_clause, ctx)

        # window-form custom UDAs (running aggregates over applyInPandas) —
        # the reference's per-partition aggregator loop
        # (reference exprs/function_call.py:447-461) computed executor-side
        self._window_uda_cols: dict[int, str] = {}
        for i, (_, e) in enumerate(q.select_items):
            fc = e.components[0] if isinstance(e, AliasedExpr) else e
            if (
                isinstance(fc, FunctionCall) and fc.is_window()
                and getattr(fc.fn, "uda_class", None) is not None
            ):
                out_name = f"__wuda{i}"
                df = self._apply_window_uda(df, fc, ctx, out_name)
                self._window_uda_cols[id(e)] = out_name

        # hoist async provider calls: each DISTINCT async node (by object
        # identity — select items share subtrees) evaluates ONCE as an
        # intermediate column; downstream exprs then compile against that
        # column JVM-side instead of re-invoking the provider per item
        # (the reference's RowBuilder unique-subexpr slots, for the async
        # path — reference exprs/row_builder.py:59-122)
        from ..exprs import _find_async_nodes, compile_via_pandas_udf
        anodes: dict[int, FunctionCall] = {}
        for _, e in q.select_items:
            for node in _find_async_nodes(e):
                anodes.setdefault(id(node), node)
        # Python-backed select items (async providers, local-model fns,
        # pandas fallbacks) are CPU/IO-bound per row: a single-file scan
        # yields one task (one row group -> one split), serializing the
        # whole Python stage on one core. Spread rows first — a no-op
        # whenever the scan already parallelizes (many files / row groups,
        # i.e. any real at-scale table).
        needs_python = bool(anodes)
        if not needs_python:
            for _, e in q.select_items:
                try:
                    if e.to_column(ctx) is None:
                        needs_python = True
                        break
                except Exception:  # noqa: BLE001 — compiled for real below
                    break
        if needs_python:
            sc = df.sparkSession.sparkContext
            if df.rdd.getNumPartitions() < sc.defaultParallelism:
                df = df.repartition(sc.defaultParallelism)
        if anodes:
            acols = dict(getattr(ctx, "async_cols", None) or {})
            for i, (nid, node) in enumerate(anodes.items()):
                cname = f"__async{i}"
                df = df.withColumn(cname, compile_via_pandas_udf(node, ctx))
                acols[nid] = cname
            ctx.async_cols = acols  # type: ignore[attr-defined]

        has_agg = any(e.is_agg() for _, e in q.select_items)
        if q.group_by_exprs or has_agg:
            df = self._apply_groupby(df, ctx)
            having = getattr(q, "having_pred", None)
            if having is not None:
                # refs resolve against the aggregated output's column names
                df = df.filter(having.compile(CompileCtx()))
        elif q.select_items:
            cols = []
            for i, (name, e) in enumerate(q.select_items):
                if id(e) in self._window_uda_cols:
                    col = F.col(self._window_uda_cols[id(e)])
                else:
                    col = e.compile(ctx)
                cols.append(col.alias(name or f"col_{i}"))
            df = df.select(*cols)

        if q.distinct_flag:
            df = df.distinct()

        order_cols = [
            (e.compile(ctx) if (q.group_by_exprs or has_agg) is False else self._post_agg_col(e, ctx))
            for e, _ in q.order_by_items
        ]
        if q.order_by_items:
            ordered = [c if asc else c.desc() for c, (_, asc) in zip(order_cols, q.order_by_items)]
            df = df.orderBy(*ordered)

        if q.offset_n:
            df = df.offset(q.offset_n)
        if q.limit_n is not None:
            df = df.limit(q.limit_n)
        if getattr(q, "_tail_resort", False):
            df = df.orderBy(*[F.col(c) for c in q.tbl._rowid_cols])
        return df

    def _post_agg_col(self, e: Expr, ctx: CompileCtx) -> Column:
        """order_by after group_by refers to output columns by select name."""
        for name, se in self.q.select_items:
            if name is not None and _expr_key(se) == _expr_key(e):
                return F.col(name)
        return e.compile(ctx)

    def _split_where(self, pred: Expr, ctx: CompileCtx):
        conjuncts = (
            pred.split_conjuncts()
            if isinstance(pred, CompoundPredicate)
            else [pred]
        )
        fast: list[Column] = []
        slow: list[Expr] = []
        for c in conjuncts:
            col = c.to_column(ctx)
            if col is not None:
                fast.append(col)
            else:
                slow.append(c)
        return fast, slow

    def _apply_groupby(self, df: DataFrame, ctx: CompileCtx) -> DataFrame:
        q = self.q
        gkeys: list[str] = []
        gmap: dict[tuple, str] = {}
        tmp = df
        for i, ge in enumerate(q.group_by_exprs):
            key = f"__g{i}"
            tmp = tmp.withColumn(key, ge.compile(ctx))
            gkeys.append(key)
            gmap[_expr_key(ge)] = key
            if isinstance(ge, ColumnRef):
                # name-level fallback: group keys synthesized from a table
                # HANDLE (group_by(base_tbl)) carry no tbl back-pointer,
                # while select items do — match plain column refs by name
                gmap.setdefault(("col*", ge.name), key)

        agg_cols: list[Column] = []
        uda_specs: list[tuple[str, FunctionCall]] = []
        out_names: list[str] = []
        out_cols: list[Column] = []
        for i, (name, e) in enumerate(q.select_items):
            name = name or f"col_{i}"
            out_names.append(name)
            if e.is_agg():
                fc = e.components[0] if isinstance(e, AliasedExpr) else e
                if (isinstance(fc, FunctionCall)
                        and getattr(fc.fn, "uda_class", None) is not None):
                    uda_specs.append((name, fc))
                else:
                    agg_cols.append(e.compile(ctx).alias(name))
                out_cols.append(F.col(name))
            else:
                gk = gmap.get(_expr_key(e))
                if gk is None:
                    inner = (e.components[0] if isinstance(e, AliasedExpr)
                             else e)
                    if isinstance(inner, ColumnRef):
                        gk = gmap.get(("col*", inner.name))
                if gk is None:
                    raise ValueError(
                        f"select item {name!r} is neither an aggregate nor a group_by expression"
                    )
                out_cols.append(F.col(gk).alias(name))
        if not agg_cols and not uda_specs:
            # pure grouping select == distinct on grouping exprs
            return tmp.select(*[F.col(k).alias(n) for k, n in zip(gkeys, out_names)]).distinct()

        res = None
        if agg_cols:
            grouped = tmp.groupBy(*[F.col(k) for k in gkeys]) if gkeys else tmp.groupBy()
            res = grouped.agg(*agg_cols)
        if uda_specs:
            uda_res = self._apply_grouped_udas(tmp, gkeys, uda_specs, ctx)
            if res is None:
                res = uda_res
            else:
                # both sides are partitioned by the same keys -> cheap join
                res = res.join(uda_res, on=gkeys) if gkeys else res.crossJoin(uda_res)
        return res.select(*out_cols)

    def _apply_grouped_udas(self, tmp: DataFrame, gkeys: list[str],
                            uda_specs: list, ctx: CompileCtx) -> DataFrame:
        """Custom @uda aggregates: one Aggregator instance per group,
        executed via applyInPandas (the reference's AggregationNode,
        reference exec/aggregation_node.py:15-123 — Spark's shuffle-based
        grouping removes the need for its sorted-input streaming)."""
        import pandas as pd
        from pyspark.sql import types as T

        from ..functions.udf import run_uda_over_values

        in_cols: dict[str, list[str]] = {}
        for j, (name, fc) in enumerate(uda_specs):
            cols = []
            for k, arg in enumerate(fc.components):
                c = f"__ua{j}_{k}"
                tmp = tmp.withColumn(c, arg.compile(ctx))
                cols.append(c)
            in_cols[name] = cols

        fields = [tmp.schema[k] for k in gkeys] + [
            T.StructField(name, fc.col_type.spark_type())
            for name, fc in uda_specs
        ]
        schema = T.StructType(fields)
        specs = [(name, fc.fn.uda_class, in_cols[name], fc.kwargs)
                 for name, fc in uda_specs]

        def agg_fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
            row = dict(zip(gkeys, key))
            for name, cls, cols, kwargs in specs:
                row[name] = run_uda_over_values(
                    cls, [pdf[c].tolist() for c in cols], kwargs)
            return pd.DataFrame([row])

        if (gkeys
                and all(callable(getattr(cls, "merge", None))
                        for _, cls, _, _ in specs)
                and all(isinstance(tmp.schema[k].dataType, T.AtomicType)
                        for k in gkeys)):  # dict-keyable group keys only
            return self._apply_grouped_udas_mergeable(tmp, gkeys, specs, schema)

        grouped = tmp.groupBy(*[F.col(k) for k in gkeys]) if gkeys else tmp.groupBy(F.lit(1).alias("__one"))
        if not gkeys:
            fields = [T.StructField("__one", T.IntegerType())] + fields
            schema = T.StructType(fields)

            def agg_fn_global(key, pdf):  # noqa: ANN001
                row = {"__one": 1}
                for name, cls, cols, kwargs in specs:
                    row[name] = run_uda_over_values(
                        cls, [pdf[c].tolist() for c in cols], kwargs)
                return pd.DataFrame([row])

            return grouped.applyInPandas(agg_fn_global, schema).drop("__one")
        return grouped.applyInPandas(agg_fn, schema)

    def _apply_grouped_udas_mergeable(self, tmp: DataFrame, gkeys: list[str],
                                      specs: list, schema) -> DataFrame:
        """Map-side combine for @uda aggregates whose class implements
        merge(other): fold each INPUT partition into one state per group
        locally (mapInPandas — no row shuffle), then shuffle only the tiny
        pickled states and merge per group.

        The naive plan (groupBy().applyInPandas over raw rows) shuffles
        every row and concentrates each group's entire data in one Python
        worker — with few heavy groups (e.g. 3 return flags over 100 TB of
        lineitem) that's both a full-table shuffle and an OOM. Here the
        shuffle carries #groups x #partitions one-row states. Partial
        state dicts are flushed at a cap so high-cardinality group keys
        spill to extra state rows instead of unbounded executor memory
        (they merge again in stage 2)."""
        import pandas as pd
        from pyspark import cloudpickle as pickle
        from pyspark.sql import types as T

        key_fields = [tmp.schema[k] for k in gkeys]
        state_fields = [T.StructField(f"__s{j}", T.BinaryType())
                        for j in range(len(specs))]
        partial_schema = T.StructType(key_fields + state_fields)
        in_cols = [cols for _, _, cols, _ in specs]
        all_in = sorted({c for cols in in_cols for c in cols})
        flush_at = _UDA_COMBINE_FLUSH_AT  # captured for the executor closure

        def make_aggs():
            return [cls(**dict(kw or {})) for _, cls, _, kw in specs]

        def partial(batches):
            states: dict[tuple, list] = {}

            def flush():
                rows = []
                for key, aggs in states.items():
                    row = dict(zip(gkeys, key))
                    for j, agg in enumerate(aggs):
                        row[f"__s{j}"] = pickle.dumps(agg)
                    rows.append(row)
                states.clear()
                return pd.DataFrame(rows, columns=gkeys + [f"__s{j}" for j in range(len(specs))])

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                kcols = [pdf[k].tolist() for k in gkeys]
                vcols = {c: pdf[c].tolist() for c in all_in}
                for i in range(len(pdf)):
                    key = tuple(None if pd.isna(v) else v
                                for v in (kc[i] for kc in kcols))
                    aggs = states.get(key)
                    if aggs is None:
                        aggs = states[key] = make_aggs()
                    for j, cols in enumerate(in_cols):
                        aggs[j].update(*(vcols[c][i] for c in cols))
                if len(states) >= flush_at:
                    yield flush()
            if states:
                yield flush()

        partials = tmp.select(*gkeys, *all_in).mapInPandas(partial, partial_schema)

        def final(key, pdf: pd.DataFrame) -> pd.DataFrame:
            row = dict(zip(gkeys, key))
            for j, (name, _, _, _) in enumerate(specs):
                agg = None
                for blob in pdf[f"__s{j}"]:
                    part = pickle.loads(bytes(blob))
                    if agg is None:
                        agg = part
                    else:
                        agg.merge(part)
                row[name] = agg.value() if agg is not None else None
            return pd.DataFrame([row])

        return (partials.groupBy(*[F.col(k) for k in gkeys])
                .applyInPandas(final, schema))

    def _apply_window_uda(self, df: DataFrame, fc: FunctionCall,
                          ctx: CompileCtx, out_name: str) -> DataFrame:
        """Running custom UDA per partition: sort by order keys inside each
        group's pandas frame, emit aggregator.value() per row."""
        import pandas as pd
        from pyspark.sql import types as T

        from ..functions.udf import run_uda_running

        tmp = df
        pkeys, okeys, akeys = [], [], []
        for i, e in enumerate(fc.window_group_by):
            c = f"__wp{i}"
            tmp = tmp.withColumn(c, e.compile(ctx))
            pkeys.append(c)
        for i, e in enumerate(fc.window_order_by):
            c = f"__wo{i}"
            tmp = tmp.withColumn(c, e.compile(ctx))
            okeys.append(c)
        for i, e in enumerate(fc.components):
            c = f"__wa{i}"
            tmp = tmp.withColumn(c, e.compile(ctx))
            akeys.append(c)

        schema = T.StructType(
            list(tmp.schema.fields) + [T.StructField(out_name, fc.col_type.spark_type())]
        )
        cls = fc.fn.uda_class
        kwargs = fc.kwargs

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            if okeys:
                pdf = pdf.sort_values(okeys, kind="stable")
            pdf = pdf.copy()
            pdf[out_name] = run_uda_running(cls, [pdf[c].tolist() for c in akeys], kwargs)
            return pdf

        if pkeys:
            out = tmp.groupBy(*[F.col(k) for k in pkeys]).applyInPandas(fn, schema)
        elif okeys and hasattr(cls, "merge"):
            out = _global_running_uda_two_pass(
                tmp, cls, kwargs, okeys, akeys, out_name,
                fc.col_type.spark_type())
        else:
            # un-partitioned, un-mergeable (or orderless) running UDA:
            # inherently sequential — the whole input becomes one pandas
            # group. Give the UDA class a merge(other) method to get the
            # distributed two-pass plan instead.
            import warnings
            warnings.warn(
                f"global running UDA {fc.fn.name!r} without a merge(other) "
                "method collapses the input to a single partition (will OOM "
                "at scale); implement merge(other) on the aggregator class "
                "to get the distributed two-pass plan",
                RuntimeWarning, stacklevel=2)
            one = tmp.withColumn("__one", F.lit(1))

            def fn_global(pdf: pd.DataFrame) -> pd.DataFrame:
                return fn(pdf.drop(columns="__one"))

            out = one.groupBy("__one").applyInPandas(fn_global, schema)
        return out.drop(*pkeys, *okeys, *akeys)

    def _apply_sample(self, df: DataFrame, sc: SampleClause, ctx: CompileCtx) -> DataFrame:
        rowid = self.q.tbl._rowid_cols
        if not rowid:
            raise ValueError("sample() requires rowid/primary-key columns for determinism")
        key = F.md5(
            F.concat_ws("___", F.lit(str(sc.seed)), *[F.col(c).cast("string") for c in rowid])
        )
        if sc.fraction is not None:
            thresh = SampleClause.fraction_to_md5_hex(sc.fraction)
            return df.filter(F.substring(key, 1, 16) <= F.lit(thresh))
        if sc.stratify_by and sc.n_per_stratum is not None:
            # The window path sorts by the md5 key INSIDE the post-exchange
            # window stage — whose task count is the STRATA count (3 strata
            # = 3 tasks hashing the whole table, at any cluster size;
            # measured 1.8 s of q12's 2.2 s). Materialize the key map-side
            # first, and spread() the few-split local scan (no-op at real
            # scale), so the hashing runs at full width and the window
            # stage only sorts. The other n-paths DON'T want this: the
            # proportional-allocation path already evaluates the key
            # map-side in its prefilter, and the global-n path's
            # TakeOrderedAndProject is map-side by construction — for both,
            # the extra round-robin exchange was a measured net loss
            # (q52 interleaved A/B +0.4 s).
            from pyspark.sql import Window as W

            from ..operators.text import spread
            kc = "__pxt_sample_key"
            df = spread(df).withColumn(kc, key)
            strata = [e.compile(ctx) for e in sc.stratify_by]
            w = W.partitionBy(*strata).orderBy(F.col(kc))
            return (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= sc.n_per_stratum)
                .drop("__rn", kc)
            )
        if sc.n is not None:
            if sc.stratify_by:
                return self._stratified_n(df, sc, key, ctx)
            # global n: top-n by hash key -> TakeOrderedAndProject, no full sort
            return df.orderBy(key).limit(sc.n)
        raise ValueError("sample() requires n, n_per_stratum, or fraction")

    def _stratified_n(self, df: DataFrame, sc: SampleClause, key: Column,
                      ctx: CompileCtx) -> DataFrame:
        """Proportional allocation of n across strata
        (reference exec/sql_node.py:829-889): quota_i =
        floor(n*c_i/N) + largest-remainder top-up, ties broken by stratum
        key order — fully deterministic, and reproducible in SQL so the
        oracle can replicate it. Strata counts are collected to the driver
        (stratification keys are low-cardinality by construction)."""
        import math

        from pyspark.sql import Window as W

        strata = [e.compile(ctx) for e in sc.stratify_by]
        skey = F.concat_ws("\x1f", *[s.cast("string") for s in strata])
        # The strata-count map is collected to the driver; stratification
        # keys are low-cardinality by design, but a user stratifying on a
        # near-unique key would otherwise OOM the driver — cap and fail
        # with guidance instead (limit+1 probe: one extra row, not a scan
        # of the full count). MAX_STRATA is the module-level cap.
        rows = (df.withColumn("sk", skey).groupBy("sk")
                .agg(F.count(F.lit(1)).alias("c"))
                .limit(MAX_STRATA + 1).collect())
        if len(rows) > MAX_STRATA:
            raise ValueError(
                f"sample(n=..., stratify_by=...) found more than "
                f"{MAX_STRATA:,} distinct strata — the stratification key "
                "is too fine-grained for proportional allocation (the "
                "per-stratum quota map is driver-resident). Stratify on a "
                "coarser key, or use fraction= / n_per_stratum= sampling.")
        counts = {r["sk"]: r["c"] for r in rows}
        total = sum(counts.values())
        alloc = {}
        rems = []
        for k in sorted(counts):
            exact = sc.n * 1.0 * counts[k] / total
            fq = math.floor(exact)
            alloc[k] = fq
            rems.append((-(exact - fq), k))  # largest remainder first, then key
        extra = sc.n - sum(alloc.values())
        for _, k in sorted(rems)[:max(0, extra)]:
            alloc[k] += 1
        quota = F.create_map(*[x for k in alloc for x in (F.lit(k), F.lit(alloc[k]))])
        w = W.partitionBy(skey).orderBy(key)

        # Scale path: a per-stratum window sort runs on ONE task per stratum
        # (3 strata = 3 cores no matter the cluster), so sorting whole
        # strata is the bottleneck at any real size. Prefilter map-side on
        # the md5 prefix with a generous per-stratum fraction (8x quota
        # + 64 expected survivors; P[undershoot] is e^-100-scale), then
        # window only the survivors. The quota rows are exactly the
        # stratum's smallest keys, so whenever enough survivors exist the
        # filtered result is IDENTICAL to the unfiltered one; an eager
        # count verifies per-stratum fill and falls back to the full
        # window on the (theoretical) undershoot.
        thresh = {
            k: SampleClause.fraction_to_md5_hex(
                min(1.0, (8.0 * alloc[k] + 64.0) / max(counts[k], 1)))
            for k in alloc
        }
        tmap = F.create_map(
            *[x for k in alloc for x in (F.lit(k), F.lit(thresh[k]))])
        cand = (
            df.withColumn("__sk", skey)
            .filter(F.substring(key, 1, 16) <= tmap[F.col("__sk")])
            .withColumn("__rn", F.row_number().over(
                W.partitionBy("__sk").orderBy(key)))
            .withColumn("__q", quota[F.col("__sk")])
            .filter(F.col("__rn") <= F.col("__q"))
        # lazy: the per-stratum count below aggregates every partition of
        # cand, so that one action also materializes the checkpoint
        ).localCheckpoint(eager=False)
        got = {r["__sk"]: r["c"] for r in
               cand.groupBy("__sk").agg(F.count(F.lit(1)).alias("c")).collect()}
        if all(got.get(k, 0) >= min(alloc[k], counts[k]) for k in alloc):
            return cand.drop("__sk", "__rn", "__q")
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .withColumn("__q", quota[skey])
            .filter(F.col("__rn") <= F.col("__q"))
            .drop("__rn", "__q")
        )


def _global_running_uda_two_pass(tmp: DataFrame, cls: type, kwargs: dict,
                                 okeys: list[str], akeys: list[str],
                                 out_name: str, out_type: T.DataType) -> DataFrame:
    """Distributed un-partitioned running UDA (frame = unbounded preceding
    .. current row over the WHOLE table) for aggregators that implement
    merge(other) — the formulation SURVEY §7(b) calls out.

    1. Global range-sort on the order keys (repartitionByRange +
       sortWithinPartitions) — partition i holds keys <= partition i+1's.
    2. Pass 1: each partition folds its rows into one aggregator state;
       only the P pickled states (not rows) reach the driver.
    3. The driver prefix-merges states so partition i gets the combined
       state of partitions 0..i-1 (broadcast back, bytes per partition).
    4. Pass 2: each partition re-runs the running aggregation seeded with
       its prefix state and emits value() per row.

    Cost: the sorted shuffle is computed twice (pass 1 and pass 2) — the
    price of never holding more than one partition of rows in one Python
    worker, vs the groupBy(lit(1)) plan that OOMs on a 100 TB table."""
    import pandas as pd
    from pyspark import cloudpickle as pickle  # classes defined anywhere

    spark = tmp.sparkSession
    sorted_df = (tmp.repartitionByRange(*[F.col(k) for k in okeys])
                 .sortWithinPartitions(*okeys))
    pid_df = sorted_df.withColumn("__pid", F.spark_partition_id())
    init_kwargs = dict(kwargs or {})

    state_schema = T.StructType([
        T.StructField("__pid", T.IntegerType()),
        T.StructField("state", T.BinaryType()),
    ])

    def pass1(batches):
        agg, pid = cls(**init_kwargs), None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            for row in zip(*[pdf[c].tolist() for c in akeys]):
                agg.update(*row)
        if pid is not None:
            yield pd.DataFrame({"__pid": [pid], "state": [pickle.dumps(agg)]})

    states = {r["__pid"]: r["state"]
              for r in pid_df.select("__pid", *akeys)
              .mapInPandas(pass1, state_schema).collect()}

    prefixes: dict[int, bytes] = {}
    acc = None
    for pid in sorted(states):
        if acc is not None:
            prefixes[pid] = pickle.dumps(acc)
        part = pickle.loads(states[pid])
        if acc is None:
            acc = part
        else:
            acc.merge(part)
    bc = spark.sparkContext.broadcast(prefixes)

    out_schema = T.StructType(
        list(pid_df.schema.fields) + [T.StructField(out_name, out_type)]
    )

    def pass2(batches):
        agg = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if agg is None:
                pid = int(pdf["__pid"].iloc[0])
                blob = bc.value.get(pid)
                agg = pickle.loads(blob) if blob is not None else cls(**init_kwargs)
            pdf = pdf.copy()
            vals = []
            for row in zip(*[pdf[c].tolist() for c in akeys]):
                agg.update(*row)
                vals.append(agg.value())
            pdf[out_name] = vals
            yield pdf

    return pid_df.mapInPandas(pass2, out_schema).drop("__pid")


def _as_df(q: "Query | TableRef") -> DataFrame:
    return q.df()


def _expr_key(e: Expr) -> tuple:
    """Structural identity key for expr matching (the reference gives every
    Expr a content-derived id for CSE — reference tests/test_query.py:333)."""
    from ..exprs import ArithmeticExpr, Comparison, JsonPath, Literal

    if isinstance(e, ColumnRef):
        return ("col", e.name, id(e.tbl) if e.tbl else None)
    if isinstance(e, Literal):
        return ("lit", repr(e.val))
    if isinstance(e, AliasedExpr):
        return _expr_key(e.components[0])
    op = getattr(e, "op", None)
    path = tuple(getattr(e, "path", ()) or ())
    fn = getattr(e, "fn", None)
    return (
        type(e).__name__,
        op,
        path,
        fn.name if fn is not None and hasattr(fn, "name") else None,
        tuple(_expr_key(c) for c in e.components),
    )

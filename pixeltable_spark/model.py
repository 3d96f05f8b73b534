"""Declarative table models — the reference's ``model_base`` surface
(reference catalog/model.py:31 Column spec, :1468 model_base with
create_all / diff_all / update_all migration machinery), re-expressed
for this engine:

    Base = pxt.model_base()

    class Docs(Base, name="docs"):
        doc_id = pxt.Column(pxt.Int(False), primary_key=True)
        text = pxt.Column(pxt.String())
        n_chars = pxt.Column(value=lambda t: t.text.len())

    Base.create_all(catalog)      # creates missing tables only
    Base.diff_all(catalog)        # report drift, change nothing
    Base.update_all(catalog)      # add new columns; drops need
                                  # allow_destructive=True

Computed columns declare their expression as ``value=lambda t: ...``
where ``t`` is the live TableRef at bind time (the engine's ColumnRef
exprs are name-bound, so no separate placeholder class is needed — the
reference uses ModelColumnRef for the same purpose). Each model class
forwards the Table API (insert/select/where/count/... — the
reference's FORWARDED_TABLE_METHODS) to its bound table.

Scope notes vs the reference: ViewModel (declarative views) and
declarative embedding-index specs are not modeled yet; schema updates
cover add/drop of plain and computed columns and refuse type changes
as 'unsupported', same as the reference's resolution taxonomy.
Migration cost: update_all adds of PLAIN columns without defaults are
metadata-only commits (O(1) at any table size); adds of COMPUTED
columns (``value=...``) backfill the expression via
``add_computed_column``, which writes the new column's data — a full
pass over the table, budget accordingly on large tables."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

from .exceptions import Error
from .type_system import ColumnType

FORWARDED_TABLE_METHODS = (
    "batch_update", "collect", "count", "cursor", "delete", "describe",
    "distinct", "get_metadata", "get_versions", "group_by", "head",
    "insert", "join", "limit", "list_views", "order_by",
    "recompute_columns", "sample", "select", "show", "tail", "update",
    "where",
)


@dataclasses.dataclass(frozen=True)
class Column:
    """A column specification for model definitions AND for
    ``create_table`` schema dicts (reference catalog/model.py:31).
    Exactly one of `type` or `value` must be given; `value` is either
    an Expr or a one-argument callable receiving the table's ref."""

    type: Any = None
    value: Any = None
    primary_key: bool = False
    comment: Optional[str] = None
    on_error: str = "abort"

    def __post_init__(self):
        if (self.type is None) == (self.value is None):
            raise ValueError(
                "Column: exactly one of `type` or `value` must be given")

    def col_type(self) -> Optional[ColumnType]:
        if self.type is None:
            return None
        t = self.type
        return t() if callable(t) and not isinstance(t, ColumnType) else t


def _bind_value(spec: Column, table):
    """Resolve a computed-column spec's expression against the live
    table (callable specs receive the TableRef)."""
    from .exprs import Expr
    v = spec.value
    if isinstance(v, Expr):
        return v
    if callable(v):
        return v(table.ref())
    return v


class _ModelMeta(type):
    """Collects Column attributes in declaration order and registers
    the model with its base's registry."""

    def __new__(mcls, cls_name, bases, ns, name: str = ""):
        cols = {k: v for k, v in ns.items() if isinstance(v, Column)}
        cls = super().__new__(mcls, cls_name, bases,
                              {k: v for k, v in ns.items()
                               if k not in cols})
        cls.__model_columns__ = cols
        cls.__table_name__ = name or ns.get("__table_name__", "")
        cls.__bound_table__ = None
        reg = getattr(cls, "__registered_models__", None)
        if reg is not None and cols:
            if not cls.__table_name__:
                raise Error(
                    f"model {cls_name}: pass a table name "
                    f"(class {cls_name}(Base, name='...'))")
            reg[cls.__table_name__] = cls
        return cls

    def __init__(cls, cls_name, bases, ns, name: str = ""):
        super().__init__(cls_name, bases, ns)

    # -- table binding ---------------------------------------------------
    def _bind(cls, catalog):
        cls.__bound_table__ = catalog.get_table(cls.__table_name__)
        return cls.__bound_table__

    def _table(cls):
        if cls.__bound_table__ is None:
            raise Error(f"model {cls.__name__}: not bound — call "
                        "Base.create_all(catalog) or Base.bind_all(catalog)")
        return cls.__bound_table__

    def __getattr__(cls, item):
        if item in FORWARDED_TABLE_METHODS:
            return getattr(cls._table(), item)
        if item in getattr(cls, "__model_columns__", {}):
            return getattr(cls._table().ref(), item)
        raise AttributeError(item)

    # -- spec <-> live diff ------------------------------------------------
    def _diff(cls, catalog) -> dict:
        from .exceptions import NotFoundError
        try:
            t = catalog.get_table(cls.__table_name__)
        except NotFoundError:
            return {"exists": False, "resolution": "create", "changes": []}
        live_plain = dict(t.schema)
        live_computed = set(t.computed)
        changes = []
        resolution = "up_to_date"
        for name, spec in cls.__model_columns__.items():
            if spec.value is not None:
                if name not in live_computed and name not in live_plain:
                    changes.append({"kind": "column", "op": "add",
                                    "name": name, "computed": True})
            else:
                want = spec.col_type()
                if name not in live_plain and name not in live_computed:
                    changes.append({"kind": "column", "op": "add",
                                    "name": name, "computed": False})
                elif name in live_plain \
                        and live_plain[name].kind != want.kind:
                    changes.append({"kind": "column", "op": "alter",
                                    "name": name,
                                    "live": live_plain[name].kind.name,
                                    "model": want.kind.name})
                    resolution = "unsupported"
        model_names = set(cls.__model_columns__)
        for name in list(live_plain) + sorted(live_computed):
            if name not in model_names:
                changes.append({"kind": "column", "op": "drop",
                                "name": name})
        if changes and resolution == "up_to_date":
            resolution = "update"
        return {"exists": True, "resolution": resolution,
                "changes": changes}

    def _create(cls, catalog):
        """Create the table from the model spec (plain columns +
        primary key first, computed columns bound after). Returns
        (table, created_now)."""
        from .exceptions import NotFoundError
        try:
            t = catalog.get_table(cls.__table_name__)
            cls.__bound_table__ = t
            return t, False
        except NotFoundError:
            pass
        schema = {}
        pk = []
        computed = []
        for name, spec in cls.__model_columns__.items():
            if spec.value is not None:
                computed.append((name, spec))
            else:
                schema[name] = spec.col_type()
                if spec.primary_key:
                    pk.append(name)
        t = catalog.create_table(cls.__table_name__, schema,
                                 primary_key=pk)
        for name, spec in computed:
            t.add_computed_column(name, _bind_value(spec, t),
                                  on_error=spec.on_error)
        cls.__bound_table__ = t
        return t, True


def model_base(cls_name: str = "TableModel") -> type:
    """A fresh declarative base with its own model registry (reference
    catalog/model.py:1468). Class-level operations:

    * ``create_all(catalog)`` — create missing tables; REFUSES when an
      existing table drifts from its model (use update_all).
    * ``get_model_diff(catalog)`` / ``diff_all(catalog)`` — report.
    * ``update_all(catalog, allow_destructive=False)`` — add model-new
      columns (metadata-only commits); drop model-removed columns only
      under ``allow_destructive=True``; type changes refuse as
      unsupported.
    * ``bind_all(catalog)`` — attach already-created tables.
    """
    registry: dict[str, _ModelMeta] = {}

    def create_all(catalog):
        diffs = {n: m._diff(catalog) for n, m in registry.items()}
        drifted = {n: d for n, d in diffs.items()
                   if d["exists"] and d["resolution"] != "up_to_date"}
        if drifted:
            detail = "; ".join(
                f"{n}: {[c['op'] + ':' + c['name'] for c in d['changes']]}"
                for n, d in drifted.items())
            raise Error(
                "create_all: existing tables differ from their models "
                f"({detail}); call update_all() to modify them")
        created, existed = [], []
        for m in registry.values():
            _t, was_created = m._create(catalog)
            (created if was_created else existed).append(
                m.__table_name__)
        return created, existed

    def get_model_diff(catalog) -> dict:
        return {n: m._diff(catalog) for n, m in registry.items()}

    def diff_all(catalog) -> list:
        lines = []
        for n, d in get_model_diff(catalog).items():
            if not d["exists"]:
                lines.append(f"{n}: MISSING (create_all will create it)")
            for c in d["changes"]:
                lines.append(f"{n}: {c['op']} column {c['name']!r}"
                             + (f" ({c.get('live')} -> {c.get('model')})"
                                if c["op"] == "alter" else ""))
        return lines or ["Catalog is up to date."]

    def update_all(catalog, *, allow_destructive: bool = False):
        diffs = get_model_diff(catalog)
        unsupported = {n: d for n, d in diffs.items()
                       if d["resolution"] == "unsupported"}
        if unsupported:
            raise Error(
                "update_all: type changes are unsupported — adjust the "
                f"table or the model: { {n: d['changes'] for n, d in unsupported.items()} }")
        drops = [(n, c) for n, d in diffs.items() if d["exists"]
                 for c in d["changes"] if c["op"] == "drop"]
        if drops and not allow_destructive:
            raise Error(
                f"update_all: would DROP columns {[(n, c['name']) for n, c in drops]}; "
                "pass allow_destructive=True to proceed")
        applied = []
        for n, m in registry.items():
            d = diffs[n]
            if not d["exists"]:
                m._create(catalog)
                applied.append(f"create {n}")
                continue
            t = m._bind(catalog)
            for c in d["changes"]:
                if c["op"] == "add":
                    spec = m.__model_columns__[c["name"]]
                    if c["computed"]:
                        t.add_computed_column(
                            c["name"], _bind_value(spec, t),
                            on_error=spec.on_error)
                    else:
                        t.add_column(c["name"], spec.col_type())
                    applied.append(f"add {n}.{c['name']}")
                elif c["op"] == "drop":
                    t.drop_column(c["name"])
                    applied.append(f"drop {n}.{c['name']}")
        return applied

    def bind_all(catalog):
        for m in registry.values():
            m._bind(catalog)

    base = _ModelMeta(cls_name, (), {
        "__registered_models__": None,   # set below: only SUBCLASSES register
        "create_all": staticmethod(create_all),
        "update_all": staticmethod(update_all),
        "diff_all": staticmethod(diff_all),
        "get_model_diff": staticmethod(get_model_diff),
        "bind_all": staticmethod(bind_all),
    })
    base.__registered_models__ = registry
    return base

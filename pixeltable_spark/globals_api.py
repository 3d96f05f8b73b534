"""Module-level convenience API mirroring the reference's
``pixeltable/globals.py`` surface: a process-wide default catalog behind
``init()``, with ``create_table / get_table / create_view / ls / move``
etc. as top-level functions, so a reference user's

    import pixeltable_spark as pxt
    pxt.init()
    t = pxt.create_table('films', {'name': pxt.String, 'revenue': pxt.Float})
    pxt.create_view('hits', t.where(...))          # via catalog create_view
    pxt.ls()

works verbatim. Every function delegates to one shared ``Catalog``
(auto-``init()`` on first use, like the reference's implicit Env init).
Also hosts the tool-surface sugar: ``tool()`` (reference
globals.py:1118), ``retrieval_udf`` (reference
func/query_template_function.py:193) and ``expr_udf``
(reference func/udf.py:267) over the engine's expression templates.
"""

from __future__ import annotations

import inspect
import os
from typing import Any, Callable, Iterable, Optional, Sequence

from .catalog import Catalog, Snapshot, Table, View
from .exceptions import ErrorCode, RequestError
from .functions.query_template import QueryTemplate, Tool
from .session import get_session
from .type_system import ColumnType

_catalog: Optional[Catalog] = None


def home() -> str:
    """Root directory of the default catalog's store (config section
    ``core``, key ``home``; env PIXELTABLE_SPARK_HOME wins)."""
    from .config import get_config
    return str(get_config().get(
        "core", "home",
        os.path.join(os.path.expanduser("~"), ".pixeltable_spark", "store"),
        env="PIXELTABLE_SPARK_HOME"))


def init(spark=None, home_dir: Optional[str] = None) -> Catalog:
    """Create (or return) the process-wide default catalog. ``spark``
    defaults to the engine session; ``home_dir`` to :func:`home`."""
    global _catalog
    if _catalog is None or home_dir is not None or spark is not None:
        spark = spark or get_session()
        root = home_dir or home()
        os.makedirs(root, exist_ok=True)
        _catalog = Catalog(spark, root)
    return _catalog


def _cat() -> Catalog:
    return _catalog if _catalog is not None else init()


# -- catalog delegates (reference globals.py create_table etc.) -------------

def create_table(name: str, schema: dict[str, ColumnType], **kw: Any) -> Table:
    return _cat().create_table(name, schema, **kw)


def get_table(name: str) -> Table:
    return _cat().get_table(name)


def drop_table(name: str) -> None:
    _cat().drop_table(name)


def list_tables() -> list[str]:
    return _cat().list_tables()


def create_view(name: str, base: Table, **kw: Any) -> View:
    return _cat().create_view(name, base, **kw)


def create_snapshot(name: str, base: Table) -> Snapshot:
    return _cat().create_snapshot(name, base)


def create_rollup(name: str, base: Table, group_by, aggs, **kw: Any):
    """Incrementally-maintained aggregate view (catalog
    create_rollup): delta-affected groups only, any aggregate, MVCC
    time travel."""
    return _cat().create_rollup(name, base, group_by, aggs, **kw)


def create_dir(path: str) -> None:
    _cat().create_dir(path)


def drop_dir(path: str, force: bool = False) -> None:
    _cat().drop_dir(path, force=force)


def list_dirs(path: str = "", recursive: bool = True) -> list[str]:
    return _cat().list_dirs(path, recursive=recursive)


def get_dir_contents(path: str = "", recursive: bool = False):
    return _cat().get_dir_contents(path, recursive=recursive)


def get_dir_tree(path: str = "") -> dict:
    return _cat().get_dir_tree(path)


def ls(path: str = "") -> list[dict]:
    return _cat().ls(path)


def move(src: str, dst: str) -> None:
    _cat().move(src, dst)


def list_functions() -> list[str]:
    """Names of every registered scalar/aggregate function (the
    reference lists its FunctionRegistry; ours is the functions
    namespace registry)."""
    from . import functions as pxtf
    out = []
    for mod_name in dir(pxtf):
        mod = getattr(pxtf, mod_name)
        if hasattr(mod, "__dict__") and not callable(mod):
            for fname, f in vars(mod).items():
                if type(f).__name__ == "Function":
                    out.append(f"{mod_name}.{fname}")
        elif type(mod).__name__ == "Function":
            out.append(mod_name)
    return sorted(set(out))


# -- tool surface (reference globals.py:1078-1118, func/tools.py) -----------

def tool(fn: Callable, name: Optional[str] = None,
         description: Optional[str] = None) -> Tool:
    """Wrap ONE udf/query template as an LLM tool (reference
    globals.py:1118)."""
    return Tool(fn, name=name, description=description)


def retrieval_udf(table: Table, name: Optional[str] = None,
                  description: Optional[str] = None,
                  parameters: Optional[Iterable[str]] = None,
                  limit: Optional[int] = 10) -> QueryTemplate:
    """Equality-match retrieval template over a table (reference
    func/query_template_function.py:193): parameters are data columns;
    calling it returns the matching rows as a list of dicts (the RAG /
    tool-calling dataset primitive)."""
    from pyspark.sql import functions as F

    all_cols = list(table.schema) + list(table.computed)
    data_cols = (list(table.schema) if parameters is None
                 else list(parameters))
    for p in data_cols:
        if p not in all_cols:
            raise RequestError(
                ErrorCode.INVALID_CONFIGURATION,
                f"parameter {p!r} is not a column of table {table.name!r}")
    if not data_cols:
        raise RequestError(ErrorCode.MISSING_REQUIRED,
                           "Parameter list cannot be empty.")

    def fetch(**kwargs: Any) -> list[dict]:
        df = table.user_df()
        for p in data_cols:
            if p not in kwargs:
                raise RequestError(ErrorCode.MISSING_REQUIRED,
                                   f"missing parameter {p!r}")
            df = df.filter(F.col(p).eqNullSafe(F.lit(kwargs[p])))
        if limit is not None:
            df = df.limit(limit)
        return [r.asDict(recursive=True) for r in df.collect()]

    fetch.__name__ = name or table.name
    fetch.__doc__ = description or (
        f"Retrieves entries from the dataset {name or table.name!r} "
        "matching the given parameters.\n\nParameters:\n" + "\n".join(
            f"    {c}" for c in data_cols))
    fetch.__signature__ = inspect.Signature([
        inspect.Parameter(c, inspect.Parameter.POSITIONAL_OR_KEYWORD)
        for c in data_cols])
    return QueryTemplate(fetch)


def expr_udf(py_fn: Optional[Callable] = None, *,
             param_types: Optional[Sequence[ColumnType]] = None):
    """Expression-template decorator (reference func/udf.py:267
    ExprTemplateFunction): the decorated body is called ONCE with
    engine expression placeholders and must return an Expr; each later
    call substitutes the arguments into that template — a macro, not a
    Python UDF, so the result stays JVM-compilable."""
    def make(fn: Callable):
        sig = inspect.signature(fn)

        def template(*args: Any, **kwargs: Any):
            bound = sig.bind(*args, **kwargs)
            return fn(*bound.args, **bound.kwargs)

        template.__name__ = fn.__name__
        template.__doc__ = fn.__doc__
        template.is_expr_template = True
        return template

    if py_fn is not None:
        return make(py_fn)
    return make

def array(elements) -> "InlineArray":
    """Array-literal expression from an iterable (reference
    globals.py:1138 — sugar over the InlineArray constructor)."""
    from .exprs import InlineArray
    return InlineArray(list(elements))


class Required:
    """Schema marker for a non-nullable column (reference
    type_system.py:1872): ``{"name": pxt.Required(pxt.String)}`` ==
    ``{"name": pxt.String(False)}``."""

    def __init__(self, t):
        self.t = t

    def __call__(self):
        import copy
        if callable(self.t) and not hasattr(self.t, "kind"):
            ct = self.t()
        else:
            ct = copy.copy(self.t)  # never mutate a caller-owned instance
        ct.nullable = False
        return ct


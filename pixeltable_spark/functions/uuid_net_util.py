"""uuid / net / util function modules (reference functions/uuid.py,
net.py, util.py) — small helpers, native Spark where possible."""

from __future__ import annotations

import urllib.parse as _up
import uuid as _uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exprs import Function
from ..type_system import ColumnType

_STR = ColumnType.string()
_JSON = ColumnType.json()

# uuid --------------------------------------------------------------------
uuid4 = Function("uuid4", ColumnType.uuid(), spark_fn=lambda: F.expr("uuid()"))
uuid5 = Function(
    "uuid5", ColumnType.uuid(), spark_fn=None,
    py_fn=lambda name, namespace=None: str(
        _uuid.uuid5(_uuid.UUID(namespace) if namespace else _uuid.NAMESPACE_DNS, name)),
)
is_uuid = Function(
    "is_uuid", ColumnType.bool_(),
    spark_fn=lambda s: s.rlike(
        "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
    py_fn=lambda s: _is_uuid_py(s),
)


def _is_uuid_py(s: str) -> bool:
    try:
        _uuid.UUID(s)
        return True
    except (ValueError, AttributeError, TypeError):
        return False


# net ---------------------------------------------------------------------
url_host = Function("url_host", _STR,
                    spark_fn=lambda u: F.parse_url(u, F.lit("HOST")),
                    py_fn=lambda u: _up.urlparse(u).hostname)
url_path = Function("url_path", _STR,
                    spark_fn=lambda u: F.parse_url(u, F.lit("PATH")),
                    py_fn=lambda u: _up.urlparse(u).path)
url_query = Function("url_query", _STR,
                     spark_fn=lambda u: F.parse_url(u, F.lit("QUERY")),
                     py_fn=lambda u: _up.urlparse(u).query)
url_scheme = Function("url_scheme", _STR,
                      spark_fn=lambda u: F.parse_url(u, F.lit("PROTOCOL")),
                      py_fn=lambda u: _up.urlparse(u).scheme)
url_encode = Function("url_encode", _STR, spark_fn=None,
                      py_fn=lambda s: _up.quote(s, safe=""))
url_decode = Function("url_decode", _STR,
                      spark_fn=lambda s: F.url_decode(s),
                      py_fn=lambda s: _up.unquote(s))

# util --------------------------------------------------------------------
coalesce = Function("coalesce", _JSON, spark_fn=lambda *cols: F.coalesce(*cols),
                    py_fn=lambda *vals: next((v for v in vals if v is not None), None))
greatest = Function("greatest", ColumnType.float_(),
                    spark_fn=lambda *cols: F.greatest(*cols),
                    py_fn=lambda *vals: max(vals))
least = Function("least", ColumnType.float_(),
                 spark_fn=lambda *cols: F.least(*cols),
                 py_fn=lambda *vals: min(vals))
ifnull = Function("ifnull", _JSON, spark_fn=lambda a, b: F.coalesce(a, b),
                  py_fn=lambda a, b: a if a is not None else b)
md5_hex = Function("md5_hex", _STR, spark_fn=lambda c: F.md5(c.cast(T.StringType())),
                   py_fn=lambda v: __import__("hashlib").md5(str(v).encode()).hexdigest())

"""pixeltable_spark — a PySpark-native engine with the query and
data-processing capabilities of pixeltable/pixeltable (reference at
/root/reference, studied not copied; see SURVEY.md).

Public API shape mirrors the reference's ``pxt`` / ``pxtf`` surface:

    import pixeltable_spark as pxt
    from pixeltable_spark import functions as pxtf

    t = pxt.table_from_parquet(spark, ".../lineitem.parquet")
    (t.where(t.l_shipdate <= datetime(1998, 9, 2))
      .group_by(t.l_returnflag)
      .select(t.l_returnflag, sum_qty=pxtf.sum(t.l_quantity))
      .order_by(t.l_returnflag)
      .collect())
"""

from .exprs import Expr, Literal, ColumnRef, InlineArray, InlineDict, R
from .plans.query import Query, TableRef, SampleClause
from .session import get_session
from .sources.registry import (
    load_sf_tables,
    table_from_csv,
    table_from_json,
    table_from_pandas,
    table_from_parquet,
    table_from_rows,
)
from .type_system import ArrayType, ColumnType, TypeKind
from .functions.udf import udf, uda, Aggregator, iterator, IteratorFn
from .catalog import Catalog, Table, View, Snapshot
InsertableTable = Table  # reference-name alias (catalog/__init__.py)
from .table_metadata import (ColumnMetadata, IndexMetadata, TableMetadata,
                             UpdateStatus, VersionMetadata)
from .exceptions import (
    AlreadyExistsError,
    AuthorizationError,
    ConcurrencyError,
    EngineWarning,
    Error,
    PixeltableWarning,
    ErrorCode,
    ExternalServiceError,
    NotFoundError,
    RequestError,
    ServiceUnavailableError,
)
from .functions.query_template import (Tool, ToolChoice, Tools,
                                       invoke_tools, mcp_udfs, query,
                                       tools)
from .globals_api import (
    Required,
    array,
    create_dir,
    create_snapshot,
    create_table,
    create_rollup,
    create_view,
    drop_dir,
    drop_table,
    expr_udf,
    get_dir_contents,
    get_dir_tree,
    get_table,
    home,
    init,
    list_dirs,
    list_functions,
    list_tables,
    ls,
    move,
    retrieval_udf,
    tool,
)
from .exprs import Function
from .index import EmbeddingIndex, add_embedding_index, drop_embedding_index
from .iterators import ComponentIterator as PxtIterator
from .model import Column, model_base
from .types import (DirContents, DirectoryNode, TableKind, TableNode,
                    TreeNode)
from .results import ResultCursor, ResultSet, Row
from . import iterators  # noqa: F401 — reference import-path parity
from .serving import TableServer, serve
from .sources import io

String = ColumnType.string
Int = ColumnType.int_
Float = ColumnType.float_
Bool = ColumnType.bool_
Timestamp = ColumnType.timestamp
Date = ColumnType.date
Json = ColumnType.json
Array = ColumnType.array
Binary = ColumnType.binary
Image = ColumnType.image
Video = ColumnType.video
Audio = ColumnType.audio
Document = ColumnType.document
UUID = ColumnType.uuid

__version__ = "0.1.0"

__all__ = [
    "Expr", "Literal", "ColumnRef", "InlineArray", "InlineDict", "R",
    "Query", "TableRef", "SampleClause", "get_session",
    "ResultSet", "ResultCursor", "Row", "UUID",
    "table_from_parquet", "table_from_csv", "table_from_json",
    "table_from_pandas", "table_from_rows", "load_sf_tables",
    "ColumnType", "ArrayType", "TypeKind", "udf", "uda", "Aggregator",
    "iterator", "IteratorFn",
    "Catalog", "Table", "View", "Snapshot",
    "ColumnMetadata", "IndexMetadata", "TableMetadata", "UpdateStatus",
    "VersionMetadata",
    "EmbeddingIndex", "add_embedding_index", "drop_embedding_index", "io",
    "TableServer", "serve",
    "Error", "ErrorCode", "NotFoundError", "AlreadyExistsError",
    "RequestError", "ConcurrencyError", "ExternalServiceError",
    "AuthorizationError", "ServiceUnavailableError", "EngineWarning",
    "init", "home", "create_table", "get_table", "drop_table",
    "list_tables", "create_view", "create_rollup", "create_snapshot", "create_dir",
    "drop_dir", "list_dirs", "get_dir_contents", "get_dir_tree", "ls",
    "move", "list_functions", "tool", "tools", "invoke_tools", "query",
    "mcp_udfs", "retrieval_udf", "expr_udf", "Tool", "array", "Required",
    "String", "Int", "Float", "Bool", "Timestamp", "Date", "Json", "Array",
    "Binary", "Image", "Video", "Audio", "Document",
    # reference top-level parity (round 10)
    "Column", "model_base", "InsertableTable", "PixeltableWarning",
    "Function", "PxtIterator", "Tools", "ToolChoice",
    "TableKind", "TableNode", "DirectoryNode", "TreeNode", "DirContents",
]

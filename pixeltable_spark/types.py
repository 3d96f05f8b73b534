"""User-facing type aliases for catalog introspection — the reference's
``pixeltable/types.py`` public contract (TableKind / TreeNode /
DirContents shapes returned by ``get_dir_tree`` / ``get_dir_contents``;
these field names ARE the API)."""

from __future__ import annotations

from typing import Literal, Optional, TypedDict, Union

TableKind = Literal["table", "view", "snapshot"]


class DirectoryNode(TypedDict):
    """A directory entry in a get_dir_tree() result."""

    name: str
    path: str
    kind: Literal["directory"]
    entries: list["TreeNode"]


class TableNode(TypedDict):
    """A table/view/snapshot entry in a get_dir_tree() result."""

    name: str
    path: str
    kind: TableKind
    version: Optional[int]
    error_count: int
    base: Optional[str]


TreeNode = Union[DirectoryNode, TableNode]


class DirContents(TypedDict):
    """get_dir_contents() result: names grouped by kind."""

    dirs: list[str]
    tables: list[str]

"""Column type system: declared, nullable-aware types mapped onto Spark types.

Reproduces the capability surface of the reference type system
(reference: pixeltable/type_system.py:43-60 enum, :843-1851 classes):
String/Int/Float/Bool/Timestamp/Date/UUID/Binary/Json/Array/Image/Video/
Audio/Document, with nullability as part of the type and the numeric
supertype lattice BOOL < INT < FLOAT (reference type_system.py:85-101).

Spark-first design: every ColumnType knows its ``pyspark.sql.types.DataType``;
media types are by-reference (a cell stores a file path/URL as a string,
optionally with a binary payload column) — the idiomatic Spark layout for
multimodal data at 100 TB, where the bytes live in object storage and
executors fetch them inside Arrow-batched UDFs.
"""

from __future__ import annotations

import datetime
import enum
from typing import Any, Optional

from pyspark.sql import types as T


class TypeKind(enum.Enum):
    STRING = 0
    INT = 1
    FLOAT = 2
    BOOL = 3
    TIMESTAMP = 4
    DATE = 5
    UUID = 6
    BINARY = 7
    JSON = 8
    ARRAY = 9
    IMAGE = 10
    VIDEO = 11
    AUDIO = 12
    DOCUMENT = 13
    INVALID = 14


# numeric supertype lattice: BOOL < INT < FLOAT (reference type_system.py:85-89)
_NUMERIC_ORDER = {TypeKind.BOOL: 0, TypeKind.INT: 1, TypeKind.FLOAT: 2}

# media kinds are by-reference: cell value is a path/URL string
_MEDIA_KINDS = {TypeKind.IMAGE, TypeKind.VIDEO, TypeKind.AUDIO, TypeKind.DOCUMENT}


class ColumnType:
    """A declared column type with nullability."""

    def __init__(self, kind: TypeKind, nullable: bool = True):
        self.kind = kind
        self.nullable = nullable

    # ---- constructors ----------------------------------------------------
    @classmethod
    def string(cls, nullable: bool = True) -> "ColumnType":
        return cls(TypeKind.STRING, nullable)

    @classmethod
    def int_(cls, nullable: bool = True) -> "ColumnType":
        return cls(TypeKind.INT, nullable)

    @classmethod
    def float_(cls, nullable: bool = True) -> "ColumnType":
        return cls(TypeKind.FLOAT, nullable)

    @classmethod
    def bool_(cls, nullable: bool = True) -> "ColumnType":
        return cls(TypeKind.BOOL, nullable)

    @classmethod
    def timestamp(cls, nullable: bool = True) -> "ColumnType":
        return cls(TypeKind.TIMESTAMP, nullable)

    @classmethod
    def date(cls, nullable: bool = True) -> "ColumnType":
        return cls(TypeKind.DATE, nullable)

    @classmethod
    def uuid(cls, nullable: bool = True) -> "ColumnType":
        return cls(TypeKind.UUID, nullable)

    @classmethod
    def binary(cls, nullable: bool = True) -> "ColumnType":
        return cls(TypeKind.BINARY, nullable)

    @classmethod
    def json(cls, nullable: bool = True,
             fields: Optional[dict] = None) -> "ColumnType":
        """JSON value; `fields` optionally declares a structural schema
        (name -> ColumnType, nesting allowed) — the reference's
        TypedDict/pydantic-derived JSON schemas (type_system.py:497-533).
        With a schema, JsonPath extraction resolves to the declared type
        (typed columns, no explicit astype)."""
        if fields is not None:
            return JsonType(fields, nullable)
        return cls(TypeKind.JSON, nullable)

    @classmethod
    def array(
        cls,
        element: Optional["ColumnType"] = None,
        shape: Optional[tuple] = None,
        nullable: bool = True,
    ) -> "ArrayType":
        return ArrayType(element or cls.float_(), shape, nullable)

    @classmethod
    def image(cls, nullable: bool = True) -> "ColumnType":
        return cls(TypeKind.IMAGE, nullable)

    @classmethod
    def video(cls, nullable: bool = True) -> "ColumnType":
        return cls(TypeKind.VIDEO, nullable)

    @classmethod
    def audio(cls, nullable: bool = True) -> "ColumnType":
        return cls(TypeKind.AUDIO, nullable)

    @classmethod
    def document(cls, nullable: bool = True) -> "ColumnType":
        return cls(TypeKind.DOCUMENT, nullable)

    @classmethod
    def invalid(cls) -> "ColumnType":
        return cls(TypeKind.INVALID, True)

    # ---- predicates ------------------------------------------------------
    @property
    def is_numeric(self) -> bool:
        return self.kind in _NUMERIC_ORDER

    @property
    def is_media(self) -> bool:
        return self.kind in _MEDIA_KINDS

    @property
    def is_json(self) -> bool:
        return self.kind == TypeKind.JSON

    @property
    def is_string(self) -> bool:
        return self.kind == TypeKind.STRING

    # ---- lattice ---------------------------------------------------------
    def supertype(self, other: "ColumnType") -> Optional["ColumnType"]:
        """Common supertype per the numeric lattice; None if incompatible."""
        nullable = self.nullable or other.nullable
        if self.kind == other.kind:
            return ColumnType(self.kind, nullable)
        if self.is_numeric and other.is_numeric:
            k = self.kind if _NUMERIC_ORDER[self.kind] >= _NUMERIC_ORDER[other.kind] else other.kind
            return ColumnType(k, nullable)
        if self.kind == TypeKind.JSON or other.kind == TypeKind.JSON:
            return ColumnType(TypeKind.JSON, nullable)
        return None

    # ---- Spark mapping ---------------------------------------------------
    def spark_type(self) -> T.DataType:
        k = self.kind
        if k == TypeKind.STRING:
            return T.StringType()
        if k == TypeKind.INT:
            return T.LongType()
        if k == TypeKind.FLOAT:
            return T.DoubleType()
        if k == TypeKind.BOOL:
            return T.BooleanType()
        if k == TypeKind.TIMESTAMP:
            return T.TimestampType()
        if k == TypeKind.DATE:
            return T.DateType()
        if k == TypeKind.UUID:
            return T.StringType()
        if k == TypeKind.BINARY:
            return T.BinaryType()
        if k == TypeKind.JSON:
            # JSON travels as string; structured access via get_json_object /
            # from_json when a schema is known (SURVEY §1.3)
            return T.StringType()
        if k in _MEDIA_KINDS:
            # by-reference media: file path / URL
            return T.StringType()
        raise ValueError(f"no spark type for {k}")

    @classmethod
    def from_spark(cls, dt: T.DataType, nullable: bool = True) -> "ColumnType":
        if isinstance(dt, T.StringType):
            return cls.string(nullable)
        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            return cls.int_(nullable)
        if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
            return cls.float_(nullable)
        if isinstance(dt, T.BooleanType):
            return cls.bool_(nullable)
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return cls.timestamp(nullable)
        if isinstance(dt, T.DateType):
            return cls.date(nullable)
        if isinstance(dt, T.BinaryType):
            return cls.binary(nullable)
        if isinstance(dt, T.ArrayType):
            return ArrayType(cls.from_spark(dt.elementType), None, nullable)
        if isinstance(dt, (T.MapType, T.StructType)):
            return cls.json(nullable)
        return cls.string(nullable)

    @classmethod
    def infer_literal(cls, v: Any) -> "ColumnType":
        if v is None:
            return cls.string(True)
        if isinstance(v, bool):
            return cls.bool_(False)
        if isinstance(v, int):
            return cls.int_(False)
        if isinstance(v, float):
            return cls.float_(False)
        if isinstance(v, str):
            return cls.string(False)
        if isinstance(v, bytes):
            return cls.binary(False)
        if isinstance(v, datetime.datetime):
            return cls.timestamp(False)
        if isinstance(v, datetime.date):
            return cls.date(False)
        if isinstance(v, (list, tuple)):
            if v and all(isinstance(x, (int, float)) for x in v):
                el = cls.float_() if any(isinstance(x, float) for x in v) else cls.int_()
                return ArrayType(el, (len(v),), False)
            return cls.json(False)
        if isinstance(v, dict):
            return cls.json(False)
        return cls.json(False)

    # ---- persistence round-trip (reference type_system as_dict/from_dict) -
    def as_dict(self) -> dict:
        return {"kind": self.kind.name, "nullable": self.nullable}

    @classmethod
    def from_dict(cls, d: Any) -> "ColumnType":
        # legacy format: (kind_name, nullable) pair
        if isinstance(d, (list, tuple)):
            return cls(TypeKind[d[0]], d[1])
        if d["kind"] == TypeKind.ARRAY.name:
            shape = tuple(d["shape"]) if d.get("shape") is not None else None
            return ArrayType(cls.from_dict(d["element"]), shape, d["nullable"])
        if d["kind"] == TypeKind.JSON.name and d.get("fields") is not None:
            return JsonType({k: cls.from_dict(v) for k, v in d["fields"].items()},
                            d["nullable"])
        return cls(TypeKind[d["kind"]], d["nullable"])

    def __repr__(self) -> str:
        n = "" if self.nullable else " NOT NULL"
        return f"{self.kind.name}{n}"

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, ColumnType)
            and self.kind == other.kind
            and self.nullable == other.nullable
        )

    def __hash__(self) -> int:
        return hash((self.kind, self.nullable))


class ArrayType(ColumnType):
    """numpy-ndarray-style array with element type and optional fixed shape
    (reference type_system.py:1466). Maps to (nested) Spark ArrayType;
    fixed-size float vectors are the embedding representation."""

    def __init__(
        self,
        element: ColumnType,
        shape: Optional[tuple] = None,
        nullable: bool = True,
    ):
        super().__init__(TypeKind.ARRAY, nullable)
        self.element = element
        self.shape = shape

    def spark_type(self) -> T.DataType:
        inner = self.element.spark_type()
        ndim = len(self.shape) if self.shape else 1
        for _ in range(ndim):
            inner = T.ArrayType(inner)
        return inner

    def as_dict(self) -> dict:
        return {
            "kind": self.kind.name,
            "nullable": self.nullable,
            "element": self.element.as_dict(),
            "shape": list(self.shape) if self.shape is not None else None,
        }

    def __repr__(self) -> str:
        return f"ARRAY<{self.element!r}>{'' if self.shape is None else self.shape}"


class JsonType(ColumnType):
    """JSON with a declared structural schema (reference
    type_system.py:497-533 json_schema support): `fields` maps key ->
    ColumnType (values may themselves be JsonType for nesting). Storage is
    still a JSON string column; the schema types path extraction."""

    def __init__(self, fields: dict, nullable: bool = True):
        super().__init__(TypeKind.JSON, nullable)
        self.fields = dict(fields)

    def field_type(self, name: str) -> Optional[ColumnType]:
        return self.fields.get(name)

    def as_dict(self) -> dict:
        return {"kind": self.kind.name, "nullable": self.nullable,
                "fields": {k: v.as_dict() for k, v in self.fields.items()}}

    def __repr__(self) -> str:
        inner = ", ".join(f"{k}: {v!r}" for k, v in self.fields.items())
        return f"JSON{{{inner}}}"


def schema_to_struct(schema: dict) -> T.StructType:
    """dict of name -> ColumnType  =>  Spark StructType."""
    return T.StructType(
        [T.StructField(name, ct.spark_type(), ct.nullable) for name, ct in schema.items()]
    )

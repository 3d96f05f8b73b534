"""Table sources: bind parquet/CSV/JSON/pandas data to typed TableRefs.

The analog of the reference's scan + import surface
(reference exec/sql_node.py:503-562 SqlScanNode; io/csv.py:18,
io/parquet.py:96, io/json.py:15, io/pandas.py:22). On Spark a "scan node"
is just spark.read.* — Catalyst handles projection/predicate pushdown into
the parquet reader, which is the part that matters at 100 TB.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..plans.query import TableRef

# Primary keys of the driver-provided testdata tables — these drive
# deterministic sampling and head/tail insertion order.
TESTDATA_ROWIDS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# JSON-typed columns in the testdata (stored as strings in parquet)
TESTDATA_JSON_COLS: dict[str, list[str]] = {"events": ["props"]}

# parquet TIMESTAMP(NANOS) columns: Spark has no nanosecond timestamp type,
# so (with spark.sql.legacy.parquet.nanosAsLong) they arrive as int64 nanos
# and get cast to microsecond timestamps here — a pure JVM-side projection.
TESTDATA_NANO_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}

# (path) -> ((mtime_ns, size), StructType): schema cache for SINGLE-FILE
# parquet sources. Constructing a reader without an explicit schema runs
# a footer-inference Spark job every time; a session that builds many
# plans over the same immutable file (the bench runs ~600 such reads)
# pays ~0.05-0.15 s each for a schema that never changes. Metadata
# caching only — the data itself is always scanned fresh; the
# (mtime, size) key invalidates on any rewrite. Directories are never
# cached (entry mtimes don't propagate reliably).
_PARQUET_SCHEMA_CACHE: dict[str, tuple] = {}


def _parquet_df(spark: SparkSession, path: str) -> DataFrame:
    import os
    try:
        st = os.stat(path)
        if not os.path.isfile(path):
            raise OSError
        key = (st.st_mtime_ns, st.st_size)
    except OSError:
        return spark.read.parquet(path)
    ent = _PARQUET_SCHEMA_CACHE.get(path)
    if ent is not None and ent[0] == key:
        return spark.read.schema(ent[1]).parquet(path)
    df = spark.read.parquet(path)
    _PARQUET_SCHEMA_CACHE[path] = (key, df.schema)
    return df


def table_from_parquet(
    spark: SparkSession,
    path: str,
    name: Optional[str] = None,
    rowid_cols: Optional[list[str]] = None,
    json_cols: Sequence[str] = (),
) -> TableRef:
    if name is None:
        name = path.rstrip("/").rsplit("/", 1)[-1].removesuffix(".parquet")
    if rowid_cols is None:
        rowid_cols = TESTDATA_ROWIDS.get(name, [])
    if not json_cols:
        json_cols = TESTDATA_JSON_COLS.get(name, [])
    # self-sufficient against sessions we didn't build (e.g. the driver's):
    # TIMESTAMP(NANOS) parquet is unreadable without this legacy conf
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp part-extraction must agree with the (TZ-naive) oracle
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # noqa: BLE001 — read-only conf in some environments
        pass
    df = _parquet_df(spark, path)
    for c in TESTDATA_NANO_TS_COLS.get(name, []):
        from pyspark.sql import functions as F
        from pyspark.sql import types as T
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, T.LongType):
            # TIMESTAMP(NANOS) under nanosAsLong → int64 nanos
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            # micros-precision NTZ parquet: normalize to TIMESTAMP so
            # unix_micros()/window() accept it — value-preserving because
            # the session TZ is pinned to UTC above
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return TableRef.from_df(df, name, rowid_cols=rowid_cols, json_cols=json_cols)


def table_from_csv(spark: SparkSession, path: str, name: str,
                   schema=None, header: bool = True, **opts) -> TableRef:
    reader = spark.read.option("header", header)
    if schema is not None:
        from ..type_system import schema_to_struct
        reader = reader.schema(schema_to_struct(schema) if isinstance(schema, dict) else schema)
    else:
        reader = reader.option("inferSchema", True)
    return TableRef.from_df(reader.csv(path, **opts), name)


def table_from_json(spark: SparkSession, path: str, name: str, schema=None) -> TableRef:
    reader = spark.read
    if schema is not None:
        from ..type_system import schema_to_struct
        reader = reader.schema(schema_to_struct(schema) if isinstance(schema, dict) else schema)
    return TableRef.from_df(reader.json(path), name)


def table_from_pandas(spark: SparkSession, pdf, name: str,
                      rowid_cols: Optional[list[str]] = None) -> TableRef:
    return TableRef.from_df(spark.createDataFrame(pdf), name, rowid_cols=rowid_cols)


def table_from_rows(spark: SparkSession, rows: list[dict], name: str,
                    schema: Optional[dict] = None,
                    rowid_cols: Optional[list[str]] = None) -> TableRef:
    """In-memory row dicts -> table (reference exec/in_memory_data_node.py)."""
    if schema is not None:
        from ..type_system import schema_to_struct
        df = spark.createDataFrame(rows, schema_to_struct(schema))
        # keep the DECLARED ColumnTypes (json vs string is invisible to Spark)
        return TableRef(df, name, dict(schema), rowid_cols or [])
    df = spark.createDataFrame(rows)
    return TableRef.from_df(df, name, rowid_cols=rowid_cols)


def load_sf_tables(spark: SparkSession, sf_dir: str) -> dict[str, TableRef]:
    """All driver testdata tables for a scale-factor directory."""
    return {
        name: table_from_parquet(spark, f"{sf_dir}/{name}.parquet", name)
        for name in TESTDATA_ROWIDS
    }


def export_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def export_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def export_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)

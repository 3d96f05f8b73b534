"""Import/export surface (reference io/, 2,756 LoC: csv.py:18,
parquet.py:96/17, json.py:15/52, pandas.py:22,57, hf_datasets.py:108,
sql.py:85/14, iceberg.py:21, lancedb.py:12; pytorch/coco export
_query.py:2002,2039).

Spark-native formats are direct reader/writer calls (distributed, pushdown-
capable). Connectors whose libraries aren't in this container (Iceberg,
LanceDB, HF hub access) are gated behind import-tries with the real call
shape documented; PyTorch/COCO export materializes executor-side to a
directory of shard files (the only scale-safe layout) with a pure-pyarrow
fallback.
"""

from __future__ import annotations

import json as _json
import os
from typing import Any, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession


# ---------------------------------------------------------------------------
# imports
# ---------------------------------------------------------------------------

def import_csv(spark: SparkSession, path: str, schema=None, header: bool = True,
               **options: Any) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        from ..type_system import schema_to_struct
        reader = reader.schema(schema_to_struct(schema) if isinstance(schema, dict) else schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path, **options)


def import_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def import_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        from ..type_system import schema_to_struct
        reader = reader.schema(schema_to_struct(schema) if isinstance(schema, dict) else schema)
    return reader.json(path)


def import_pandas(spark: SparkSession, pdf) -> DataFrame:
    return spark.createDataFrame(pdf)


def import_excel(spark: SparkSession, path: str, sheet_name=0,
                 header: bool = True) -> DataFrame:
    """Excel (.xlsx) -> DataFrame (reference io/pandas.py import_excel,
    which delegates to pandas.read_excel; here the stdlib OOXML codec
    parses cells with types — int/float/bool/str — so no pandas/openpyxl
    dependency). ``sheet_name`` is an index or sheet name; ``header``
    promotes the first row to column names. Driver-side parse (an .xlsx
    is a single small zip — same driver-bound shape as the reference)."""
    from ..functions.office_codec import xlsx_sheet_rows

    with open(path, "rb") as f:
        sheets = xlsx_sheet_rows(f.read())
    if isinstance(sheet_name, int):
        try:
            rows = list(sheets.values())[sheet_name]
        except IndexError:
            raise ValueError(f"no sheet index {sheet_name} "
                             f"(found {len(sheets)})") from None
    else:
        if sheet_name not in sheets:
            raise ValueError(f"no sheet named {sheet_name!r} "
                             f"(have {sorted(sheets)})")
        rows = sheets[sheet_name]
    if not rows:
        raise ValueError("empty sheet")
    width = max(len(r) for r in rows)
    rows = [r + [None] * (width - len(r)) for r in rows]
    if header:
        names = [str(c) if c is not None else f"col{j}"
                 for j, c in enumerate(rows[0])]
        rows = rows[1:]
    else:
        names = [f"col{j}" for j in range(width)]
    # per-column Spark type from the observed python values; mixed
    # int/float widens to double, anything else to string
    from pyspark.sql import types as T

    def col_type(j):
        kinds = {type(r[j]) for r in rows if r[j] is not None}
        if kinds <= {bool}:
            return T.BooleanType()
        if kinds <= {int}:
            return T.LongType()
        if kinds <= {int, float}:
            return T.DoubleType()
        return T.StringType()

    struct = T.StructType([T.StructField(n, col_type(j), True)
                           for j, n in enumerate(names)])
    def conv(v, dt):
        if v is None:
            return None
        if isinstance(dt, T.DoubleType):
            return float(v)
        if isinstance(dt, T.StringType):
            return str(v)
        return v
    data = [tuple(conv(r[j], struct[j].dataType) for j in range(width))
            for r in rows]
    return spark.createDataFrame(data, struct)


def import_huggingface_dataset(spark: SparkSession, dataset) -> DataFrame:
    """HF datasets -> Spark via the Arrow format
    (reference io/hf_datasets.py:108). Accepts a loaded ``datasets.Dataset``
    (the library itself isn't in this container)."""
    try:
        table = dataset.data.table  # datasets.Dataset arrow payload
    except AttributeError as e:
        raise NotImplementedError(
            "pass a huggingface datasets.Dataset; the datasets library is "
            "not installed in this environment") from e
    return spark.createDataFrame(table.to_pandas())


def import_jdbc(spark: SparkSession, url: str, table: str, **options: Any) -> DataFrame:
    """External SQL source (reference io/sql.py:85, exec/sql_data_node.py)."""
    return (spark.read.format("jdbc").option("url", url)
            .option("dbtable", table).options(**options).load())


def import_rows(spark: SparkSession, rows: list[dict], schema=None) -> DataFrame:
    from ..type_system import schema_to_struct
    if schema is not None:
        return spark.createDataFrame(rows, schema_to_struct(schema)
                                     if isinstance(schema, dict) else schema)
    return spark.createDataFrame(rows)


# ---------------------------------------------------------------------------
# exports
# ---------------------------------------------------------------------------

def export_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def export_csv(df: DataFrame, path: str, mode: str = "overwrite",
               header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def export_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def export_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
                **options: Any) -> None:
    (df.write.format("jdbc").option("url", url).option("dbtable", table)
     .options(**options).mode(mode).save())


def export_iceberg(df: DataFrame, table: str, mode: str = "append") -> None:
    """Iceberg-native writeTo (reference io/iceberg.py:21). Needs the
    iceberg-spark runtime jar on the classpath — not in this image, so the
    capability gate checks the classpath UP FRONT (a late AnalysisException
    from writeTo().append() would mask the real cause)."""
    spark = df.sparkSession
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception as e:
        raise NotImplementedError(
            "Iceberg export requires the iceberg-spark-runtime jar on the "
            "Spark classpath (org.apache.iceberg.spark.SparkCatalog is not "
            "loadable)") from e
    writer = df.writeTo(table)
    if mode == "overwrite":
        writer.createOrReplace()
    else:
        writer.append()


def export_lancedb(df: DataFrame, uri: str, table: str) -> None:
    """reference io/lancedb.py:12 — requires the lancedb library."""
    try:
        import lancedb  # noqa: F401
    except ImportError as e:
        raise NotImplementedError("lancedb not installed in this image") from e
    raise NotImplementedError("wire lancedb.connect(uri).create_table here")


def export_huggingface(df: DataFrame):
    """Spark -> HuggingFace via Arrow (reference io/hf_datasets.py
    export direction): returns a ``datasets.Dataset`` when the library is
    installed, else the underlying ``pyarrow.Table`` (the same payload —
    ``datasets.Dataset(table)`` wraps it 1:1)."""
    import pyarrow as pa

    pdf = df.toPandas()
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    try:
        import datasets
        return datasets.Dataset(table)
    except ImportError:
        return table


def export_fiftyone(df: DataFrame, out_dir: str,
                    image_col: str = "image_path",
                    boxes_col: Optional[str] = None,
                    labels_col: Optional[str] = None,
                    width_col: Optional[str] = None,
                    height_col: Optional[str] = None,
                    dataset_name: str = "pxt_export"):
    """FiftyOne export (reference io/globals.py:12 create_fiftyone_dataset).

    With the fiftyone library installed, builds a live ``fo.Dataset``.
    Without it, writes FiftyOne's documented dataset-directory layout
    (``samples.json`` with per-sample filepath + Detections labels) that
    ``fo.Dataset.from_dir(..., dataset_type=FiftyOneDataset)`` imports.

    FiftyOne's Detection.bounding_box format is [x, y, w, h] RELATIVE to
    the image size in [0, 1]: pass ``width_col``/``height_col`` when boxes
    are absolute-pixel [x1, y1, x2, y2] and they are rescaled here;
    without dimension columns, boxes are required to already be relative
    (all coordinates in [0, 1]) and an error is raised otherwise."""
    cols = [image_col] + [c for c in (boxes_col, labels_col,
                                      width_col, height_col) if c]

    def sample_of(r) -> dict:
        sample: dict[str, Any] = {"filepath": r[image_col]}
        if boxes_col and labels_col:
            w = float(r[width_col]) if width_col else 1.0
            h = float(r[height_col]) if height_col else 1.0
            dets = []
            for box, label in zip(r[boxes_col] or [], r[labels_col] or []):
                x1, y1, x2, y2 = box
                if not width_col and not (
                        0 <= x1 <= 1 and 0 <= y1 <= 1
                        and 0 <= x2 <= 1 and 0 <= y2 <= 1):
                    raise ValueError(
                        "export_fiftyone: boxes look absolute-pixel "
                        f"({[x1, y1, x2, y2]}) but no width_col/height_col "
                        "given; pass image dimensions so they can be "
                        "rescaled to FiftyOne's relative [0,1] format")
                dets.append({
                    "_cls": "Detection",
                    "label": str(label),
                    "bounding_box": [x1 / w, y1 / h,
                                     (x2 - x1) / w, (y2 - y1) / h],
                })
            sample["ground_truth"] = {"_cls": "Detections",
                                      "detections": dets}
        return sample

    # toLocalIterator: partitions stream to the driver one at a time, so
    # driver memory is bounded by one partition however large the table
    # (label exports are usually small, but a 1M-row detection set was an
    # OOM with .collect())
    row_iter = df.select(*cols).toLocalIterator()
    try:
        import fiftyone as fo
        ds = fo.Dataset(dataset_name)
        def gen():
            for r in row_iter:
                s = sample_of(r)
                smp = fo.Sample(filepath=s["filepath"])
                if "ground_truth" in s:
                    smp["ground_truth"] = fo.Detections(detections=[
                        fo.Detection(label=d["label"],
                                     bounding_box=d["bounding_box"])
                        for d in s["ground_truth"]["detections"]])
                yield smp
        ds.add_samples(gen())
        return ds
    except ImportError:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "samples.json")
        with open(path, "w") as f:
            # stream the samples array member by member — never the whole
            # dataset in one json.dump
            f.write('{"name": %s, "samples": [' % _json.dumps(dataset_name))
            for i, r in enumerate(row_iter):
                if i:
                    f.write(", ")
                _json.dump(sample_of(r), f)
            f.write("]}")
        return path


def export_pytorch(df: DataFrame, out_dir: str,
                   shard_rows: int = 10_000) -> list[str]:
    """Materialize as a directory of pickled row-dict shards consumable by a
    torch IterableDataset (reference _query.py:2002 to_pytorch_dataset).
    Executor-side sharding — the driver never holds the dataset."""
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(idx: int, rows: Iterator) -> Iterator[str]:
        import pickle
        shard, n_shard, written = [], 0, []
        for row in rows:
            shard.append(row.asDict(recursive=True))
            if len(shard) >= shard_rows:
                p = os.path.join(out_dir, f"shard-{idx:05d}-{n_shard:04d}.pkl")
                with open(p, "wb") as f:
                    pickle.dump(shard, f)
                written.append(p)
                shard, n_shard = [], n_shard + 1
        if shard:
            p = os.path.join(out_dir, f"shard-{idx:05d}-{n_shard:04d}.pkl")
            with open(p, "wb") as f:
                pickle.dump(shard, f)
            written.append(p)
        return iter(written)

    return df.rdd.mapPartitionsWithIndex(write_partition).collect()


def export_coco(df: DataFrame, out_path: str,
                image_col: str = "image_path",
                boxes_col: str = "boxes", labels_col: str = "labels") -> str:
    """COCO-format detection export (reference _query.py:2039
    to_coco_dataset): images + annotations json."""
    import tempfile

    # single streamed pass (toLocalIterator — bounded driver memory):
    # images go straight to the output file, annotations spool to a temp
    # file (they interleave per row but live in a different json array),
    # then the spool is appended. Only the category map stays in memory.
    categories: dict[Any, int] = {}
    ann_id = 0
    out_dir = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(out_dir, exist_ok=True)
    with open(out_path, "w") as f, \
            tempfile.TemporaryFile("w+", dir=out_dir) as ann_f:
        f.write('{"images": [')
        first_ann = True
        for i, r in enumerate(
                df.select(image_col, boxes_col, labels_col).toLocalIterator()):
            if i:
                f.write(", ")
            _json.dump({"id": i, "file_name": r[image_col]}, f)
            for box, label in zip(r[boxes_col] or [], r[labels_col] or []):
                if label not in categories:
                    categories[label] = len(categories)
                x1, y1, x2, y2 = box
                if not first_ann:
                    ann_f.write(", ")
                first_ann = False
                _json.dump({
                    "id": ann_id, "image_id": i,
                    "category_id": categories[label],
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": max(x2 - x1, 0) * max(y2 - y1, 0),
                    "iscrowd": 0,
                }, ann_f)
                ann_id += 1
        f.write('], "annotations": [')
        ann_f.seek(0)
        while True:
            chunk = ann_f.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
        f.write('], "categories": ')
        _json.dump([{"id": v, "name": str(k)}
                    for k, v in categories.items()], f)
        f.write("}")
    return out_path


def export_webdataset(df: DataFrame, out_dir: str, key_col: str,
                      shard_rows: int = 10_000) -> list[str]:
    """Materialize as WebDataset tar shards (the public webdataset format
    used for large-scale multimodal training: one tar member per sample
    field, named <key>.<field>; binary columns raw, strings utf-8,
    everything else JSON as <key>.json). Executor-side sharding like
    export_pytorch — each partition streams its rows into
    shard-{part:05d}-{seq:04d}.tar, so the driver never holds data and
    shard count scales with partitions. Returns the shard paths.

    Deterministic for a fixed partitioning: member order follows row
    order, tar mtimes are zeroed."""
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(idx: int, rows: Iterator) -> Iterator[str]:
        import io as _io
        import json as _json
        import tarfile

        written: list[str] = []
        tar = None
        n_shard = n_in_shard = 0

        def open_shard():
            p = os.path.join(out_dir, f"shard-{idx:05d}-{n_shard:04d}.tar")
            return tarfile.open(p, "w"), p

        def add(tar, name: str, payload: bytes) -> None:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            tar.addfile(info, _io.BytesIO(payload))

        for row in rows:
            if tar is None:
                tar, path = open_shard()
                written.append(path)
            d = row.asDict(recursive=True)
            key = str(d.pop(key_col))
            extra = {}
            for field, v in d.items():
                if v is None:
                    continue
                if isinstance(v, (bytes, bytearray)):
                    add(tar, f"{key}.{field}", bytes(v))
                elif isinstance(v, str):
                    add(tar, f"{key}.{field}.txt", v.encode("utf-8"))
                else:
                    extra[field] = v
            if extra:
                add(tar, f"{key}.json",
                    _json.dumps(extra, sort_keys=True, default=str).encode())
            n_in_shard += 1
            if n_in_shard >= shard_rows:
                tar.close()
                tar, n_in_shard, n_shard = None, 0, n_shard + 1
        if tar is not None:
            tar.close()
        return iter(written)

    return sorted(df.rdd.mapPartitionsWithIndex(write_partition).collect())


def import_webdataset(spark: SparkSession, path: str):
    """Read WebDataset tar shards back into a DataFrame: one row per
    sample key with `key`, binary fields as binary, `.txt` fields as
    strings, and the `.json` member exploded into a `meta` JSON string.
    Shards are listed on the driver but READ on executors (one task per
    shard) — the inverse of export_webdataset."""
    import glob as _glob
    shards = sorted(_glob.glob(os.path.join(path, "*.tar")))
    if not shards:
        raise ValueError(f"no .tar shards under {path!r}")

    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("fields", T.MapType(T.StringType(), T.BinaryType())),
        T.StructField("meta", T.StringType()),
    ])

    def read_shard(paths: Iterator) -> Iterator:
        import tarfile
        for p in paths:
            samples: dict[str, dict] = {}
            metas: dict[str, str] = {}
            with tarfile.open(p, "r") as tar:
                for m in tar:
                    if not m.isfile():
                        continue
                    key, _, field = m.name.partition(".")
                    payload = tar.extractfile(m).read()
                    if field == "json":
                        metas[key] = payload.decode("utf-8")
                    else:
                        samples.setdefault(key, {})[field] = payload
            for key in sorted(set(samples) | set(metas)):
                yield (key, samples.get(key, {}), metas.get(key))

    rdd = spark.sparkContext.parallelize(shards, len(shards)) \
        .mapPartitions(read_shard)
    return spark.createDataFrame(rdd, schema)


# ---------------------------------------------------------------------------
# reference io name parity (io/pandas.py:95, io/sql.py:14,85, io/globals.py:12)
# ---------------------------------------------------------------------------

def df_infer_schema(df, schema_overrides=None,
                    primary_key=None) -> dict:
    """Infer a pixeltable schema dict from a pandas DataFrame (reference
    io/pandas.py:95 df_infer_schema). Columns named in ``primary_key``
    are non-nullable; ``schema_overrides`` entries pass through
    verbatim. Dtype mapping mirrors the reference's
    __pd_coltype_to_pxt_type: integer -> Int, float -> Float, bool ->
    Bool, datetime -> Timestamp, date objects -> Date, strings ->
    String, anything else -> Json."""
    import datetime as _dt

    from ..type_system import ColumnType

    schema_overrides = schema_overrides or {}
    primary_key = set(primary_key or [])
    out: dict = {}
    for name in df.columns:
        if name in schema_overrides:
            out[name] = schema_overrides[name]
            continue
        nullable = name not in primary_key
        dt = df[name].dtype
        kind = getattr(dt, "kind", "O")
        if kind in ("i", "u"):
            out[name] = ColumnType.int_(nullable)
        elif kind == "f":
            out[name] = ColumnType.float_(nullable)
        elif kind == "b":
            out[name] = ColumnType.bool_(nullable)
        elif kind == "M":
            out[name] = ColumnType.timestamp(nullable)
        else:
            sample = df[name].dropna()
            v = sample.iloc[0] if len(sample) else None
            if isinstance(v, _dt.datetime):
                out[name] = ColumnType.timestamp(nullable)
            elif isinstance(v, _dt.date):
                out[name] = ColumnType.date(nullable)
            elif isinstance(v, str) or v is None:
                out[name] = ColumnType.string(nullable)
            else:
                out[name] = ColumnType.json(nullable)
    return out


def import_sql(spark: SparkSession, query_or_table: str, *,
               db_connect_str: str, **options: Any) -> DataFrame:
    """RDBMS import by table name or SQL query (reference io/sql.py:85
    import_sql). A string containing whitespace is treated as a query
    and wrapped as a JDBC subquery; otherwise it is a table name."""
    # alias must not start with '_' (Derby rejects such identifiers)
    src = (f"({query_or_table}) AS pxt_src"
           if any(c.isspace() for c in query_or_table.strip())
           else query_or_table)
    return import_jdbc(spark, db_connect_str, src, **options)


def export_sql(df: DataFrame, target_table_name: str, *,
               db_connect_str: str, if_exists: str = "error",
               **options: Any) -> None:
    """RDBMS export (reference io/sql.py:14 export_sql). ``if_exists``
    maps to Spark JDBC save modes: 'error' -> errorifexists, 'replace'
    -> overwrite, 'insert' -> append."""
    modes = {"error": "errorifexists", "replace": "overwrite",
             "insert": "append"}
    if if_exists not in modes:
        raise ValueError(
            f"if_exists must be one of {sorted(modes)}, got {if_exists!r}")
    export_jdbc(df, db_connect_str, target_table_name,
                mode=modes[if_exists], **options)


def export_images_as_fo_dataset(df: DataFrame, out_dir: str,
                                image_col: str = "image_path",
                                detections=None, **kw):
    """Voxel51 image export (reference io/globals.py:12
    export_images_as_fo_dataset) — delegates to :func:`export_fiftyone`;
    ``detections`` is the boxes column name (the reference's detections
    expr)."""
    return export_fiftyone(df, out_dir, image_col=image_col,
                           boxes_col=detections, **kw)

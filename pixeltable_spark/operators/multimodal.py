"""Multimodal column plumbing: image/audio/video as opaque binary payloads
(or by-reference file paths) with typed metadata, processed via Arrow-batched
mapInPandas.

The reference treats media as file references with executor-side fetch +
UDF decode (reference type_system.py:1624-1785, exec/cache_prefetch_node.py,
exec/object_store_save_node.py). Here the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested; the
actual codec calls (PIL/ffmpeg) are STUBBED behind ``_decode_image_stub``
etc. because the image/audio libraries are not in this container. Swapping
a stub for a real decoder changes one function body, not the pipeline.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mode", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
])


def _decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake metadata for payloads that are NOT decodable
    images (synthetic test bytes); real image payloads take the header
    probe in _image_meta below.
    """
    if payload is None:
        return {"width": None, "height": None, "mode": None, "n_bytes": None}
    h = hashlib.md5(payload).digest()
    return {
        "width": 64 + h[0] % 192,          # fake 64..255
        "height": 64 + h[1] % 192,
        "mode": ["RGB", "RGBA", "L"][h[2] % 3],
        "n_bytes": len(payload),
    }


def _image_meta(payload: bytes) -> dict:
    """REAL header metadata for PNG/JPEG/GIF/BMP/PPM (pure-stdlib probe,
    functions/image_codec.py); the deterministic stub only for payloads no
    codec recognizes."""
    if payload is not None:
        from ..functions.image_codec import probe
        info = probe(payload)
        if info is not None:
            return {"width": info["width"], "height": info["height"],
                    "mode": info["mode"], "n_bytes": len(payload)}
    return _decode_image_stub(payload)


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resample + PNG re-encode when the payload is
    in the pure-python codec's subset; deterministic re-hash otherwise."""
    if payload is None:
        return None
    try:
        from ..functions.image_codec import decode
        return decode(payload).resize((width, height)).save_bytes()
    except Exception:  # noqa: BLE001 — not a decodable image
        return hashlib.md5(payload + f"{width}x{height}".encode()).digest()


def extract_image_metadata(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Attach decoded metadata to a binary image column.

    mapInPandas: one Arrow batch in/out per call; payload bytes never
    round-trip through Python row objects. At 100 TB the input should be
    partitioned so batches stay ~100 MB (spark.sql.files.maxPartitionBytes).
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("image_meta", IMAGE_META_SCHEMA)]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["image_meta"] = [_image_meta(p) for p in pdf[binary_col]]
            yield pdf

    return df.mapInPandas(op, out_schema)


def resize_images(df: DataFrame, width: int, height: int,
                  binary_col: str = "payload") -> DataFrame:
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("resized", T.BinaryType())]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["resized"] = [_resize_stub(p, width, height) for p in pdf[binary_col]]
            yield pdf

    return df.mapInPandas(op, out_schema)


def _frame_indices(n_frames: int, src_fps: float, every_n: int,
                   fps: "float | None", num_frames: "int | None") -> list:
    """Which frame ordinals to emit (reference video/iterators.py:104:
    fps = extraction rate, num_frames = evenly spaced exact count;
    default = every_n stride)."""
    if num_frames is not None:
        k = min(max(1, int(num_frames)), n_frames)
        return sorted({round(i * (n_frames - 1) / max(k - 1, 1))
                       for i in range(k)})
    if fps is not None and src_fps > 0:
        stride = max(src_fps / float(fps), 1e-9)
        out, seen = [], set()
        i = 0.0
        while int(i) < n_frames:
            if int(i) not in seen:
                out.append(int(i))
                seen.add(int(i))
            i += stride
        return out
    return list(range(0, n_frames, max(1, every_n)))


def sample_video_frames(df: DataFrame, every_n: int = 30,
                        binary_col: str = "payload",
                        id_col: str = "media_id",
                        fps: "float | None" = None,
                        num_frames: "int | None" = None) -> DataFrame:
    """Frame-sampling plumbing (UDTF shape): each video row explodes into
    frame rows with frame_idx — the component-view pattern
    (reference exec/component_iteration_node.py) over mapInPandas.
    Uncompressed-AVI payloads yield REAL PNG frames
    (functions/video_codec.py); other payloads keep the deterministic
    1-frame-per-256-bytes stub."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.image_codec import encode_png
        from ..functions.video_codec import decode as avi_decode
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[binary_col]
                if payload is None:
                    continue
                try:
                    frames, src_fps = avi_decode(bytes(payload))
                    for i in _frame_indices(len(frames), src_fps, every_n,
                                            fps, num_frames):
                        rows.append({
                            id_col: r[id_col], "frame_idx": i,
                            "frame": encode_png(frames[i], "RGB"),
                        })
                    continue
                except Exception:  # noqa: BLE001 — needs a real codec
                    pass
                # stub: pretend 1 frame per 256 payload bytes at 30 fps
                n_frames = max(1, len(payload) // 256)
                for i in _frame_indices(n_frames, 30.0, every_n,
                                        fps, num_frames):
                    rows.append({
                        id_col: r[id_col],
                        "frame_idx": i,
                        "frame": hashlib.md5(payload + bytes([i % 256])).digest(),
                    })
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    return df.mapInPandas(op, out_schema)


def _local_opener(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def prefetch_payloads(df: DataFrame, path_col: str = "media_path",
                      payload_col: str = "payload",
                      max_workers: int = 15,
                      opener=None,
                      cache_dir: "str | None" = None,
                      cache_bytes: "int | None" = None) -> DataFrame:
    """Fetch by-reference media into inline payloads — the executor-side
    analog of the reference's CachePrefetchNode (reference
    exec/cache_prefetch_node.py: 15 workers, batched): a thread pool per
    Arrow batch overlaps I/O, rows with missing/unreadable files get a null
    payload plus an error string instead of failing the batch.

    `opener(path) -> bytes` is pluggable (defaults to local open; an
    object-store deployment passes its GET). With `cache_dir` set (or
    `cache_bytes` alone, using the default dir), fetches go through the
    PERSISTENT executor-local LRU file cache (operators/file_cache.py,
    the reference's FileCache design): repeated queries over the same
    media hit local disk instead of re-fetching, across Arrow batches,
    across queries, and across worker restarts — the cache directory is
    the index. At 100 TB this is what makes iterate-on-a-query workloads
    over remote media affordable."""
    from concurrent.futures import ThreadPoolExecutor

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(payload_col, T.BinaryType()),
           T.StructField(f"_fetch_error_{payload_col}", T.StringType())]
    )
    use_cache = cache_dir is not None or cache_bytes is not None
    base_opener = opener or _local_opener

    def fetch_one(path):
        if path is None:
            return None, "null path"
        try:
            if use_cache:
                from .file_cache import DEFAULT_CAPACITY_BYTES, shared_cache
                cache = shared_cache(
                    cache_dir, cache_bytes or DEFAULT_CAPACITY_BYTES)
                return cache.get_or_fetch(path, base_opener), None
            return base_opener(path), None
        except Exception as e:  # noqa: BLE001 — per-row error tolerance
            return None, f"{type(e).__name__}: {e}"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            for pdf in batches:
                results = list(pool.map(fetch_one, pdf[path_col]))
                pdf = pdf.copy()
                pdf[payload_col] = [r[0] for r in results]
                pdf[f"_fetch_error_{payload_col}"] = [r[1] for r in results]
                yield pdf

    return df.mapInPandas(op, out_schema)


def save_payloads(df: DataFrame, dest_dir: str,
                  payload_col: str = "payload",
                  id_col: str = "media_id",
                  ext: str = "bin") -> DataFrame:
    """Persist generated media from executors and return the destination
    URL column — the ObjectStoreSaveNode analog (reference
    exec/object_store_save_node.py): files are written where they are
    computed; only the reference string travels back through the plan."""
    import os

    os.makedirs(dest_dir, exist_ok=True)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("media_url", T.StringType())]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = []
            for _, r in pdf.iterrows():
                p = r[payload_col]
                if p is None:
                    urls.append(None)
                    continue
                path = os.path.join(dest_dir, f"{r[id_col]}.{ext}")
                with open(path, "wb") as f:
                    f.write(p)
                urls.append("file://" + path)
            pdf = pdf.copy()
            pdf["media_url"] = urls
            yield pdf

    return df.mapInPandas(op, out_schema)


def documents_as_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapter used by tests: treat utf-8 text bytes as an opaque payload so
    the binary pipeline can be exercised with the driver's documents table."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))

"""Mergeable KMV (k-minimum-values) sketches — distinct counts, union
/ intersection / Jaccard estimates over arbitrary column domains
WITHOUT joins or full distincts (Beyer et al., "On synopses for
distinct-value estimation under multiset operations", SIGMOD 2007 —
public). The training-pipeline use: estimate cross-corpus overlap /
benchmark contamination between two 100 TB corpora from two
bounded-size summaries instead of an O(N·M) key join.

Design:

* a sketch is the k smallest DISTINCT md5 values of the column,
  kept as 16-hex-char strings — fixed-width hex compares identically
  to its numeric order, so the whole pipeline stays JVM-side
  (``F.md5``/``substr``/TakeOrderedAndProject) and is replayable
  verbatim in ANSI SQL (the q155 oracle)
* the Spark plan per corpus: hash projection → partial-distinct
  groupBy (shuffle is O(distinct values), map-side combined) →
  ``orderBy(h).limit(k)`` which Catalyst executes as
  TakeOrderedAndProject — per-partition top-k then a k-row driver
  merge, NO global sort shuffle
* estimators (with U = 2^64, h normalized to (0,1]):
  NDV ≈ (k−1)/h_k when the domain has ≥ k distinct values, exact
  otherwise; Jaccard ≈ |K ∩ A ∩ B| / |K| where K = k smallest of
  A ∪ B; intersection ≈ J · NDV(A ∪ B). All arithmetic is a handful
  of deterministic float ops over exact integer hashes — engines
  agree bit-for-bit.

Canonical key encoding matches the engine's Bloom/NDV hashing
surface: ``'i' + str`` for integral values, ``'s' + text`` for
strings (catalog._bloom_key), so sketches over the same logical
values collide across modules and engines.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U64 = float(1 << 64)


def _hash16(col: Column, kind: str = "auto") -> Column:
    """16-hex-char md5 prefix over the canonical key encoding.
    ``kind``: 'int' / 'str' / 'auto' (auto casts non-strings through
    a LONG cast to match the python 'i'+str(v) encoding)."""
    if kind == "str":
        key = F.concat(F.lit("s"), col)
    elif kind == "int":
        key = F.concat(F.lit("i"), col.cast("long").cast("string"))
    else:
        key = F.concat(F.lit("i"), col.cast("long").cast("string"))
    return F.substring(F.md5(key), 1, 16)


def kmv_sketch(df: DataFrame, col: str, k: int = 1024,
               kind: str = "auto") -> list[str]:
    """The k smallest distinct hashes of ``df[col]`` (non-null), as a
    sorted driver-side list (≤ k · 16 bytes — the bounded summary is
    the point). One shuffle over distinct values; top-k runs as
    TakeOrderedAndProject."""
    h = (df.where(F.col(col).isNotNull())
         .select(_hash16(F.col(col), kind).alias("h"))
         .distinct()
         .orderBy("h").limit(int(k)))
    return [r["h"] for r in h.collect()]


def _frac(h16: str) -> float:
    """Normalize a 16-hex hash to (0, 1]: (double(v)+1)/2^64 — the +1
    keeps a zero hash off the pole; the int→double conversion happens
    BEFORE the +1 so the SQL replay (CAST to DOUBLE, then the same
    two float ops) is bit-identical."""
    return (float(int(h16, 16)) + 1.0) / _U64


def kmv_ndv(sketch: Sequence[str], k: int) -> float:
    """Distinct-value estimate: exact when the domain was smaller
    than k, else (k−1)/h_k."""
    if len(sketch) < k:
        return float(len(sketch))
    return (k - 1) / _frac(sketch[k - 1])


def kmv_union(a: Sequence[str], b: Sequence[str], k: int) -> list[str]:
    """Sketch of A ∪ B: k smallest of the merged hash sets (exact —
    a value in either corpus contributes the same hash)."""
    return sorted(set(a) | set(b))[:k]


def kmv_overlap(a: Sequence[str], b: Sequence[str], k: int) -> dict:
    """Jaccard / intersection / union estimates from two sketches.
    K = k-min of the union; J = |K ∩ A ∩ B| / |K| (Beyer et al. §4:
    K is a uniform sample of A ∪ B, membership in both sketches is
    exact for its elements)."""
    ku = kmv_union(a, b, k)
    sa, sb = set(a), set(b)
    inter = sum(1 for h in ku if h in sa and h in sb)
    j = inter / len(ku) if ku else 0.0
    union_ndv = kmv_ndv(ku, k)
    return {"jaccard": j, "union_ndv": union_ndv,
            "intersection_ndv": j * union_ndv}


def corpus_overlap(df_a: DataFrame, df_b: DataFrame, col: str,
                   k: int = 1024, kind: str = "auto") -> DataFrame:
    """One-row overlap report between two corpora on ``col`` —
    estimated from two bounded sketches, NO cross-corpus join: each
    side pays one distinct-shuffle + top-k, the comparison is a
    driver-side fold over ≤ 2k hashes. At 100 TB per side this is the
    only way to ask "how contaminated is corpus B with corpus A" that
    doesn't shuffle both corpora on the key.

    Columns: ndv_a, ndv_b, union_ndv, intersection_ndv, jaccard —
    raw doubles (every op is deterministic over exact integer hashes,
    so engines replaying the same arithmetic agree bit-for-bit;
    rounding would only ADD a half-even-vs-half-away divergence
    risk)."""
    spark = df_a.sparkSession
    a = kmv_sketch(df_a, col, k, kind)
    b = kmv_sketch(df_b, col, k, kind)
    ov = kmv_overlap(a, b, k)
    row = (kmv_ndv(a, k), kmv_ndv(b, k), ov["union_ndv"],
           ov["intersection_ndv"], ov["jaccard"])
    from ..localframe import local_df
    return local_df(
        spark, [row], "ndv_a double, ndv_b double, union_ndv double, "
                      "intersection_ndv double, jaccard double")


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005, public): mergeable
# frequency summaries — estimate any value's occurrence count from a
# depth x width counter grid (est >= true, overestimate bounded by
# eps = e/width of the total mass per row). The pipeline use: ship a
# ~16 KB per-shard token-frequency summary instead of a full
# frequency table, cell-wise-ADD to merge shards, probe candidate
# vocabularies without re-scanning the corpus.
# ---------------------------------------------------------------------------

def _cm_buckets_col(col: Column, depth: int, width: int,
                    kind: str) -> list[Column]:
    """Row-r bucket for a value: independent 32-bit slices of ONE md5
    over the canonical key (hex slice r*8..r*8+8), mod width — each
    row uses disjoint digest bits, and the SQL replay carves the same
    slices."""
    if kind == "str":
        key = F.concat(F.lit("s"), col)
    else:
        key = F.concat(F.lit("i"), col.cast("long").cast("string"))
    h = F.md5(key)
    return [
        (F.conv(F.substring(h, r * 8 + 1, 8), 16, 10).cast("long")
         % width).alias("b")
        for r in range(depth)
    ]


def cm_sketch(df: DataFrame, col: str, depth: int = 4,
              width: int = 1024, kind: str = "str") -> dict:
    """Build the sketch over all (non-null) occurrences of
    ``df[col]``: ``{"depth", "width", "cells": {(r, b): count}}``.
    One map-only explode of depth (r, bucket) pairs per row + one
    map-side-combined groupBy whose output is bounded by depth*width
    cells — the collect is the bounded summary, not data."""
    c = F.col(col)
    buckets = _cm_buckets_col(c, depth, width, kind)
    pairs = F.array(*[
        F.struct(F.lit(r).cast("int").alias("r"), b.alias("b"))
        for r, b in enumerate(buckets)])
    cells = (df.where(c.isNotNull())
             .select(F.explode(pairs).alias("p"))
             .groupBy(F.col("p.r").alias("r"), F.col("p.b").alias("b"))
             .agg(F.count(F.lit(1)).alias("c"))).collect()
    return {"depth": depth, "width": width,
            "cells": {(r["r"], r["b"]): r["c"] for r in cells}}


def _cm_buckets_py(v, depth: int, width: int, kind: str) -> list[int]:
    import hashlib
    pre = "i" if kind != "str" else "s"
    hx = hashlib.md5((pre + str(v)).encode()).hexdigest()
    return [int(hx[r * 8:r * 8 + 8], 16) % width for r in range(depth)]


def cm_estimate(sketch: dict, v, kind: str = "str") -> int:
    """Point frequency estimate: min over rows of the value's counter
    (>= true count always; == for values that never collide)."""
    d, w, cells = sketch["depth"], sketch["width"], sketch["cells"]
    return min(cells.get((r, b), 0)
               for r, b in enumerate(_cm_buckets_py(v, d, w, kind)))


def cm_merge(a: dict, b: dict) -> dict:
    """Cell-wise sum — sketches over disjoint corpus shards merge to
    the sketch of the union corpus exactly."""
    if (a["depth"], a["width"]) != (b["depth"], b["width"]):
        raise ValueError("cm_merge: shape mismatch")
    cells = dict(a["cells"])
    for k, v in b["cells"].items():
        cells[k] = cells.get(k, 0) + v
    return {"depth": a["depth"], "width": a["width"], "cells": cells}

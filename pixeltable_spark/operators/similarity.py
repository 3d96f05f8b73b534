"""Similarity search over embedding columns (array<float>).

The analog of the reference's embedding-index top-k
(reference index/embedding_index.py:24,268-297 — pgvector ANN behind
order_by(similarity).limit(k)), re-expressed for Spark:

* brute-force top-k: cosine via zip_with+aggregate (pure JVM) then
  orderBy desc + limit — Catalyst plans TakeOrderedAndProject: each
  partition keeps only its local top-k, the driver merges k*partitions
  rows. No full sort, no collect; scales linearly at 100 TB.
* LSH-bucketed ANN: deterministic md5-derived random-hyperplane signs
  bucket vectors; a query probes only its bucket — candidate set shrinks
  ~2^planes-fold before exact re-scoring.
* IVF-style variant: coarse quantization by bucket, per-bucket centroids
  as the routing table (a groupBy, not an iterative k-means — deterministic
  and oracle-checkable).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.array import cosine_col, dot_col, norm_col


def cosine_to_query(vec: Column, query: Sequence[float]) -> Column:
    q = F.array(*[F.lit(float(x)) for x in query])
    return cosine_col(vec, q)


def topk_cosine(df: DataFrame, query: Sequence[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine similarity to a query vector.
    orderBy+limit => TakeOrderedAndProject (partition-local top-k)."""
    return (
        df.select(F.col(id_col), F.round(cosine_to_query(F.col(vec_col), query), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# LSH: deterministic random hyperplanes
# ---------------------------------------------------------------------------

def _plane_weights(plane: int, dim: int) -> list:
    """±1 pseudo-random weights for (plane, 1-based dim index), derived from
    md5 — identical in any engine with md5/ascii, so the oracle can replicate
    bucketing. Computed ONCE driver-side: the weights depend only on
    (plane, dim), so evaluating md5 per row per element (the round-1..4
    formulation) paid dim x planes hash+substring+ascii calls per vector —
    256/row at dim=64 n_planes=4 — for constants. Now they ship as a foldable
    array literal; the per-row cost is one zip_with multiply-add pass."""
    import hashlib

    return [(ord(hashlib.md5(f"p{plane}_{i}".encode()).hexdigest()[0]) % 2)
            * 2 - 1
            for i in range(1, dim + 1)]


#: literal-weights length when the vector dim is unknown at plan time; per-row
#: element_at lookups cover up to this many dims, indices beyond fall back to
#: the JVM-side md5 derivation in _plane_weight_expr (identical values)
_MAX_LSH_DIM = 512


def _plane_weight_expr(plane: int):
    """JVM-side twin of _plane_weights: weight for (plane, 1-based index i)
    as a Column expression — ascii of the first md5 hex char of
    "p{plane}_{i}", %2*2-1. Used only for indices past the _MAX_LSH_DIM
    literal, so the md5 cost is paid per element only beyond dim 512."""
    def w(i: Column) -> Column:
        h = F.md5(F.concat(F.lit(f"p{plane}_"), i.cast("string"))
                  .cast("binary"))
        return (F.ascii(F.substring(h, 1, 1)) % 2 * 2 - 1).cast("double")
    return w


def _infer_dim(df: DataFrame, vec_col: str):
    """Embedding dim from the first non-empty vector (one limit-1 scan job,
    ~100 ms) — buys the exact-length zip_with weights path, which measures
    ~3x faster per row than element_at lookups into an oversized literal."""
    row = (df.select(F.size(F.col(vec_col)).alias("d"))
           .filter(F.col("d") > 0).first())
    return int(row["d"]) if row is not None else None


def hyperplane_bucket(vec: Column, n_planes: int = 8,
                      dim: int | None = None) -> Column:
    """LSH bucket id in [0, 2^n_planes): bit p = sign of <vec, r_p> where
    r_p has md5-derived ±1 entries (precomputed driver-side, shipped as
    array literals). Pure higher-order-function math, no per-row hashing.

    Pass `dim` when the embedding length is known (exact-length literal,
    no slice); otherwise weights cover up to _MAX_LSH_DIM dims and are
    sliced to the row's vector length."""
    bucket = F.lit(0).cast(T.LongType())
    for p in range(n_planes):
        ws = _plane_weights(p, dim if dim is not None else _MAX_LSH_DIM)
        w_lit = F.array(*[F.lit(w) for w in ws])
        if dim is None:
            # unknown dim: O(1) lookups into the constant array, iterating
            # only the row's vector length (slicing the literal per row
            # measured 3x slower). Indices past _MAX_LSH_DIM fall back to
            # the same md5 derivation computed JVM-side (try_element_at is
            # NULL out-of-bounds even under ANSI; plain element_at would
            # error there and silently NULL-fold otherwise, collapsing
            # every >512-dim vector into bucket 0).
            w_fallback = _plane_weight_expr(p)
            terms = F.transform(
                vec, lambda x, i: x.cast("double") * F.coalesce(
                    F.try_element_at(w_lit, (i + 1).cast("int")),
                    w_fallback(i + 1)))
        else:
            terms = F.zip_with(vec, w_lit,
                               lambda x, w: x.cast("double") * w)
        proj = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ann_topk_cosine(df: DataFrame, query: Sequence[float], k: int = 10,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    n_planes: int = 4) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, then exact
    re-score. At 1000 executors this turns a full scan into ~1/2^planes of
    the data (bucket column is precomputable + partition-prunable when the
    table is written partitioned by bucket)."""
    # compute the query's bucket driver-side with the same weights
    qb = 0
    for p in range(n_planes):
        ws = _plane_weights(p, len(query))
        proj = sum(float(x) * w for x, w in zip(query, ws))
        if proj > 0:
            qb |= 1 << p
    cand = df.withColumn(
        "__bkt",
        hyperplane_bucket(F.col(vec_col), n_planes, dim=len(query)),
    ).filter(F.col("__bkt") == qb)
    return topk_cosine(cand, query, k, vec_col, id_col)


def ivf_centroids(df: DataFrame, vec_col: str = "embedding",
                  n_planes: int = 4) -> DataFrame:
    """IVF-style coarse index: bucket -> centroid + population. Centroid =
    element-wise mean via posexplode + groupBy (fully distributed)."""
    b = df.withColumn("bkt", hyperplane_bucket(F.col(vec_col), n_planes,
                                               dim=_infer_dim(df, vec_col)))
    exploded = b.select("bkt", F.posexplode(vec_col).alias("dim", "val"))
    cent = (
        exploded.groupBy("bkt", "dim").agg(F.avg("val").alias("c"))
        .groupBy("bkt").agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select("bkt", F.transform("dc", lambda s: s["c"]).alias("centroid"))
    )
    pops = b.groupBy("bkt").agg(F.count(F.lit(1)).alias("n_vectors"))
    return cent.join(pops, "bkt")


def knn_join(left: DataFrame, right: DataFrame, k: int = 5,
             vec_col: str = "embedding", left_id: str = "vec_id",
             right_id: str = "vec_id", n_planes: int = 0,
             allow_broadcast: bool = False,
             max_probe_rows: int = 100_000) -> DataFrame:
    """For each left row, its k nearest right rows by cosine.

    n_planes>0 restricts candidates to shared LSH buckets — the
    table-vs-table scale path (one equi-join shuffle on the bucket key).

    n_planes==0 is exact and requires a BROADCASTABLE left (probe) side:
    the big right side never shuffles — left is broadcast into a
    nested-loop join, each right partition scores its rows, and a
    partition-local pandas top-k reduces the stream to k rows per (lid,
    batch) BEFORE the only shuffle (the final per-lid ranking window). A
    table-vs-table exact kNN would be a cartesian product; use n_planes>0
    for that shape."""
    from pyspark.sql import Window as W

    l = left.select(F.col(left_id).alias("lid"), F.col(vec_col).alias("lv"))
    r = right.select(F.col(right_id).alias("rid"), F.col(vec_col).alias("rv"))
    if n_planes > 0:
        d = _infer_dim(l, "lv")
        l = l.withColumn("bkt", hyperplane_bucket(F.col("lv"), n_planes, dim=d))
        r = r.withColumn("bkt", hyperplane_bucket(F.col("rv"), n_planes, dim=d))
        joined = l.join(r, "bkt")
        scored = joined.withColumn(
            "cos", F.round(cosine_col(F.col("lv"), F.col("rv")), 6))
    else:
        # exact mode broadcasts the whole probe side — guard against the
        # naive table-vs-table call that would broadcast 100 TB: a bounded
        # count (limit pushdown stops the scan at max_probe_rows+1) unless
        # the caller vouches with allow_broadcast=True
        if not allow_broadcast:
            # persist before the bounded guard count so the crossJoin below
            # reuses the computed probes instead of re-running their lineage
            l = l.persist()
            n_probe = l.limit(max_probe_rows + 1).count()
            if n_probe > max_probe_rows:
                raise ValueError(
                    f"exact kNN (n_planes=0) broadcasts the probe side, but "
                    f"left has > {max_probe_rows} rows; pass n_planes>0 for "
                    "the LSH-bucketed table-vs-table path, or "
                    "allow_broadcast=True if the probe side really fits in "
                    "executor memory")
        # broadcast the probes; BroadcastNestedLoopJoin keeps `right`
        # partition-local (no shuffle of the big side). spread() the
        # right side first: a few-split scan would score the whole
        # corpus in ONE task (measured 1.2 s single-task job on the
        # one-file local corpus); at real scale the scan already has
        # thousands of splits and this is a no-op. The final window is
        # an exact global top-k, so partitioning never changes results.
        from .text import spread
        joined = spread(r).crossJoin(F.broadcast(l))
        scored = joined.withColumn(
            "cos", F.round(cosine_col(F.col("lv"), F.col("rv")), 6))
        # partial top-k per Arrow batch: the window below then ranks at most
        # k * n_batches rows per lid instead of |right| rows per lid
        out_schema = T.StructType([
            T.StructField("lid", scored.schema["lid"].dataType),
            T.StructField("rid", scored.schema["rid"].dataType),
            T.StructField("cos", T.DoubleType()),
        ])

        def partial_topk(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pdf = pdf.sort_values(["cos", "rid"], ascending=[False, True])
                yield pdf.groupby("lid", sort=False).head(k)[["lid", "rid", "cos"]]

        scored = scored.select("lid", "rid", "cos").mapInPandas(
            partial_topk, out_schema)
    w = W.partitionBy("lid").orderBy(F.col("cos").desc(), F.col("rid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("lid", "rid", "cos", "rk")
    )


# ---------------------------------------------------------------------------
# Product Quantization (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011, public) — the memory-compression ANN path:
# a 64-dim float32 vector (256 B) becomes M uint8 codes (M bytes), and
# query scoring is M table lookups instead of a dot product.
# ---------------------------------------------------------------------------

def pq_train(df: DataFrame, vec_col: str = "embedding",
             id_col: str = "vec_id", m: int = 8, k: int = 16,
             iters: int = 10, sample: int = 10_000) -> "np.ndarray":
    """Train PQ codebooks: split dims into `m` subspaces, k-means each to
    `k` centroids. Deterministic end to end: the training sample is the
    md5-first `sample` vectors (bounded driver memory however large the
    table), init takes every len/k-th sample in that order, and Lloyd
    iterations are fixed-count numpy float64. Returns (m, k, d/m)
    codebooks — kilobytes, broadcastable anywhere.

    Driver-side training on a bounded sample is the standard design
    (FAISS trains on a sample too); encoding and search stay fully
    distributed with the codebooks broadcast."""
    import numpy as np

    rows = (df.select(id_col, vec_col)
            .withColumn("__o", F.md5(F.col(id_col).cast("string")))
            .orderBy("__o").limit(sample)
            .select(vec_col).collect())
    X = np.array([r[0] for r in rows], dtype=np.float64)
    n, d = X.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    sub = d // m
    books = np.empty((m, k, sub))
    for mi in range(m):
        Xs = X[:, mi * sub:(mi + 1) * sub]
        cent = Xs[:: max(1, n // k)][:k].copy()
        if len(cent) < k:  # tiny inputs: pad by repeating
            cent = np.resize(cent, (k, sub))
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = Xs[mask].mean(axis=0)
        books[mi] = cent
    return books


def pq_encode(df: DataFrame, codebooks, vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Encode every vector to its M nearest-centroid codes
    (id, codes array<int>). mapInPandas with the broadcast codebooks —
    one pass, no shuffle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(codebooks))
    m, k, sub = np.asarray(codebooks).shape
    schema = T.StructType([
        df.schema[id_col],
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ])

    def enc(batches):
        books = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(X), m), dtype=np.int32)
            for mi in range(m):
                Xs = X[:, mi * sub:(mi + 1) * sub]
                d2 = ((Xs[:, None, :] - books[mi][None, :, :]) ** 2).sum(axis=2)
                codes[:, mi] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "codes": list(codes.tolist())})

    return df.select(id_col, vec_col).mapInPandas(enc, schema)


def pq_topk(codes_df: DataFrame, codebooks, query, k: int = 10,
            id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k by asymmetric distance (ADC): precompute the
    query's M x K distance lookup table on the driver (tiny), broadcast
    it, score each code row with M table lookups, and let Catalyst plan
    the TakeOrderedAndProject. Returns (id, adc) ascending — smaller is
    closer in L2 (normalize vectors first for cosine ranking)."""
    import numpy as np

    books = np.asarray(codebooks)
    q = np.asarray(query, dtype=np.float64)
    m, kk, sub = books.shape
    lut = np.empty((m, kk))
    for mi in range(m):
        lut[mi] = (((books[mi] - q[mi * sub:(mi + 1) * sub][None, :]) ** 2)
                   .sum(axis=1))
    # JVM-side scoring: the LUT becomes a nested array literal; adc =
    # sum over subspaces of lut[mi][code] — element_at over array
    # literals stays in codegen, no Python in the scoring path
    lut_col = F.array(*[
        F.array(*[F.lit(float(v)) for v in lut[mi]]) for mi in range(m)])
    adc = None
    for mi in range(m):
        term = F.element_at(F.element_at(lut_col, mi + 1),
                            F.element_at(F.col("codes"), mi + 1) + 1)
        adc = term if adc is None else adc + term
    return (codes_df.select(id_col, F.round(adc, 6).alias("adc"))
            .orderBy(F.col("adc").asc(), F.col(id_col).asc())
            .limit(k))


def pq_topk_rerank(df: DataFrame, codes_df: DataFrame, codebooks, query,
                   k: int = 10, rerank: int = 100,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """The production PQ pattern: ADC shortlist of `rerank` candidates
    (table lookups over compressed codes — the only full pass), then
    exact re-scoring of just those candidates against their original
    vectors (semi-join fetch, tiny). Recall approaches exact search as
    `rerank`/`k` grows while the full-scan cost stays at M bytes/vector."""
    short = pq_topk(codes_df, codebooks, query, k=rerank, id_col=id_col)
    cand = df.join(F.broadcast(short.select(id_col)), id_col, "left_semi")
    return (cand.select(id_col,
                        F.round(cosine_to_query(F.col(vec_col), query), 6)
                        .alias("cos"))
            .orderBy(F.col("cos").desc(), F.col(id_col).asc())
            .limit(k))


def pq_encode_bucketed(df: DataFrame, codebooks,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       n_planes: int = 4) -> DataFrame:
    """PQ codes + an LSH routing bucket per vector (id, bucket, codes).
    Stored partitioned by `bucket`, a probe reads 1/2^planes of the
    codes — the IVF-PQ layout (coarse quantizer = deterministic
    hyperplanes here, so the oracle/tests can replay it)."""
    return (df.select(F.col(id_col),
                      hyperplane_bucket(F.col(vec_col), n_planes,
                                        dim=_infer_dim(df, vec_col))
                      .alias("bucket"),
                      F.col(vec_col))
            .transform(lambda d: pq_encode(d, codebooks, vec_col, id_col)
                       .join(d.select(id_col, "bucket"), id_col)))


def pq_topk_bucketed(codes_df: DataFrame, codebooks, query, k: int = 10,
                     n_planes: int = 4, multiprobe_hamming: int = 1,
                     id_col: str = "vec_id") -> DataFrame:
    """IVF-PQ search: route to the query's LSH bucket plus all buckets
    within `multiprobe_hamming` sign flips (multi-probe LSH — recall
    insurance for near-boundary queries), then ADC top-k over only the
    probed buckets' codes. With codes partitioned by bucket the filter
    is partition-pruning, so the scan touches
    ~(1 + planes choose h)/2^planes of the index."""
    import numpy as np

    q = np.asarray(query, dtype=np.float64)
    d = len(q)
    # same driver-side weights hyperplane_bucket ships as literals
    qb = 0
    for p in range(n_planes):
        w = np.array(_plane_weights(p, d), dtype=np.float64)
        if float(w @ q) > 0:
            qb |= 1 << p
    probes = {qb}
    if multiprobe_hamming >= 1:
        for p in range(n_planes):
            probes.add(qb ^ (1 << p))
    if multiprobe_hamming >= 2:
        for p1 in range(n_planes):
            for p2 in range(p1 + 1, n_planes):
                probes.add(qb ^ (1 << p1) ^ (1 << p2))
    sub = codes_df.filter(F.col("bucket").isin([int(b) for b in probes]))
    return pq_topk(sub, codebooks, query, k=k, id_col=id_col)


# ---------------------------------------------------------------------------
# bag-of-words random-projection embedding (classical, REAL): sparse
# feature hashing + signed random projection (Achlioptas 2003 / the
# SimHash projection without the sign threshold). Tokens shared between
# texts move their embeddings together, so cosine similarity is a real
# lexical similarity — unlike an md5-of-the-whole-text stub, for which
# cos(similar texts) is as random as cos(unrelated ones).
# ---------------------------------------------------------------------------

def bow_embedding_py(text: str, dim: int = 16) -> list:
    """Scalar twin of :func:`bow_embeddings` (for UDF fallbacks and
    drivers) — MUST stay formula-identical to the column version."""
    import hashlib
    import math
    assert dim <= 32
    toks = [t for t in text.lower().strip().split() if t]
    sums = [0] * dim
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        for d in range(dim):
            sums[d] += (ord(h[d]) % 2) * 2 - 1
    n = math.sqrt(sum(s * s for s in sums)) or 1.0
    return [s / n for s in sums]


def bow_embeddings(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", dim: int = 16) -> DataFrame:
    """Per-document unit-norm embedding: bit d's sign of each token's md5
    (±1), summed over tokens, L2-normalized — signed random projection of
    the bag-of-words vector, which preserves BoW cosine in expectation
    (Johnson-Lindenstrauss). All JVM-side: one whitespace tokenize explode
    + one groupBy with `dim` integer sum() aggregates (map-side partials;
    shuffle is `dim` ints per doc). The integer sums make the normalized
    floats bit-identical across engines, so a DuckDB oracle reproduces
    the embeddings exactly. Returns (id_col, embedding array<double>).

    This is the real classical model behind the huggingface
    sentence_transformer fallback (functions/huggingface.py) — same
    formula, so offline indexes and live queries agree."""
    assert dim <= 32, "md5 yields 32 hex-char sign bits"
    from .text import spread
    toks = spread(df).select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                           lambda t: t != "")).alias("tok"))
    # md5(tok) appears in all `dim` partial_sum expressions (the physical
    # plan shows it inlined — CollapseProject folds any pre-projection back
    # into the aggregate, so a bits-first Project doesn't survive planning);
    # runtime subexpression elimination inside the codegen'd HashAggregate
    # evaluates the hash once per token, and the stage is spread() across
    # the cluster, so the duplication is textual, not computational
    sig = F.md5(F.col("tok"))
    aggs = [F.sum(F.ascii(F.substring(sig, d + 1, 1)) % 2 * 2 - 1)
            .alias(f"s_{d}") for d in range(dim)]
    sums = toks.groupBy(id_col).agg(*aggs)
    norm = F.sqrt(sum(F.col(f"s_{d}") * F.col(f"s_{d}") for d in range(dim)))
    norm = F.when(norm == 0, F.lit(1.0)).otherwise(norm)
    return sums.select(
        F.col(id_col),
        F.array(*[(F.col(f"s_{d}") / norm).cast("double")
                  for d in range(dim)]).alias("embedding"))

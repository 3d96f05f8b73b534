"""SemDeDup — semantic deduplication via embedding clustering (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", public).

The scale story: pairwise cosine over a corpus is n² and LSH misses
paraphrase-level duplicates; SemDeDup first k-means-clusters the
embeddings (semantically similar points land in the same cluster), then
prunes near-duplicates ONLY within each cluster — n²/k work, perfectly
partitioned by the cluster key.

Spark mapping:
* k-means: driver-side Lloyd on a bounded md5-deterministic sample (the
  FAISS/pq_train design — centroids are kilobytes and broadcast);
  assignment is a numpy argmin inside mapInPandas — one pass, no shuffle.
* pruning: one shuffle on the cluster key, then a per-cluster greedy
  leader scan in applyInPandas: visit ids ascending, keep a row iff its
  max cosine to every already-kept row in the cluster is below the
  threshold. Deterministic (no RNG, no iteration-order dependence), so
  results are reproducible run-to-run and testable.

Everything is fixed-iteration float64 numpy — deterministic, but k-means
is not SQL-expressible, so queries over this operator use the driver's
rows-only check; invariants are pinned by tests/test_semdedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kmeans_fit(df: DataFrame, vec_col: str = "embedding",
               id_col: str = "vec_id", k: int = 16, iters: int = 10,
               sample: int = 10_000) -> "np.ndarray":
    """Deterministic Lloyd k-means over the md5-first `sample` vectors
    (bounded driver memory at any table size); init takes every
    len/k-th sample. Returns (k, dim) float64 centroids."""
    import numpy as np

    rows = (df.select(id_col, vec_col)
            .withColumn("__o", F.md5(F.col(id_col).cast("string")))
            .orderBy("__o").limit(sample)
            .select(vec_col).collect())
    X = np.array([r[0] for r in rows], dtype=np.float64)
    n = len(X)
    cent = X[:: max(1, n // k)][:k].copy()
    if len(cent) < k:
        cent = np.resize(cent, (k, X.shape[1]))
    for _ in range(iters):
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                cent[c] = X[mask].mean(axis=0)
    return cent


def assign_clusters(df: DataFrame, centroids, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """(id, vec, cluster): nearest centroid by L2, ties to the lowest
    cluster index (numpy argmin). Broadcast centroids + mapInPandas —
    single pass, no shuffle."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))
    schema = T.StructType([
        df.schema[id_col], df.schema[vec_col],
        T.StructField("cluster", T.IntegerType()),
    ])

    def go(batches):
        cent = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame({
                id_col: pdf[id_col], vec_col: pdf[vec_col],
                "cluster": d2.argmin(axis=1).astype(np.int32),
            })

    return df.select(id_col, vec_col).mapInPandas(go, schema)


def semdedup(df: DataFrame, vec_col: str = "embedding",
             id_col: str = "vec_id", k: int = 16,
             threshold: float = 0.95, iters: int = 10,
             sample: int = 10_000) -> DataFrame:
    """Returns (id, cluster, keep, max_cos_kept): `keep` marks the rows
    that survive semantic dedup; `max_cos_kept` is the similarity to the
    closest already-kept row at visit time (-1.0 for the first row of a
    cluster — nothing to compare against).

    One k-means fit (driver, bounded sample) + one cluster-key shuffle +
    per-cluster greedy leader scan. Cluster sizes bound the n² term at
    ~ (n/k)² per task; pick k so clusters fit an executor (the paper uses
    k ~ sqrt(n) at web scale)."""
    import numpy as np
    import pandas as pd

    cent = kmeans_fit(df, vec_col, id_col, k, iters, sample)
    assigned = assign_clusters(df, cent, vec_col, id_col)
    schema = T.StructType([
        df.schema[id_col],
        T.StructField("cluster", T.IntegerType()),
        T.StructField("keep", T.BooleanType()),
        T.StructField("max_cos_kept", T.DoubleType()),
    ])

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0
        U = X / norms[:, None]
        kept: list[int] = []
        keep = np.zeros(len(pdf), dtype=bool)
        max_cos = np.full(len(pdf), -1.0)
        for i in range(len(pdf)):
            if kept:
                sims = U[kept] @ U[i]
                max_cos[i] = float(sims.max())
            if max_cos[i] < threshold:
                keep[i] = True
                kept.append(i)
        return pd.DataFrame({
            id_col: pdf[id_col], "cluster": pdf["cluster"],
            "keep": keep, "max_cos_kept": np.round(max_cos, 6),
        })

    return (assigned.groupBy("cluster")
            .applyInPandas(lambda _, pdf: prune(pdf), schema))

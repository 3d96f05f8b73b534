"""Embedding indexes + similarity search on catalog tables.

The analog of the reference's embedding index (reference
index/embedding_index.py:24,268-297; catalog/table.py:461
add_embedding_index): an index is a computed embedding column kept in
sync by the normal incremental-computation machinery, plus a search API.

Spark disposition (SURVEY §2.6): pgvector's ANN scan becomes
* exact: brute-force cosine top-k -> TakeOrderedAndProject (partition-
  local top-k, no full sort) — correct and scan-bound, the right default
  up to ~10^8 vectors on a cluster;
* approximate: LSH hyperplane bucketing (operators/similarity.py) with
  the bucket id as a partition-prunable column — probing 1/2^planes of
  the data.

The B-tree index of the reference (index/btree.py:18-31) needs no
counterpart: batch-update lookups compile to broadcast semi-joins, which
is how Spark expresses 'index lookup' (SURVEY §1.1).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import Table
from .operators.similarity import ann_topk_cosine, hyperplane_bucket, topk_cosine


class EmbeddingIndex:
    def __init__(self, table: Table, column: str, embed_col: str,
                 n_planes: int = 0, method: str = "auto",
                 pq_m: int = 8, pq_k: int = 16, pq_rerank: int = 100):
        self.table = table
        self.column = column
        self.embed_col = embed_col
        self.n_planes = n_planes
        self.method = method  # 'auto' | 'exact' | 'lsh' | 'pq'
        self.pq_m, self.pq_k, self.pq_rerank = pq_m, pq_k, pq_rerank
        self._pq_books = None

    def _vectors(self) -> DataFrame:
        return (self.table.df()
                .select(F.col("_rowid").alias("vec_id"),
                        F.col(self.embed_col).alias("embedding")))

    def _pq_state(self):
        """Lazy PQ build: codebooks trained once per index instance, codes
        recomputed per search (at scale, persist the codes as a computed
        column; here they derive from the live snapshot so mutations are
        always reflected)."""
        from .operators.similarity import pq_encode, pq_train
        vecs = self._vectors()
        if self._pq_books is None:
            self._pq_books = pq_train(vecs, m=self.pq_m, k=self.pq_k)
        return self._pq_books, pq_encode(vecs, self._pq_books)

    def search(self, query_vec: Sequence[float], k: int = 10,
               approximate: Optional[bool] = None) -> DataFrame:
        """Top-k rows by cosine similarity of the indexed column.
        Returns the full user rows with a `_similarity` column. Method:
        'exact' = TakeOrderedAndProject brute force; 'lsh' = hyperplane
        bucket probe; 'pq' = product-quantization ADC shortlist + exact
        rerank; 'auto' picks lsh when n_planes>0 else exact (the
        reference's pgvector scan analog)."""
        method = self.method
        if method == "auto":
            use_ann = self.n_planes > 0 if approximate is None else approximate
            method = "lsh" if use_ann and self.n_planes > 0 else "exact"
        vecs = self._vectors()
        if method == "pq":
            from .operators.similarity import pq_topk_rerank
            books, codes = self._pq_state()
            hits = pq_topk_rerank(vecs, codes, books, query_vec, k=k,
                                  rerank=max(self.pq_rerank, k))
        elif method == "lsh":
            hits = ann_topk_cosine(vecs, query_vec, k=k,
                                   n_planes=self.n_planes or 8)
        else:
            hits = topk_cosine(vecs, query_vec, k=k)
        hits = (hits.withColumnRenamed("cos", "_similarity")
                .withColumnRenamed("vec_id", "_rowid"))
        cols = self.table.column_names()
        return (
            self.table.df().join(F.broadcast(hits), on="_rowid")
            .select(*cols, "_similarity")
            .orderBy(F.col("_similarity").desc())
        )


def add_embedding_index(table: Table, column: str,
                        embed_fn: Optional[Callable[[str], list]] = None,
                        embedding_col: Optional[str] = None,
                        dim: int = 16, n_planes: int = 0,
                        model: str = "fake-embed-1",
                        method: str = "auto", pq_m: int = 8,
                        pq_k: int = 16, pq_rerank: int = 100) -> EmbeddingIndex:
    """Create an embedding index over a (text) column
    (reference catalog/table.py:461 add_embedding_index).

    The embedding is a computed column: evaluated for existing rows now
    (backfill) and incrementally on every future insert — identical
    maintenance semantics to the reference's index-value computation at
    insert time (reference plan.py:269-324).
    """
    from .exprs import ColumnRef
    from .type_system import ArrayType, ColumnType

    embed_col = embedding_col or f"{column}_embedding"
    if embed_fn is None:
        # default: deterministic offline embedder (functions/llm.py client)
        import asyncio

        from .functions.llm import DeterministicFakeClient

        def embed_fn(text: str, _model: str = model, _dim: int = dim) -> list:
            client = DeterministicFakeClient()
            loop = asyncio.new_event_loop()
            try:
                return loop.run_until_complete(client.embed(text, _model, dim=_dim))
            finally:
                loop.close()

    if column not in table.schema and column not in table.computed:
        raise ValueError(f"table {table.name!r} has no column {column!r}")
    src_type = (table.schema.get(column)
                or table.computed[column].col_type)
    expr = ColumnRef(column, src_type).apply(embed_fn, ArrayType(ColumnType.float_()))
    table.add_computed_column(embed_col, expr)
    idx = EmbeddingIndex(table, column, embed_col, n_planes, method=method,
                         pq_m=pq_m, pq_k=pq_k, pq_rerank=pq_rerank)
    if "_indexes" not in table.__dict__:
        table._indexes = {}
    table._indexes[embed_col] = idx
    table._log("add_embedding_index", column=column, embed_col=embed_col)
    return idx

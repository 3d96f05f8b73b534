"""Document functions: chunk splitting for RAG pipelines.

The analog of the reference's document_splitter iterator
(reference functions/document.py + iterators/document.py:10): explode each
document into overlapping token-window chunks, each with a ``pos`` ordinal —
the component-view pattern (reference exec/component_iteration_node.py).

Spark-first: posexplode over a sequence of chunk starts — pure higher-order
functions, no UDF, so chunking 100 TB of documents is a single codegen'd
narrow transformation (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def document_splitter(df: DataFrame, chunk_tokens: int = 50, overlap: int = 10,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode documents into overlapping token chunks.

    Output: id, pos (chunk ordinal), start_token, n_chunk_tokens, chunk text.
    Stride = chunk_tokens - overlap.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(F.lit(0), F.greatest(F.size(words) - 1, F.lit(0)), F.lit(stride))
    return (
        df.select(F.col(id_col), words.alias("__w"),
                  F.posexplode(starts).alias("pos", "start_token"))
        .select(
            F.col(id_col),
            F.col("pos").cast(T.LongType()).alias("pos"),
            F.col("start_token").cast(T.LongType()).alias("start_token"),
            F.least(F.lit(chunk_tokens), F.size("__w") - F.col("start_token"))
            .cast(T.LongType()).alias("n_chunk_tokens"),
            F.array_join(F.slice("__w", F.col("start_token") + 1, chunk_tokens), " ")
            .alias("chunk"),
        )
    )


def string_splitter(df: DataFrame, separator: str = r"\n\n",
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Separator-based splitter (reference functions/string.py
    string_splitter iterator): one row per separated segment with pos."""
    parts = F.split(F.col(text_col), separator)
    return df.select(
        F.col(id_col), F.posexplode(parts).alias("pos", "segment")
    ).withColumn("pos", F.col("pos").cast(T.LongType()))

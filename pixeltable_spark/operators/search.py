"""Full-text retrieval: BM25 scoring over an inverted term index,
re-expressed as Spark DataFrame ops (the lexical complement to the
embedding-based similarity search in operators/similarity.py; reference
exposes only embedding similarity — pixeltable/index/embedding_index.py —
so this is beyond-reference scale surface for training-data curation:
query-based corpus audits, contamination probes by keyword, eval-set
retrieval).

100 TB design: the corpus-side shuffle is pruned to the QUERY VOCABULARY
before the exchange — the token explode filters on a broadcast literal
set, so the (doc, term) aggregation ships only matching terms no matter
how wide the corpus vocabulary is. Document length is computed in the
scan projection (``size(filter(tokens))``) and carried through the
explode, so no full-vocabulary pass is ever needed. Per-term document
frequencies and the (n_docs, avgdl) scalars are broadcast; the final
(query, doc) score aggregation and per-query top-k are sized by matches,
not by the corpus. Everything is whole-stage-codegen column math — no
UDFs, no driver collect.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokenize_query(q: str) -> list[str]:
    """Driver-side mirror of the corpus tokenizer (lower, trim, split on
    whitespace, drop empties) — query strings are tiny."""
    return [t for t in q.strip().lower().split() if t]


def bm25_topk(df: DataFrame, queries: Sequence[Tuple[str, str]],
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75, k: int = 10) -> DataFrame:
    """Top-k BM25 matches per query: (query_id, doc_id, score, rnk).

    ``queries`` is a small list of (query_id, query_string); duplicate
    query terms weight their contribution by query term frequency.
    Okapi BM25 with the Lucene idf (``ln(1 + (N - df + .5)/(df + .5))``,
    always positive):

        score(q, d) = sum_t qtf_t * idf_t
                      * tf_td*(k1+1) / (tf_td + k1*(1 - b + b*dl_d/avgdl))

    Scores are rounded to 6 decimals BEFORE ranking and ties broken by
    doc_id, so the top-k cut is deterministic across engines (an unrounded
    rank could flip on 1e-15 summation-order noise).

    Plan shape: scan -> explode(tokens) filtered to the broadcast query
    vocabulary -> one (doc, term) aggregate (map-side combine) -> broadcast
    joins against query terms / per-term df / corpus stats -> (query, doc)
    score aggregate -> per-query window top-k."""
    if not queries:
        raise ValueError("bm25_topk: queries must be non-empty")
    qterms: dict[tuple[str, str], int] = {}
    for qid, qs in queries:
        for t in tokenize_query(qs):
            qterms[(qid, t)] = qterms.get((qid, t), 0) + 1
    if not qterms:
        raise ValueError("bm25_topk: no query produced any terms")
    vocab = sorted({t for (_, t) in qterms})

    spark = df.sparkSession
    from ..localframe import local_df
    qdf = local_df(
        spark, [(qid, t, n) for (qid, t), n in sorted(qterms.items())],
        "query_id string, term string, qtf int")

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    docs = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(F.filter(toks, lambda x: x != "")).alias("__dl"))

    # corpus scalars: one row, computed from the same projection and
    # broadcast-crossed into the scoring join (no driver collect)
    stats = docs.agg(F.count("*").alias("n_docs"),
                     F.avg("__dl").alias("avgdl"))

    ex = (docs.select(F.col(id_col), F.col("__dl"),
                      F.explode("__toks").alias("term"))
          .filter(F.col("term").isin(vocab)))   # broadcast literal prune
    tf = (ex.groupBy(id_col, "term")
          .agg(F.count("*").alias("tf"), F.first("__dl").alias("dl")))
    # per-term document frequency over the pruned set: <= |vocab| rows
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dft"))

    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("dft") + 0.5)
                / (F.col("dft") + 0.5))
    tf_norm = (F.col("tf") * (k1 + 1)
               / (F.col("tf")
                  + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))))
    scored = (tf.join(F.broadcast(qdf), "term")
              .join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats))
              .groupBy("query_id", id_col)
              .agg(F.round(F.sum(F.col("qtf") * idf * tf_norm), 6)
                   .alias("score")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("score").desc(), F.col(id_col).asc()))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", id_col, "score", "rnk"))


def top_terms_per_doc(df: DataFrame, k: int = 5,
                      text_col: str = "text", id_col: str = "doc_id",
                      min_df: int = 1,
                      max_df_frac: float = 1.0) -> DataFrame:
    """TF-IDF keyword extraction: the k highest-scoring terms per
    document, score = tf * ln(N / df), rounded to 6 BEFORE ranking with
    a term tiebreak so the cut is engine-deterministic. `min_df` drops
    hapax noise; `max_df_frac` drops corpus-wide boilerplate (both
    filters apply to the df table, which is aggregate-sized).

    Output: (id, term, score, rnk).

    100 TB design: unlike query-driven BM25 this is inherently a
    full-vocabulary pass — but it is ONE (doc, term) aggregate with
    map-side combine (shuffle = distinct doc-term pairs), the df table
    joins back BROADCAST (vocabulary-of-the-corpus sized after the
    min_df cut, which at web scale is the step that keeps it so), and
    the per-doc top-k is a window over each doc's own terms."""
    tf = (df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
            .alias("term"))
          .filter(F.col("term") != "")
          .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    n_docs = df.count()   # metadata-cheap; one scalar
    dfreq = (tf.groupBy("term").agg(F.count("*").alias("dft"))
             .filter((F.col("dft") >= min_df)
                     & (F.col("dft") <= int(max_df_frac * n_docs))))
    score = F.round(F.col("tf") * F.log(F.lit(float(n_docs))
                                        / F.col("dft")), 6)
    w = (Window.partitionBy(id_col)
         .orderBy(F.col("score").desc(), F.col("term").asc()))
    return (tf.join(F.broadcast(dfreq), "term")
            .select(F.col(id_col), "term", score.alias("score"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(id_col, "term", "score", "rnk"))

"""Trainable document-quality classifier (fastText-style: hashed word
features + logistic regression — Joulin et al. 2016; the quality-filter
design of GPT-3 §A / CCNet, where a linear model trained on
"good corpus vs raw corpus" gates pretraining data).

Training follows the pq_train pattern: a BOUNDED deterministic sample
(md5-ordered, so the same model comes out of any cluster size) is fit
driver-side with full-batch gradient descent in numpy — the model is
`n_buckets` weights, far below anything worth a distributed solver.
Scoring is fully distributed and engine-portable: explode hashed
features -> broadcast-join the weight table -> one groupBy(doc) sum ->
sigmoid. Zero Python in the scoring path; the corpus is scanned once and
shuffles only (doc, partial-sum) pairs.

Features reuse text.hashed_word_features (md5-hashed word unigrams), so
a DuckDB oracle reproduces bucket ids — and with the trained weights
embedded as literals, scores — exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hashed_word_features


def _sample_texts(df: DataFrame, text_col: str, n: int) -> list[str]:
    """Deterministic bounded sample: md5-of-text order (cluster-size
    independent), capped driver transfer of n rows."""
    rows = (df.select(F.col(text_col).alias("t"))
            .withColumn("_k", F.md5(F.col("t")))
            .orderBy("_k").limit(n).collect())
    return [r["t"] for r in rows]


def _featurize(text: str, n_buckets: int) -> list[int]:
    out = []
    for tok in text.lower().strip().split():
        if not tok:
            continue
        h = hashlib.md5(tok.encode()).hexdigest()
        out.append(int(h[:14], 16) % n_buckets)
    return out


def train_quality_classifier(pos_df: DataFrame, neg_df: DataFrame,
                             text_col: str = "text", n_buckets: int = 256,
                             iters: int = 100, lr: float = 2.0,
                             sample_n: int = 2000) -> list[float]:
    """Fit logistic weights for P(doc is positive-class): full-batch GD on
    length-normalized hashed-unigram counts from a deterministic sample
    of each corpus. Returns n_buckets + 1 floats: one weight per bucket,
    then the bias as the last element.

    The model is bounded by n_buckets, not the corpus — sampling is the
    standard fastText/CCNet practice and keeps training O(sample), while
    the distributed scoring pass handles the 100 TB side."""
    return train_from_texts(_sample_texts(pos_df, text_col, sample_n),
                            _sample_texts(neg_df, text_col, sample_n),
                            n_buckets=n_buckets, iters=iters, lr=lr)


def train_from_texts(pos_texts: list[str], neg_texts: list[str],
                     n_buckets: int = 256, iters: int = 100,
                     lr: float = 2.0) -> list[float]:
    """Spark-free training core (also what an oracle/driver replays to
    reproduce the exact weights)."""
    import numpy as np

    texts = [(t, 1.0) for t in pos_texts] + [(t, 0.0) for t in neg_texts]
    n = len(texts)
    X = np.zeros((n, n_buckets), dtype=np.float64)
    y = np.empty(n, dtype=np.float64)
    for i, (t, label) in enumerate(texts):
        feats = _featurize(t, n_buckets)
        if feats:
            for b in feats:
                X[i, b] += 1.0
            X[i] /= len(feats)
        y[i] = label
    w = np.zeros(n_buckets, dtype=np.float64)
    bias = 0.0
    for _ in range(iters):
        z = X @ w + bias
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g) / n
        bias -= lr * float(g.mean())
    return [float(v) for v in w] + [float(bias)]


def quality_logit(text: Column, weights: list[float],
                  n_buckets: int | None = None) -> Column:
    """Raw logit as a pure-JVM column: mean weight of the text's hashed
    tokens + bias. `weights` is train_quality_classifier's output
    (n_buckets weights + trailing bias). The weight table rides along as
    an array literal indexed by element_at — no join, no Python; the
    expression tree is O(1) regardless of n_buckets."""
    n_buckets = n_buckets or (len(weights) - 1)
    w_arr = F.array(*[F.lit(float(v)) for v in weights[:n_buckets]])
    feats = hashed_word_features(text, n_buckets)
    total = F.aggregate(
        feats, F.lit(0.0),
        lambda acc, b: acc + F.element_at(w_arr, b + 1))
    cnt = F.size(feats)
    mean = F.when(cnt > 0, total / cnt).otherwise(F.lit(0.0))
    return mean + F.lit(float(weights[n_buckets]))


def quality_probability(text: Column, weights: list[float],
                        n_buckets: int | None = None) -> Column:
    """Sigmoid of :func:`quality_logit` — P(text matches the positive
    corpus)."""
    z = quality_logit(text, weights, n_buckets)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def classify_quality(df: DataFrame, weights: list[float],
                     text_col: str = "text", id_col: str = "doc_id",
                     threshold: float = 0.5) -> DataFrame:
    """Score every document and flag keeps: (id, quality_p, keep).
    Map-only — composes with any scan as a plain projection; the
    threshold filter pushes down."""
    from .text import spread
    p = quality_probability(F.col(text_col), weights)
    return spread(df).select(F.col(id_col), p.alias("quality_p"),
                     (p >= threshold).alias("keep"))

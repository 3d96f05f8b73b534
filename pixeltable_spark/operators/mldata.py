"""ML training-data preparation operators: deterministic dataset
splitting, feature standardization, contrastive negative sampling, and
retrieval-metric evaluation (NDCG / MRR). Beyond-reference scale surface
(the reference's dataset exports — io/pytorch, io/coco — hand the data
off at exactly this point; these operators produce the splits/features/
pairs those exports ship).

100 TB design notes per operator in the docstrings; the common thread is
the engine's md5-keyed deterministic coin (same construction as
SampleClause / mixture_sample): hash math instead of RNG state means
every assignment is reproducible on any cluster, any partitioning, any
retry — which is what makes a training mix auditable.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _md5_key(seed, *cols: Column) -> Column:
    """16-hex md5 prefix of (seed, cols...) — uniform on [0, 16^16)."""
    return F.substring(
        F.md5(F.concat_ws("___", F.lit(str(seed)),
                          *[c.cast("string") for c in cols])), 1, 16)


def split_dataset(df: DataFrame, weights: dict[str, float],
                  id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Assign every row a split label ('train'/'val'/'test'/...) with the
    given weights, deterministically from md5(seed, id): the row's
    uniform draw lands in the cumulative-weight interval of its split.
    Map-only (composes with the scan, no shuffle), reproducible across
    clusters/retries, and stable under appends — an existing row's split
    never changes when new rows arrive (the property random.shuffle-based
    splitting loses). Weights are normalized; the last split absorbs the
    rounding tail so every row gets a label."""
    if not weights:
        raise ValueError("split_dataset: weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split_dataset: weights must sum > 0")
    from ..plans.query import SampleClause
    key = _md5_key(seed, F.col(id_col))
    names = list(weights)
    cum = 0.0
    expr = F.lit(names[-1])   # tail absorbs rounding
    conds = []
    for name in names[:-1]:
        cum += float(weights[name]) / total
        conds.append((name, SampleClause.fraction_to_md5_hex(cum)))
    for name, thresh in reversed(conds):
        expr = F.when(key <= F.lit(thresh), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def standardize(df: DataFrame, cols: Sequence[str],
                by: Sequence[str] = (), clip_sigma: Optional[float] = None
                ) -> DataFrame:
    """Z-score standardization of `cols`, optionally per group, each
    output as `<col>_z`; `clip_sigma` additionally winsorizes to
    [-clip_sigma, +clip_sigma] (outlier clamping AFTER scaling, the
    usual feature-prep order). Groups with zero variance or a single row
    get NULL (no evidence, not 0).

    Plan: grouped stats ride ONE window pass over the `by` partitioning
    (global stats: a 1-row aggregate broadcast-crossed in — Spark turns
    the empty-frame window into a single-partition bottleneck, so the
    global case avoids Window entirely). No shuffle of the data beyond
    the per-group exchange; column math stays in codegen."""
    if not cols:
        raise ValueError("standardize: cols must be non-empty")
    out = df
    if by:
        w = Window.partitionBy(*[F.col(k) for k in by])
        stats = {c: (F.avg(c).over(w), F.stddev_samp(c).over(w))
                 for c in cols}
        for c in cols:
            mu, sd = stats[c]
            z = F.when(sd > 0, (F.col(c) - mu) / sd)
            if clip_sigma is not None:
                z = F.least(F.greatest(z, F.lit(-float(clip_sigma))),
                            F.lit(float(clip_sigma)))
            out = out.withColumn(f"{c}_z", z)
        return out
    agg = df.agg(*[e for c in cols
                   for e in (F.avg(c).alias(f"__mu_{c}"),
                             F.stddev_samp(c).alias(f"__sd_{c}"))])
    out = df.crossJoin(F.broadcast(agg))
    for c in cols:
        mu, sd = F.col(f"__mu_{c}"), F.col(f"__sd_{c}")
        z = F.when(sd > 0, (F.col(c) - mu) / sd)
        if clip_sigma is not None:
            z = F.least(F.greatest(z, F.lit(-float(clip_sigma))),
                        F.lit(float(clip_sigma)))
        out = out.withColumn(f"{c}_z", z)
    return out.drop(*[f"__{p}_{c}" for c in cols for p in ("mu", "sd")])


def negative_samples(df: DataFrame, id_col: str = "doc_id", k: int = 4,
                     prefix_len: int = 2, seed: int = 0) -> DataFrame:
    """Contrastive negative mining: up to `k` pseudo-random partners per
    anchor, deterministic, with NO cross join and NO driver collect.
    Every row is assigned a hash bucket (md5 hex prefix — 16^prefix_len
    buckets); each anchor probes k buckets derived from md5(seed, id, j)
    and takes the candidate minimizing md5(seed, id, j, cand) there
    (excluding itself). Output: (id, neg_id, slot).

    Anchors can receive FEWER than k negatives when a probed bucket is
    empty or holds only the anchor — at production scale (rows >>
    16^prefix_len) this is vanishingly rare; raise prefix_len as the
    corpus grows so bucket size (n / 16^prefix_len) stays O(tens).

    Plan: one equi-shuffle of (anchor-probe, bucket) rows against the
    bucketed corpus, candidate set sized n*k*bucket_size, one min_by
    aggregate. All hashing is codegen md5 on hex strings — portable to
    any engine for auditing (the oracle replays it verbatim)."""
    if k < 1:
        raise ValueError("negative_samples: k must be >= 1")
    plen = int(prefix_len)
    if not 1 <= plen <= 8:
        raise ValueError("negative_samples: prefix_len must be in 1..8")

    def bucket_of(*cols: Column) -> Column:
        return F.substring(
            F.md5(F.concat_ws("___", F.lit(str(seed)),
                              *[c.cast("string") for c in cols])),
            1, plen)

    corpus = df.select(F.col(id_col).alias("__cand"),
                       bucket_of(F.col(id_col)).alias("__bkt"))
    probes = df.select(
        F.col(id_col),
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("slot")
    ).withColumn("__bkt", bucket_of(F.col(id_col), F.col("slot"),
                                    F.lit("probe")))
    cand = (probes.join(corpus, "__bkt")
            .filter(F.col("__cand") != F.col(id_col)))
    pick = F.md5(F.concat_ws("___", F.lit(str(seed)),
                             F.col(id_col).cast("string"),
                             F.col("slot").cast("string"),
                             F.col("__cand").cast("string")))
    return (cand.groupBy(id_col, "slot")
            .agg(F.min_by("__cand", pick).alias("neg_id"))
            .select(id_col, F.col("neg_id"), "slot"))


def ranking_metrics(df: DataFrame, query_col: str, rel_col: str,
                    rank_col: str, k: int = 10) -> DataFrame:
    """Per-query retrieval metrics over an already-ranked result list
    (e.g. bm25_topk output joined to graded relevance):

    * ndcg  — DCG@k / IDCG@k with DCG = sum(rel / log2(rank+1)); the
      ideal ranking orders by relevance DESC (ties by the observed rank,
      so IDCG is deterministic). 0 when the query has no relevant hits.
    * mrr   — 1 / first rank with rel > 0 (0 if none).
    * hits  — relevant results within the top k.

    One shuffle on the query key: the ideal ordering is a window over
    the SAME partitioning, and the final rollup reuses it."""
    w_ideal = (Window.partitionBy(query_col)
               .orderBy(F.col(rel_col).desc(), F.col(rank_col).asc()))
    ideal_rank = F.row_number().over(w_ideal)
    scored = (df.filter(F.col(rank_col) <= k)
              .select(F.col(query_col), F.col(rel_col), F.col(rank_col),
                      ideal_rank.alias("__ir")))
    dcg = F.sum(F.col(rel_col) / F.log2(F.col(rank_col) + 1))
    idcg = F.sum(F.col(rel_col) / F.log2(F.col("__ir") + 1))
    first_hit = F.min(F.when(F.col(rel_col) > 0, F.col(rank_col)))
    return (scored.groupBy(query_col)
            .agg(dcg.alias("__dcg"), idcg.alias("__idcg"),
                 first_hit.alias("__fh"),
                 F.count(F.when(F.col(rel_col) > 0, F.lit(1)))
                 .alias("hits"))
            .select(
                F.col(query_col),
                F.round(F.when(F.col("__idcg") > 0,
                               F.col("__dcg") / F.col("__idcg"))
                        .otherwise(0.0), 6).alias("ndcg"),
                F.round(F.coalesce(1.0 / F.col("__fh"), F.lit(0.0)), 6)
                .alias("mrr"),
                F.col("hits")))


def weighted_sample_n(df: DataFrame, n: int, weight_col: str,
                      by: Sequence[str] = (), id_col: str = "doc_id",
                      seed: int = 0) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row draws u = md5-uniform(seed, id) and the n
    rows with the largest ln(u)/weight are kept (equivalently u^(1/w) —
    inclusion probability proportional to weight, exactly the reservoir
    key). Rows with NULL or non-positive weight are excluded.

    Same auditability property as split_dataset: hash math instead of
    RNG state, so the sample is reproducible on any cluster/partitioning
    and REPLAYABLE IN SQL for checking (the 13-hex md5 prefix converts
    to the identical 52-bit integer in any engine).

    One window pass per group (ties impossible — u is id-unique), no
    global sort: the per-group top-n is a rank over the `by`
    partitioning, the same shape as any top-k-per-group."""
    if n < 1:
        raise ValueError("weighted_sample_n: n must be >= 1")
    w = F.col(weight_col).cast("double")
    v = F.conv(F.substring(
        F.md5(F.concat_ws("___", F.lit(str(seed)),
                          F.col(id_col).cast("string"))), 1, 13),
        16, 10).cast("long")
    u = (v.cast("double") + 1.0) / F.lit(float(1 << 52))
    key = F.log(u) / w
    win = (Window.partitionBy(*[F.col(k) for k in by])
           .orderBy(F.col("__es_key").desc()))
    return (df.filter(w.isNotNull() & (w > 0))
            .withColumn("__es_key", key)
            .withColumn("__es_rnk", F.row_number().over(win))
            .filter(F.col("__es_rnk") <= n)
            .drop("__es_key", "__es_rnk"))


def robust_scale(df: DataFrame, cols: Sequence[str],
                 by: Sequence[str] = ()) -> DataFrame:
    """Median/IQR scaling (sklearn RobustScaler): (x - median) / (p75 -
    p25) per column as `<col>_r`, optionally per group — the outlier-
    resistant complement to standardize() (a single 1e9 outlier moves a
    z-score's mean/std arbitrarily; it moves the median/IQR not at
    all). Zero-IQR groups get NULL.

    Plan: percentiles are holistic, so they ride ONE grouped aggregate
    (one shared percentile buffer per column — the q87 lesson) and join
    back on the group keys (broadcast when the group count is small;
    the 1-row global case is a broadcast cross)."""
    if not cols:
        raise ValueError("robust_scale: cols must be non-empty")
    pcts = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    aggs = []
    for c in cols:
        arr = F.percentile(F.col(c), pcts)
        aggs.append(F.element_at(arr, 2).alias(f"__med_{c}"))
        aggs.append((F.element_at(arr, 3) - F.element_at(arr, 1))
                    .alias(f"__iqr_{c}"))
    if by:
        stats = df.groupBy(*[F.col(k) for k in by]).agg(*aggs)
        out = df.join(F.broadcast(stats), list(by))
    else:
        out = df.crossJoin(F.broadcast(df.agg(*aggs)))
    for c in cols:
        med, iqr = F.col(f"__med_{c}"), F.col(f"__iqr_{c}")
        out = out.withColumn(
            f"{c}_r", F.when(iqr > 0, (F.col(c) - med) / iqr))
    return out.drop(*[f"__{p}_{c}" for c in cols for p in ("med", "iqr")])


def shuffle_shards(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                   seed: int = 0) -> DataFrame:
    """Deterministic global shuffle + sharding — the step right before a
    training export (to_pytorch / webdataset): fix an epoch-level
    example order by seed, split into ~equal shards, and make BOTH
    reproducible on any cluster, any partitioning, any retry.

      shard       = md5(seed·shard-tag, id) mod n_shards
      shuffle_key = md5(seed·order-tag, id)   (intra-shard order)

    A different seed reshuffles globally; the same seed always yields
    byte-identical shards. 100 TB plan: one hash projection + ONE
    shuffle (repartition on shard) + a partition-local sort — the
    minimum data motion any global shuffle needs. No global total
    order or per-shard rank window is ever built (that would funnel
    each shard through one reducer for numbering); the intra-shard
    order IS the sort key, written clustered."""
    if n_shards <= 0:
        raise ValueError("shuffle_shards: n_shards must be positive")
    kid = F.col(id_col).cast("string")

    def h(tag: str) -> Column:
        return F.conv(F.substring(
            F.md5(F.concat_ws("___", F.lit(f"{seed}_{tag}"), kid)),
            1, 14), 16, 10).cast("long")

    out = (df.withColumn("shard",
                         F.pmod(h("shard"), F.lit(n_shards)).cast("int"))
           .withColumn("shuffle_key", h("order")))
    return out.repartition(F.col("shard")) \
        .sortWithinPartitions("shard", "shuffle_key")

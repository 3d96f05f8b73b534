"""Time-series bucketing and gap filling (the TimescaleDB
``time_bucket_gapfill`` + ``locf``/``interpolate`` family, re-expressed
as Spark DataFrame ops — beyond-reference scale surface alongside the
as-of/range joins in operators/joins.py).

100 TB design: one groupBy per (keys, bucket) with map-side partial
aggregation; the dense bucket spine is generated EXECUTOR-side with
``sequence()`` + ``explode`` per group (never a driver loop or a
cross join against a calendar table); fills are single-pass window
functions over the per-group bucket order. Everything stays in
whole-stage codegen — no UDFs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts: Column, every_s: int) -> Column:
    """Epoch-aligned bucket start (as epoch seconds, long): the
    TimescaleDB time_bucket(interval, ts) analog. Long output avoids
    engine-specific timezone rendering in cross-engine comparisons."""
    return (F.floor(F.unix_timestamp(ts) / every_s) * every_s).cast("long")


def bucket_agg(df: DataFrame, ts_col: str, every_s: int,
               aggs: dict, by: Sequence[str] = ()) -> DataFrame:
    """groupBy(keys, time_bucket) with named aggregates: aggs maps output
    name -> (agg_fn_name, col). One shuffle, map-side combine."""
    b = time_bucket(F.col(ts_col), every_s).alias("bucket")
    exprs = [getattr(F, fn)(c).alias(name)
             for name, (fn, c) in aggs.items()]
    return df.groupBy(*[F.col(k) for k in by], b).agg(*exprs)


def gap_fill(df: DataFrame, ts_col: str, val_col: str, every_s: int,
             by: Sequence[str] = (), agg: str = "avg",
             fill: str = "locf",
             max_fill_buckets: Optional[int] = None) -> DataFrame:
    """Dense per-group time series: aggregate `val_col` into
    `every_s`-second buckets, generate every missing bucket between each
    group's min and max, and fill:

    * ``fill='null'``   — gaps stay NULL (pure densify),
    * ``fill='locf'``   — last observation carried forward,
    * ``fill='linear'`` — linear interpolation between the neighboring
      observed buckets (edges stay NULL, like Timescale's interpolate).

    Output: by..., bucket (epoch seconds, long), value (double),
    filled (boolean — True where the value was synthesized).

    ``max_fill_buckets`` guards the skew case where one group spans years
    of empty calendar (sequence() would materialize millions of rows for
    a single group): groups whose span exceeds it raise rather than
    silently exploding an executor."""
    if fill not in ("null", "locf", "linear"):
        raise ValueError(f"fill must be null|locf|linear, got {fill!r}")
    agged = bucket_agg(df, ts_col, every_s, {"value": (agg, val_col)}, by)
    keys = [F.col(k) for k in by]
    spans = agged.groupBy(*keys).agg(F.min("bucket").alias("__lo"),
                                     F.max("bucket").alias("__hi"))
    if max_fill_buckets is not None:
        bad = (F.col("__hi") - F.col("__lo")) / every_s > max_fill_buckets
        spans = spans.withColumn(
            "__lo",
            F.when(bad, F.raise_error(F.concat(
                F.lit(f"gap_fill: group span exceeds max_fill_buckets="
                      f"{max_fill_buckets} at "),
                F.concat_ws(",", *keys) if by else F.lit("<global>"))))
            .otherwise(F.col("__lo")))
    spine = spans.select(
        *keys,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"),
                             F.lit(every_s))).alias("bucket"))
    dense = (spine.join(agged, [*by, "bucket"], "left")
             .withColumn("filled", F.col("value").isNull()))
    w = Window.partitionBy(*keys).orderBy("bucket")
    if fill == "locf":
        dense = dense.withColumn(
            "value",
            F.last("value", ignorenulls=True)
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    elif fill == "linear":
        prev_w = w.rowsBetween(Window.unboundedPreceding, -1)
        next_w = w.rowsBetween(1, Window.unboundedFollowing)
        obs_b = F.when(~F.col("filled"), F.col("bucket"))
        pv = F.last("value", ignorenulls=True).over(prev_w)
        pb = F.last(obs_b, ignorenulls=True).over(prev_w)
        nv = F.first("value", ignorenulls=True).over(next_w)
        nb = F.first(obs_b, ignorenulls=True).over(next_w)
        interp = pv + (nv - pv) * (F.col("bucket") - pb) / (nb - pb)
        dense = dense.withColumn(
            "value",
            F.when(~F.col("filled"), F.col("value")).otherwise(interp))
    return dense.select(*keys, "bucket",
                        F.col("value").cast("double").alias("value"),
                        "filled")


def ohlc(df: DataFrame, ts_col: str, val_col: str, every_s: int,
         by: Sequence[str] = (),
         tiebreak_col: Optional[str] = None) -> DataFrame:
    """Per-bucket open/high/low/close (the candlestick rollup): one
    groupBy with min_by/max_by on the event time — deterministic, unlike
    first()/last() whose result depends on partition order. With equal
    timestamps, `tiebreak_col` (e.g. an event id) makes open/close
    well-defined; required when the data can carry ties."""
    b = time_bucket(F.col(ts_col), every_s).alias("bucket")
    order = F.struct(F.col(ts_col), *(
        [F.col(tiebreak_col)] if tiebreak_col else []))
    return df.groupBy(*[F.col(k) for k in by], b).agg(
        F.min_by(val_col, order).alias("open"),
        F.max(val_col).alias("high"),
        F.min(val_col).alias("low"),
        F.max_by(val_col, order).alias("close"),
        F.count(val_col).alias("n"))


def cohort_retention(df: DataFrame, ts_col: str, by: str = "user_id",
                     period_s: int = 7 * 86400) -> DataFrame:
    """Cohort retention matrix: entities are cohorted by the period of
    their FIRST event; for each (cohort, period offset) count how many of
    the cohort's entities were active, and the retention rate relative to
    the cohort's size (its offset-0 count — every entity is active in its
    own first period by construction).

    Output: (cohort, offset, users, retention) — cohort is the epoch-
    second period start (long), offset the whole number of periods since
    it (int).

    100 TB design: ONE shuffle over raw events. Per entity, the first
    period and the distinct-period set come out of the same groupBy
    (``min`` + ``collect_set`` over period starts — the set is bounded by
    the calendar, a few hundred entries per entity, not by event count,
    and map-side partial aggregation dedups within each input partition).
    The explode to (cohort, offset) rows and the final rollup are sized
    by entities x active periods; the retention denominator is a window
    over the handful of output rows."""
    bucket = time_bucket(F.col(ts_col), period_s)
    per_entity = (df.select(F.col(by), bucket.alias("__b"))
                  .groupBy(by)
                  .agg(F.min("__b").alias("__cohort"),
                       F.collect_set("__b").alias("__active")))
    hits = per_entity.select(
        F.col("__cohort").alias("cohort"),
        F.explode("__active").alias("__b")
    ).select("cohort",
             ((F.col("__b") - F.col("cohort")) / period_s)
             .cast("int").alias("offset"))
    counts = hits.groupBy("cohort", "offset").agg(
        F.count("*").alias("users"))
    w = Window.partitionBy("cohort")
    size = F.max(F.when(F.col("offset") == 0, F.col("users"))).over(w)
    return counts.select(
        "cohort", "offset", "users",
        F.round(F.col("users") / size, 6).alias("retention"))


def rolling_zscore(df: DataFrame, ts_col: str, val_col: str,
                   by: Sequence[str] = (), lookback: int = 20,
                   z_threshold: float = 3.0,
                   order_cols: Sequence[str] = ()) -> DataFrame:
    """Streaming-style anomaly score: each row's value against the mean
    and sample stddev of the previous `lookback` rows (the trailing
    window EXCLUDES the current row, so an outlier can't mask itself).
    Rows with fewer than 2 prior observations or zero variance get a
    NULL z (not 0 — "no evidence" is not "not anomalous").

    Output: input keys + (ts, value, z, is_anomaly). One window pass,
    partitioned on `by` — no shuffle beyond the per-key sort; `order_cols`
    appends tiebreak columns so the frame is deterministic when
    timestamps can collide."""
    w = (Window.partitionBy(*[F.col(k) for k in by])
         .orderBy(F.col(ts_col).asc(),
                  *[F.col(c).asc() for c in order_cols])
         .rowsBetween(-lookback, -1))
    mu = F.avg(val_col).over(w)
    sd = F.stddev_samp(val_col).over(w)
    nprev = F.count(val_col).over(w)
    z = F.when((nprev >= 2) & (sd > 0),
               F.round((F.col(val_col) - mu) / sd, 6))
    return df.select(
        *[F.col(k) for k in by], F.col(ts_col),
        F.col(val_col).alias("value"), z.alias("z"),
        (F.abs(z) > z_threshold).alias("is_anomaly"))


def funnel(df: DataFrame, ts_col: str, type_col: str,
           steps: Sequence[str], by: str = "user_id",
           within_s: Optional[int] = None) -> DataFrame:
    """Ordered-funnel conversion (the Amplitude/Mixpanel funnel report):
    how many entities completed step 1, then step 2 strictly after their
    earliest step-1 completion, and so on — greedy earliest-first
    matching, which is equivalent to the nested ``min(ts) > prev_min``
    formulation (each stage's completion time is the minimum qualifying
    timestamp given the previous stage's minimum).

    ``within_s`` additionally requires every later step to land within
    that many seconds of the entity's step-1 time (the conversion-window
    knob); ``None`` means unbounded.

    Output: (step, event_type, users, conversion) — one row per step,
    conversion = users / step-1 users, rounded to 6.

    100 TB design: ONE shuffle. Events are filtered to the funnel's
    event types in the scan, grouped per entity with the (ts, step)
    pairs sorted executor-side (``array_sort`` on structs — no window,
    no per-step join cascade: a k-step funnel as iterated joins would
    shuffle k times), and the funnel state machine runs as a JVM
    ``aggregate()`` fold over each entity's sorted events. Per-entity
    memory is bounded by that entity's funnel-relevant events — the
    standard sort-within-group funnel shape; pathological single
    entities (bots) are the caller's filter. The final per-step rollup
    is a handful of rows."""
    n = len(steps)
    if n == 0:
        raise ValueError("funnel: steps must be non-empty")
    if len(set(steps)) != n:
        raise ValueError("funnel: step event types must be distinct")
    step_arr = F.array(*[F.lit(s) for s in steps])
    ev = (df.filter(F.col(type_col).isin(list(steps)))
          .select(F.col(by),
                  F.struct(
                      F.col(ts_col).alias("t"),
                      (F.array_position(step_arr, F.col(type_col)) - 1)
                      .cast("int").alias("s")).alias("__ev")))
    per_entity = ev.groupBy(by).agg(
        F.array_sort(F.collect_list("__ev")).alias("__evs"))

    # fold state: k = steps completed, tp = time of last completed step,
    # t0 = time of step 1 (the conversion-window anchor)
    acc0 = F.struct(F.lit(0).cast("int").alias("k"),
                    F.lit(None).cast("timestamp").alias("tp"),
                    F.lit(None).cast("timestamp").alias("t0"))

    def advance(acc, e):
        ok = (acc["k"] < n) & (e["s"] == acc["k"]) \
            & ((acc["k"] == 0) | (e["t"] > acc["tp"]))
        if within_s is not None:
            ok = ok & ((acc["k"] == 0)
                       | (e["t"] <= acc["t0"]
                          + F.expr(f"INTERVAL {int(within_s)} SECONDS")))
        return F.when(ok, F.struct(
            (acc["k"] + 1).alias("k"), e["t"].alias("tp"),
            F.when(acc["k"] == 0, e["t"]).otherwise(acc["t0"]).alias("t0"))
        ).otherwise(acc)

    reached = per_entity.select(
        F.aggregate("__evs", acc0, advance)["k"].alias("__k"))
    # each entity emits one row per completed step; sequence() is guarded
    # (sequence(1, 0) would count DOWN in Spark, not return empty)
    per_step = (reached
                .filter(F.col("__k") >= 1)
                .select(F.explode(F.sequence(F.lit(1), F.col("__k")))
                        .alias("step"))
                .groupBy("step").agg(F.count("*").alias("users")))
    w_all = Window.partitionBy()
    first_users = F.max(F.when(F.col("step") == 1, F.col("users"))) \
        .over(w_all)
    return (per_step
            .withColumn("event_type",
                        F.element_at(step_arr, F.col("step")))
            .withColumn("conversion",
                        F.round(F.col("users") / first_users, 6))
            .select("step", "event_type", "users", "conversion"))


def scd2(df: DataFrame, key_cols: Sequence[str], ts_col: str,
         attr_cols: Sequence[str],
         order_cols: Sequence[str] = ()) -> DataFrame:
    """Slowly-changing-dimension type 2 build: collapse an update/event
    stream into validity intervals per key — one output row per ATTRIBUTE
    CHANGE, with ``valid_from`` (the change time), ``valid_to`` (the next
    change, NULL while current) and ``is_current``. Consecutive rows with
    identical attributes merge into one interval; comparison is
    null-safe (NULL -> NULL is "no change").

    100 TB design: one shuffle on the key columns; change detection is a
    lag() over the per-key order and interval close-out a lead() over the
    SAME partitioning (the filter between them preserves partitioning —
    no second exchange, just a re-sort). ``order_cols`` appends tiebreak
    columns for streams that can carry duplicate timestamps."""
    if not attr_cols:
        raise ValueError("scd2: attr_cols must be non-empty")
    keys = [F.col(k) for k in key_cols]
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    cur = F.struct(*[F.col(c) for c in attr_cols])
    prev = F.lag(cur).over(w)
    changed = ~cur.eqNullSafe(prev)   # first row: lag NULL -> changed
    marked = df.withColumn("__chg", changed).filter(F.col("__chg"))
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (marked.select(
        *keys, *[F.col(c) for c in attr_cols],
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"))
        .withColumn("is_current", F.col("valid_to").isNull()))


def transition_matrix(df: DataFrame, ts_col: str, type_col: str,
                      by: str = "user_id",
                      order_cols: Sequence[str] = ()) -> DataFrame:
    """First-order Markov transition estimates between event types:
    (cur, nxt, n, prob) with prob = P(next = nxt | current = cur),
    estimated from each entity's time-ordered stream (transitions never
    cross entities). One shuffle on the entity key for the lead()
    window; the (cur, nxt) rollup is vocabulary-sized and its row
    normalizer is a window over that tiny output."""
    w = (Window.partitionBy(F.col(by))
         .orderBy(F.col(ts_col).asc(),
                  *[F.col(c).asc() for c in order_cols]))
    nxt = F.lead(F.col(type_col)).over(w)
    pairs = (df.select(F.col(type_col).alias("cur"), nxt.alias("nxt"))
             .filter(F.col("nxt").isNotNull()))
    counts = pairs.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    row_total = F.sum("n").over(Window.partitionBy("cur"))
    return counts.select(
        "cur", "nxt", "n",
        F.round(F.col("n") / row_total, 6).alias("prob"))


def top_paths(df: DataFrame, ts_col: str, type_col: str,
              by: str = "user_id", n: int = 3, k: int = 10,
              order_cols: Sequence[str] = ()) -> DataFrame:
    """User-journey mining: the k most common length-n event-type paths
    (consecutive subsequences of each entity's time-ordered stream),
    as (path, n) with '>'-joined type names and a path-string tiebreak
    so the cut is deterministic.

    ONE shuffle: per-entity ordered streams via array_sort(collect_list)
    (the funnel shape), n-grams generated executor-side with a
    slice-under-transform (no window, no self-joins), then a
    vocabulary-sized rollup + top-k."""
    if n < 1:
        raise ValueError("top_paths: n must be >= 1")
    ev = F.struct(F.col(ts_col).alias("t"),
                  *[F.col(c).alias(f"o{i}")
                    for i, c in enumerate(order_cols)],
                  F.col(type_col).alias("e"))
    per_entity = (df.groupBy(F.col(by))
                  .agg(F.array_sort(F.collect_list(ev)).alias("__evs"))
                  .select(F.expr("transform(__evs, x -> x.e)")
                          .alias("__types")))
    # sequence(1, 0) counts DOWN in Spark (same trap the funnel guards):
    # entities with fewer than n events contribute an empty array
    grams = per_entity.select(F.explode(F.expr(
        f"CASE WHEN size(__types) >= {n} THEN "
        f"transform(sequence(1, size(__types) - {n - 1}), "
        f"i -> array_join(slice(__types, i, {n}), '>')) "
        f"ELSE array() END")).alias("path"))
    counts = grams.groupBy("path").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return (counts.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("path", "n", "rnk"))


def twap(df: DataFrame, ts_col: str, val_col: str, every_s: int,
         by: Sequence[str] = (),
         order_cols: Sequence[str] = ()) -> DataFrame:
    """Time-weighted average per bucket (the irregular-sampling TWAP —
    a plain avg() over-weights bursts): each observation's value holds
    from its timestamp until the next observation in the same (keys,
    bucket) partition, or the bucket's end for the last one; the bucket
    value is the duration-weighted mean. Weights are integer
    MICROSECONDS (no float time math).

    Output: (by..., bucket, twap, n). One shuffle: the lead() window
    and the (keys, bucket) rollup share the partitioning."""
    us = F.unix_micros(F.col(ts_col))
    b = time_bucket(F.col(ts_col), every_s)
    src = df.select(*[F.col(k) for k in by], us.alias("__us"),
                    b.alias("bucket"),
                    F.col(val_col).cast("double").alias("__v"),
                    *[F.col(c) for c in order_cols])
    w = (Window.partitionBy(*[F.col(k) for k in by], F.col("bucket"))
         .orderBy(F.col("__us").asc(),
                  *[F.col(c).asc() for c in order_cols]))
    bucket_end_us = (F.col("bucket") + every_s) * 1_000_000
    dur = F.coalesce(F.lead("__us").over(w), bucket_end_us) - F.col("__us")
    agged = (src.withColumn("__dur", dur)
             .groupBy(*[F.col(k) for k in by], "bucket")
             .agg(F.sum(F.col("__v") * F.col("__dur")).alias("__vw"),
                  F.sum("__dur").alias("__w"),
                  F.count("*").alias("n")))
    return agged.select(
        *[F.col(k) for k in by], "bucket",
        F.round(F.when(F.col("__w") > 0,
                       F.col("__vw") / F.col("__w")), 6).alias("twap"),
        "n")


def rolling_corr(df: DataFrame, ts_col: str, x_col, y_col,
                 by: Sequence[str] = (), lookback: int = 50,
                 min_obs: int = 10,
                 order_cols: Sequence[str] = ()) -> DataFrame:
    """Trailing-window Pearson correlation between two series (pairs
    monitoring, sensor drift, trend detection — pass the timestamp
    itself as `x_col` and the correlation becomes a trend-strength
    score in [-1, 1]). The window INCLUDES the current row (unlike
    rolling_zscore's self-excluding frame — correlation is a
    relationship measure, not an anomaly score). Windows with fewer
    than `min_obs` rows get NULL.

    One window pass on the `by` partitioning; corr() is an algebraic
    co-moment aggregate, so the frame slides in O(1) per row."""
    x = (F.unix_micros(F.col(x_col)).cast("double")
         if isinstance(x_col, str) and x_col == ts_col
         else F.col(x_col).cast("double"))
    w = (Window.partitionBy(*[F.col(k) for k in by])
         .orderBy(F.col(ts_col).asc(),
                  *[F.col(c).asc() for c in order_cols])
         .rowsBetween(-(lookback - 1), 0))
    n = F.count(F.col(y_col)).over(w)
    c = F.corr(x, F.col(y_col).cast("double")).over(w)
    return df.select(
        *[F.col(k) for k in by], F.col(ts_col),
        F.round(F.when(n >= min_obs, c), 6).alias("corr"),
        n.alias("n_window"))

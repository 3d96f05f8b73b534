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

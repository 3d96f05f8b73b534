"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.11 north-star; no reference counterpart — the reference's
engine is batch-incremental only, reference catalog/table_version.py:1076).

Two operators Spark's built-in streaming aggregates cannot express:

* stream_dedup_stateful — exactly-once key dedup across micro-batches
  with TTL'd state (the streaming form of the exact-dedup operator,
  operators/dedup.py): per-key GroupState stores first-seen, duplicates
  are dropped, state expires on an event-time timeout so 100 TB of
  historical keys never accumulates in the state store.

* stateful_running_uda — the @uda Aggregator surface (functions/udf.py)
  applied INCREMENTALLY over a stream: per-key state carries the pickled
  aggregator; each micro-batch updates it and emits the running value.
  This is the streaming continuation of the batch running-UDA plan
  (plans/query.py _global_running_uda_two_pass).
"""

from __future__ import annotations

import pickle
from typing import Any, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_dedup_stateful(stream_df: DataFrame, id_col: str = "event_id",
                          ts_col: str = "ts",
                          watermark: str = "1 hour",
                          state_ttl_ms: int = 3_600_000,
                          num_buckets: Optional[int] = None) -> DataFrame:
    """Drop rows whose `id_col` was already seen, across micro-batches.

    State: one boolean per live key, expiring `state_ttl_ms` after last
    touch (EventTimeTimeout keyed to the watermark) — bounded state at any
    scale. Emits each key's FIRST row only.

    `num_buckets`: when set, group state by `hash(key) % num_buckets`
    instead of per-key. applyInPandasWithState invokes the Python fn once
    per GROUP per micro-batch, so per-key grouping pays one Arrow
    round-trip per distinct key — ~7.5k calls at sf0.1. Bucketed state
    pays exactly `num_buckets` calls and keeps a (key -> last-event-ms)
    dict per bucket, pruned against the watermark each batch, so total
    state is the same live-key set either way. Size `num_buckets` to a
    few × cluster cores: state per bucket = live_keys / num_buckets.
    """
    if num_buckets is not None:
        return _stream_dedup_bucketed(stream_df, id_col, ts_col, watermark,
                                      state_ttl_ms, num_buckets)
    out_schema = T.StructType(
        [f for f in stream_df.schema.fields])
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    col_names = [f.name for f in out_schema.fields]

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        first_rows = []
        max_ts_ms = 0
        for pdf in pdfs:
            if len(pdf) > 0:
                batch_max = int(pdf[ts_col].max().value // 1_000_000)
                max_ts_ms = max(max_ts_ms, batch_max)
            if not seen and len(pdf) > 0:
                first_rows.append(pdf.iloc[:1])
                seen = True
        state.update((True,))
        # TTL anchored to the key's own newest EVENT time, not the current
        # watermark (which starts at 0 — anchoring there would expire all
        # first-run state as soon as real event times arrive)
        if max_ts_ms > 0:
            state.setTimeoutTimestamp(max_ts_ms + state_ttl_ms)
        if first_rows:
            yield pd.concat(first_rows)[col_names]

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.col(id_col))
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout)
    )


def _stream_dedup_bucketed(stream_df: DataFrame, id_col: str, ts_col: str,
                           watermark: str, state_ttl_ms: int,
                           num_buckets: int) -> DataFrame:
    """Coarse-keyed dedup state: one GroupState per hash bucket, holding
    parallel arrays (keys, last-event-ms). Identical emit semantics to the
    per-key path — each key's first-arriving row, duplicates dropped —
    but the Python fn runs num_buckets times per micro-batch instead of
    once per distinct key."""
    out_schema = T.StructType([f for f in stream_df.schema.fields])
    col_names = [f.name for f in out_schema.fields]
    state_schema = T.StructType([
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("ts_ms", T.ArrayType(T.LongType())),
    ])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            keys, tss = state.get
            seen = dict(zip(keys, tss))
        else:
            seen = {}
        out = []
        max_ts = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            kser = pdf[id_col].astype(str)
            ts_ms = pdf[ts_col].astype("int64") // 1_000_000
            max_ts = max(max_ts, int(ts_ms.max()))
            firsts = pdf[~kser.isin(seen)].drop_duplicates(
                subset=[id_col], keep="first")
            if len(firsts) > 0:
                out.append(firsts[col_names])
            for k, t in ts_ms.groupby(kser).max().items():
                prev = seen.get(k)
                if prev is None or t > prev:
                    seen[k] = int(t)
        # prune keys whose TTL already elapsed relative to the watermark —
        # keeps each bucket's array bounded by its LIVE keys even though
        # the bucket itself never times out while any key is active
        wm = state.getCurrentWatermarkMs()
        if wm > 0:
            seen = {k: t for k, t in seen.items()
                    if t + state_ttl_ms >= wm}
        state.update((list(seen.keys()), list(seen.values())))
        if max_ts > 0:
            state.setTimeoutTimestamp(max_ts + state_ttl_ms)
        if out:
            yield pd.concat(out)

    return (
        stream_df
        .withColumn("_dedup_bkt",
                    F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                           F.lit(num_buckets)))
        .withWatermark(ts_col, watermark)
        .groupBy("_dedup_bkt")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout)
    )


def stateful_running_uda(stream_df: DataFrame, uda_cls: type,
                         key_col: str, value_col: str,
                         ts_col: str = "ts",
                         watermark: str = "1 hour",
                         state_ttl_ms: int = 86_400_000,
                         out_type: Optional[T.DataType] = None) -> DataFrame:
    """Run an @uda Aggregator class incrementally per key over a stream.

    Each micro-batch: unpickle the key's aggregator from GroupState,
    update() it with the batch's values (in ts order), emit one row
    (key, n_updates, value) with the running value, repickle. The state
    per key is one aggregator blob — constant-size for bounded aggregators
    (sums, counts, sketches), the only state shape that survives 100 TB.
    """
    out_type = out_type or T.DoubleType()
    key_type = stream_df.schema[key_col].dataType
    out_schema = T.StructType([
        T.StructField(key_col, key_type),
        T.StructField("n_updates", T.LongType()),
        T.StructField("value", out_type),
    ])
    state_schema = T.StructType([
        T.StructField("blob", T.BinaryType()),
        T.StructField("n", T.LongType()),
    ])
    # @uda wraps the class in a Function; accept either form
    cls = getattr(uda_cls, "uda_class", uda_cls)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        # state carries the aggregator's __dict__ (plain values — always
        # picklable), NOT the instance: the class object itself travels in
        # this closure via cloudpickle, so user classes defined in __main__
        # or test modules work on workers
        agg = cls()
        if state.exists:
            blob, n = state.get
            agg.__dict__.update(pickle.loads(bytes(blob)))
        else:
            n = 0
        max_ts_ms = 0
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            if len(pdf) > 0:
                max_ts_ms = max(max_ts_ms,
                                int(pdf[ts_col].max().value // 1_000_000))
            for v in pdf[value_col]:
                agg.update(v)
                n += 1
        state.update((pickle.dumps(agg.__dict__), n))
        # idle keys expire state_ttl_ms after their newest event — without
        # a TTL, unbounded key cardinality grows the state store forever
        if max_ts_ms > 0:
            state.setTimeoutTimestamp(max_ts_ms + state_ttl_ms)
        yield pd.DataFrame(
            [{key_col: key[0], "n_updates": n, "value": agg.value()}])

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update",
            GroupStateTimeout.EventTimeTimeout)
    )


def funnel_stream(stream_df: DataFrame, ts_col: str, type_col: str,
                  steps: list, by: str = "user_id",
                  within_s: Optional[int] = None,
                  watermark: str = "1 hour",
                  state_ttl_ms: int = 86_400_000) -> DataFrame:
    """The batch ordered-funnel (operators/timeseries.py funnel) run
    INCREMENTALLY per entity: GroupState carries the state machine
    (steps completed, last-step time, funnel-start time); each
    micro-batch advances it over the batch's funnel-relevant events in
    event-time order and emits the entity's current progress
    (key, steps_completed, funnel_start, last_step_ts) in update mode.

    Semantics contract: within a micro-batch events are consumed in
    event-time order, and the greedy earliest-first machine is exactly
    the batch funnel's; an event that arrives in a LATER batch than one
    it precedes in event time cannot retroactively advance a step the
    machine already passed (standard at-watermark streaming funnel
    semantics). Over an availableNow replay of a time-ordered source the
    result equals the batch funnel exactly — pinned by a test.

    State per entity is three scalars (no event buffering), expiring
    `state_ttl_ms` after the entity's newest event — bounded state at
    unbounded entity cardinality. Events not in `steps` are filtered
    BEFORE the shuffle."""
    n = len(steps)
    if n == 0:
        raise ValueError("funnel_stream: steps must be non-empty")
    if len(set(steps)) != n:
        raise ValueError("funnel_stream: step event types must be distinct")
    step_idx = {s: i for i, s in enumerate(steps)}
    key_type = stream_df.schema[by].dataType
    out_schema = T.StructType([
        T.StructField(by, key_type),
        T.StructField("steps_completed", T.IntegerType()),
        T.StructField("funnel_start", T.TimestampType()),
        T.StructField("last_step_ts", T.TimestampType()),
    ])
    state_schema = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("tp_us", T.LongType()),
        T.StructField("t0_us", T.LongType()),
    ])
    within_us = None if within_s is None else int(within_s) * 1_000_000

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        k, tp_us, t0_us = state.get if state.exists else (0, 0, 0)
        max_ts_ms = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            max_ts_ms = max(max_ts_ms,
                            int(pdf[ts_col].max().value // 1_000_000))
            ts_us = pdf[ts_col].astype("int64") // 1_000
            for t, ev in zip(ts_us, pdf[type_col]):
                if k >= n or step_idx.get(ev) != k:
                    continue
                if k > 0 and not t > tp_us:
                    continue
                if (within_us is not None and k > 0
                        and t > t0_us + within_us):
                    continue
                if k == 0:
                    t0_us = int(t)
                tp_us = int(t)
                k += 1
        state.update((k, tp_us, t0_us))
        if max_ts_ms > 0:
            state.setTimeoutTimestamp(max_ts_ms + state_ttl_ms)
        yield pd.DataFrame([{
            by: key[0], "steps_completed": k,
            "funnel_start": (pd.Timestamp(t0_us * 1000) if k > 0 else None),
            "last_step_ts": (pd.Timestamp(tp_us * 1000) if k > 0 else None),
        }])

    return (
        stream_df
        .filter(F.col(type_col).isin(list(steps)))
        .withWatermark(ts_col, watermark)
        .groupBy(F.col(by))
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update",
            GroupStateTimeout.EventTimeTimeout)
    )


def sessionize_stream_stateful(stream_df: DataFrame, ts_col: str = "ts",
                               by: str = "user_id", gap_s: int = 1800,
                               tiebreak_col: str = "event_id") -> DataFrame:
    """Gap-threshold sessionization as a STATEFUL STREAM: per entity,
    two scalars of state — (last_event_us, n_sessions) — no event
    buffering, the same contract as :func:`funnel_stream`.

    Each micro-batch folds the entity's events in (ts, tiebreak) order:
    a gap > ``gap_s`` from the previous event (possibly in an EARLIER
    micro-batch — that's what the carried last_event_us is for) starts a
    new session. Emits (by, n_sessions) per entity per batch in update
    mode; n_sessions is monotone, so ``max()`` collapses the emissions
    to the final count. On a time-ordered availableNow replay this
    equals the batch lag+gap formulation exactly (q22's SQL oracle);
    out-of-order arrivals WITHIN a micro-batch are sorted away, while
    cross-batch disorder needs the source ordered — the same caveat as
    every pure-scalar-state sessionizer.

    The inner fold is numpy (shifted-diff > gap), not a python loop, so
    a hot entity with a million events in one batch costs one vector
    pass."""
    import numpy as np

    out_schema = T.StructType([
        T.StructField(by, T.LongType()),
        T.StructField("n_sessions", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("last_us", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
    ])
    gap_us = int(gap_s) * 1_000_000

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_us, n = state.get if state.exists else (None, 0)
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        rows = pd.concat(parts).sort_values([ts_col, tiebreak_col])
        us = rows[ts_col].astype("int64").to_numpy() // 1000
        prev = np.empty_like(us)
        prev[1:] = us[:-1]
        # the entity's very first event always opens a session: seed a
        # synthetic prev just past the gap (int64-min would overflow
        # the subtraction and silently drop that first session)
        prev[0] = (last_us if last_us is not None
                   else int(us[0]) - gap_us - 1)
        n += int((us - prev > gap_us).sum())
        state.update((int(us[-1]), int(n)))
        yield pd.DataFrame([{by: key[0], "n_sessions": int(n)}])

    return (
        stream_df.groupBy(F.col(by))
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout)
    )


def approx_distinct_stream(stream_df: DataFrame, key_col: str = "user_id",
                           by: str = "wstart", p: int = 11,
                           kind: str = "int") -> DataFrame:
    """Per-group approximate COUNT(DISTINCT key_col) as a STATEFUL
    STREAM with BOUNDED state: one HyperLogLog register array (2^p
    bytes) per group instead of a seen-key set — the difference
    between O(distinct keys) and O(2 KB) of state per window on a
    100 TB event stream. Same sketch contract as the manifest NDV
    layer (ndv.py): md5 over the engine's canonical key bytes,
    register-max folds, linear-counting correction — so an
    availableNow replay's final estimate equals the batch sketch over
    the same rows EXACTLY (register max is order/batch-split
    invariant), and a DuckDB oracle can replay the estimate
    bit-for-bit (q156).

    Emits (by, seq, approx_distinct) per group per micro-batch in
    update mode; collapse with ``max_by(approx_distinct, seq)`` — the
    last emission carries the final registers' estimate (the estimate
    is *almost* monotone across folds, but the linear-counting→raw
    branch crossing makes max() subtly wrong; last-wins is exact).

    ``by`` is any pre-computed grouping column (e.g. an event-time
    window start); group it coarse enough that 2^p bytes x groups
    fits the state store."""
    import hashlib

    from .. import ndv as _ndv

    out_schema = T.StructType([
        T.StructField(by, T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("approx_distinct", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("regs", T.BinaryType()),
        T.StructField("seq", T.LongType()),
    ])
    m = 1 << p
    pre = "i" if kind == "int" else "s"

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        regs, seq = (state.get if state.exists
                     else (bytes(m), 0))
        regs = bytearray(regs)
        n_new = 0
        for pdf in pdfs:
            for v in pdf[key_col]:
                if v is None or v != v:
                    continue
                if kind == "int":
                    kb = ("i" + str(int(v))).encode()
                else:
                    kb = ("s" + str(v)).encode()
                h = int(hashlib.md5(kb).hexdigest()[:16], 16)
                j = h & (m - 1)
                rho = (64 - p) - (h >> p).bit_length() + 1
                if rho > regs[j]:
                    regs[j] = rho
                n_new += 1
        if not n_new and seq:
            return
        seq += 1
        state.update((bytes(regs), int(seq)))
        import base64
        est = _ndv.ndv_estimate(
            {"p": p, "r": base64.b64encode(bytes(regs)).decode()})
        yield pd.DataFrame([{by: key[0], "seq": int(seq),
                             "approx_distinct": float(est)}])

    return (
        stream_df.groupBy(F.col(by))
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout)
    )

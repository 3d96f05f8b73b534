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
                          state_ttl_ms: int = 3_600_000) -> DataFrame:
    """Drop rows whose `id_col` was already seen, across micro-batches.

    State: one boolean per live key, expiring `state_ttl_ms` after last
    touch (EventTimeTimeout keyed to the watermark) — bounded state at any
    scale. Emits each key's FIRST row only.
    """
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

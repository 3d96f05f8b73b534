"""Structured Streaming wrappers: the idiomatic Spark expression of the
reference's incremental-computation story (SURVEY §2.11).

The reference has no stream processing — its "streaming" is incremental
view maintenance on insert (reference catalog/table_version.py:1076-1091).
On Spark the same contract is a Structured Streaming pipeline with an
``availableNow`` trigger: each run processes exactly the files that
arrived since the last checkpoint, runs the computed-column / view plan
over only that slice, and appends — which is precisely
``Table.insert`` + view propagation, but driven by a directory instead of
an API call. Watermarked windowed aggregation and stateful sessionization
go beyond the reference (north-star training-pipeline operators).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_from_directory(spark: SparkSession, path: str,
                          schema: T.StructType,
                          fmt: str = "parquet",
                          options: dict | None = None) -> DataFrame:
    """File-source stream: new files in `path` become micro-batches.
    `options` passes reader options through (e.g. maxFilesPerTrigger to
    bound batch size / force one-file-per-batch replays)."""
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def incremental_ingest(stream_df: DataFrame, table,
                       checkpoint_dir: Optional[str] = None,
                       transform: Optional[Callable[[DataFrame], DataFrame]] = None):
    """Incrementally ingest a stream into a catalog Table: each micro-batch
    flows through Table.insert(), which evaluates computed columns over the
    new slice only and propagates to dependent views — exactly-once via the
    streaming checkpoint + availableNow trigger.

    Returns the StreamingQuery; call .awaitTermination() (availableNow
    stops by itself when caught up).
    """
    checkpoint_dir = checkpoint_dir or os.path.join(table.path, "_checkpoint")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        if batch_df.isEmpty():
            return
        table.insert(batch_df)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(stream_df: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          window: str = "5 minutes",
                          slide: Optional[str] = None,
                          watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling/sliding window aggregation with late-data
    handling — the event-time analog of q16's batch time bucketing."""
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(w, F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col(key_col), F.col("n"), F.col("total_value"),
        )
    )


def sessionize_stream(stream_df: DataFrame, ts_col: str = "ts",
                      key_col: str = "user_id",
                      gap: str = "30 minutes",
                      watermark: str = "1 hour") -> DataFrame:
    """Session windows with a dynamic gap — the streaming counterpart of the
    batch lag+cumsum sessionization (q22)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            F.col(key_col), F.col("n_events"),
        )
    )


def run_stream_to_memory(agg_df: DataFrame, query_name: str,
                         output_mode: str = "append"):
    """Drive a streaming frame to completion synchronously against the
    in-memory sink (test/smoke harness; real deployments write to a table
    sink with a processing-time trigger)."""
    q = (
        agg_df.writeStream.outputMode(output_mode)
        .format("memory").queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def curation_stream(stream_df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    langs: tuple = ("en",),
                    pii_kinds: tuple = ("email", "ssn", "ipv4"),
                    quality_floor: float = 0.0) -> DataFrame:
    """Streaming corpus curation: per incoming document, model language
    id (scalar path — map-only), heuristic quality score, PII flag, and
    a `keep` verdict (language in `langs`, no PII, quality above the
    floor). Every stage is a stateless per-row projection, so this runs
    identically on a stream and a batch frame — no watermark, no state
    store, exactly the map-side subset of the batch q89 pipeline.
    (Dedup-representative selection is inherently cross-row; for streams
    pair this with dropDuplicates on the fingerprint within a watermark,
    or run the batch dedup on the silver table.)"""
    from ..operators.langid import lang_id_udf
    from ..operators.pii import has_pii
    from ..operators.text import fingerprint, quality_score, token_count

    # full-width scoring: a file-source micro-batch has as many
    # partitions as input SPLITS (one small file -> ONE task running the
    # whole lang-id/quality/PII battery; measured 3.9 s of a 4.1 s
    # availableNow batch at 5k docs). One cheap stateless shuffle of the
    # raw rows unlocks cluster-wide parallel scoring — the streaming
    # analog of operators.text.spread (which needs df.rdd and so cannot
    # run on a streaming frame). At real scale defaultParallelism == the
    # cluster width, which is exactly what a Python-heavy map stage
    # should run at.
    sc = stream_df.sparkSession.sparkContext
    stream_df = stream_df.repartition(sc.defaultParallelism)

    c = F.col(text_col)
    # empty/whitespace-only docs would 0/0 inside quality_score under
    # ANSI; they score the out-of-band floor and fail `keep` anyway
    quality = F.when(token_count(c) > 0,
                     quality_score(c)).otherwise(F.lit(0.1))
    out = stream_df.select(
        F.col(id_col),
        lang_id_udf(c).alias("lang_pred"),
        quality.alias("quality"),
        has_pii(c, list(pii_kinds)).alias("pii"),
        fingerprint(c).alias("fp"))
    keep = (F.col("lang_pred").isin(*langs)
            & ~F.col("pii") & (F.col("quality") >= quality_floor))
    return out.withColumn("keep", keep)


def stream_stream_join(left: DataFrame, right: DataFrame, key: str,
                       left_ts: str = "ts", right_ts: str = "ts",
                       within_s: int = 1800, watermark_s: int = 3600,
                       how: str = "inner",
                       heartbeat_key=None) -> DataFrame:
    """Watermarked stream-stream join: pair each left event with right
    events of the same `key` whose timestamp falls in
    (left_ts, left_ts + within_s] — the view->purchase attribution
    shape. Spark's stream-stream join machinery buffers both sides in
    the state store; the watermark + the time-range condition bound how
    long a row waits for matches, so state is O(events within the
    watermark window), not O(stream) (Structured Streaming's
    inner/outer join requirements). On an availableNow replay of a
    bounded source the result equals the batch time-window join.

    The left frame's columns come out prefixed `l_`, the right's `r_`
    (stream-stream joins forbid ambiguous names across sides).

    `how='leftOuter'` caveat (inherent Structured Streaming semantics,
    verified on a bounded replay): an unmatched left row emits only
    once the watermark passes its join window, so rows within
    `watermark_s` of the stream's END stay withheld in state when a
    bounded replay terminates — inner-join results are always complete,
    outer-null results are complete only up to the final watermark.

    `heartbeat_key=<sentinel>` enables the HEARTBEAT protocol that
    closes the gap for bounded replays: rows whose `key` equals the
    sentinel (a value no real key takes, e.g. -1) are watermark
    heartbeats — they pass through each side's EventTimeWatermark node
    (advancing the watermark to their event time) but are filtered
    before the join state, so they never match and never appear in the
    output. Append one sentinel-key row per side at
    `max(event_ts) + watermark_s + within_s + slack`, as TWO separate
    last-modified source files so they land in later micro-batches
    (batch N's eviction runs with the watermark advanced by batch N-1
    — the second heartbeat batch performs the flush); the replay then
    emits every withheld unmatched left row and availableNow equals
    the batch left time-window join exactly.

    Two hard-won pushdown notes, pinned by tests: (1) the heartbeat
    filter must REFERENCE the event-time column — Catalyst pushes
    filters that don't mention it below the EventTimeWatermark node
    and into the parquet scan, where they'd drop the heartbeat before
    it ever advances the watermark; `ts IS NULL` is vacuous for rows
    that reach a watermark node, so semantics stay `key != sentinel`.
    (2) the sentinel must be a non-NULL key: an outer join infers
    `isnotnull(key)` from its condition and pushes it into the
    preserved-side's opposite scan, so a NULL-key heartbeat never
    reaches that watermark at all (observed both failure modes on
    bounded replays). rightOuter/fullOuter work symmetrically — the
    same heartbeat flushes their withheld tails."""
    if how not in ("inner", "leftOuter", "rightOuter", "fullOuter"):
        raise ValueError(
            "stream_stream_join supports inner/leftOuter/rightOuter/"
            "fullOuter")
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns]) \
        .withWatermark(f"l_{left_ts}", f"{watermark_s} seconds")
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns]) \
        .withWatermark(f"r_{right_ts}", f"{watermark_s} seconds")
    if heartbeat_key is not None:
        hb = F.lit(heartbeat_key)
        l = l.filter(~F.col(f"l_{key}").eqNullSafe(hb)
                     | F.col(f"l_{left_ts}").isNull())
        r = r.filter(~F.col(f"r_{key}").eqNullSafe(hb)
                     | F.col(f"r_{right_ts}").isNull())
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") > F.col(f"l_{left_ts}"))
        & (F.col(f"r_{right_ts}")
           <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {within_s} SECONDS"))
    )
    return l.join(r, cond, how)


def heartbeat_replay_dir(spark: SparkSession, source_files: list,
                         heartbeat_rows: list, schema,
                         base_dir: Optional[str] = None) -> str:
    """Stage a bounded-replay source directory for
    `stream_stream_join(..., heartbeat_key=...)`: the real source files
    plus TWO trailing heartbeat files (identical content, strictly
    later modification times). With `maxFilesPerTrigger=1` the file
    source admits them as separate micro-batches after the data: the
    first advances the watermark past every join window, the second
    runs state eviction under that watermark — which is what actually
    emits the withheld unmatched left rows (eviction in batch N uses
    the watermark computed from batch N-1). `heartbeat_rows` must carry
    the sentinel key and an event time of at least
    `max(event_ts) + watermark_s + within_s`, plus slack for watermark
    truncation."""
    import shutil
    import tempfile
    import uuid as _uuid

    out = base_dir or tempfile.mkdtemp(prefix="pxt_replay_")
    os.makedirs(out, exist_ok=True)
    for i, f in enumerate(source_files):
        shutil.copy(f, os.path.join(out, f"a{i:04d}_{os.path.basename(f)}"))
    hb_tmp = os.path.join(out, ".hb-" + _uuid.uuid4().hex[:8])
    # literal JVM frame (localframe.local_df): createDataFrame+coalesce
    # of a 2-row list paid 32 SERIAL Python-worker round-trips (~5 s)
    # for what is one tiny parquet write
    from ..localframe import local_df
    hb_df = local_df(spark, heartbeat_rows, schema)
    if hb_df.rdd.getNumPartitions() > 1:   # stock fallback path only
        hb_df = hb_df.coalesce(1)
    hb_df.write.parquet(hb_tmp)
    part = next(p for p in sorted(os.listdir(hb_tmp))
                if p.endswith(".parquet"))
    import time as _time
    now = _time.time()
    for j in (1, 2):
        dst = os.path.join(out, f"z{j}_heartbeat.parquet")
        shutil.copy(os.path.join(hb_tmp, part), dst)
        os.utime(dst, (now + 2 * j, now + 2 * j))
    shutil.rmtree(hb_tmp, ignore_errors=True)
    return out

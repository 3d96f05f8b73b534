"""Custom stateful streaming operators (applyInPandasWithState):
streaming dedup with TTL state + the @uda surface over streams."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import pixeltable_spark as pxt
from pixeltable_spark import streaming


SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
])


@pytest.fixture()
def dup_landing(spark, tmp_path):
    """Landing dir with duplicated event_ids across two files."""
    rows = [(i % 6, f"2024-01-01 00:{i:02d}:00", i % 3, float(i))
            for i in range(12)]
    df = spark.createDataFrame(
        [(eid, ts, uid, v) for eid, ts, uid, v in rows],
        "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp_path / "landing")
    df.filter(F.col("event_id") < 3).coalesce(1).write.mode("append").parquet(d)
    df.filter(F.col("event_id") >= 3).coalesce(1).write.mode("append").parquet(d)
    return d


class TestStreamDedupStateful:
    def test_emits_first_row_per_key(self, spark, dup_landing):
        stream = streaming.stream_from_directory(spark, dup_landing, SCHEMA)
        deduped = streaming.stream_dedup_stateful(
            stream, id_col="event_id", ts_col="ts")
        q = streaming.run_stream_to_memory(deduped, "dedup_t1",
                                           output_mode="append")
        out = spark.table("dedup_t1").collect()
        ids = [r["event_id"] for r in out]
        assert sorted(ids) == [0, 1, 2, 3, 4, 5]  # 12 rows in, 6 unique out
        # each emitted row is the FIRST occurrence (min value for that id)
        vals = {r["event_id"]: r["value"] for r in out}
        assert vals[0] == 0.0 and vals[5] == 5.0

    def test_bucketed_state_same_emit_set(self, spark, dup_landing):
        stream = streaming.stream_from_directory(spark, dup_landing, SCHEMA)
        deduped = streaming.stream_dedup_stateful(
            stream, id_col="event_id", ts_col="ts", num_buckets=3)
        q = streaming.run_stream_to_memory(deduped, "dedup_bkt1",
                                           output_mode="append")
        out = spark.table("dedup_bkt1").collect()
        ids = [r["event_id"] for r in out]
        assert sorted(ids) == [0, 1, 2, 3, 4, 5]
        vals = {r["event_id"]: r["value"] for r in out}
        assert vals[0] == 0.0 and vals[5] == 5.0

    def test_bucketed_dedups_across_restart(self, spark, tmp_path,
                                            dup_landing):
        ckpt = str(tmp_path / "ckpt_b")
        sink = str(tmp_path / "out_b")

        def run_once():
            stream = streaming.stream_from_directory(spark, dup_landing, SCHEMA)
            deduped = streaming.stream_dedup_stateful(
                stream, id_col="event_id", ts_col="ts", num_buckets=2)
            q = (deduped.writeStream.outputMode("append").format("parquet")
                 .option("path", sink).option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()

        run_once()
        assert spark.read.parquet(sink).count() == 6
        extra = spark.createDataFrame(
            [(2, "2024-01-01 00:22:00", 9, 88.0),
             (200, "2024-01-01 00:23:00", 9, 8.0)],
            "event_id long, ts string, user_id long, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        extra.coalesce(1).write.mode("append").parquet(dup_landing)
        run_once()
        after = spark.read.parquet(sink)
        assert after.count() == 7  # only event_id=200 added
        assert after.filter(F.col("event_id") == 2).count() == 1

    def test_state_dedups_across_restart_with_checkpoint(self, spark, tmp_path,
                                                         dup_landing):
        ckpt = str(tmp_path / "ckpt")
        sink = str(tmp_path / "out")  # file sink: supports ckpt recovery

        def run_once():
            stream = streaming.stream_from_directory(spark, dup_landing, SCHEMA)
            deduped = streaming.stream_dedup_stateful(
                stream, id_col="event_id", ts_col="ts")
            q = (deduped.writeStream.outputMode("append").format("parquet")
                 .option("path", sink).option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()

        run_once()
        assert spark.read.parquet(sink).count() == 6
        # second run over the same checkpoint with NEW files: old ids are
        # still in state and get dropped; a brand-new id passes
        extra = spark.createDataFrame(
            [(1, "2024-01-01 00:20:00", 9, 99.0),
             (100, "2024-01-01 00:21:00", 9, 7.0)],
            "event_id long, ts string, user_id long, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        extra.coalesce(1).write.mode("append").parquet(dup_landing)
        run_once()
        after = spark.read.parquet(sink)
        assert after.count() == 7  # only event_id=100 added
        assert after.filter(F.col("event_id") == 1).count() == 1


class TestStatefulRunningUda:
    def test_uda_runs_incrementally_per_key(self, spark, dup_landing):
        @pxt.uda
        class running_sum:
            def __init__(self):
                self.s = 0.0

            def update(self, v):
                if v is not None:
                    self.s += float(v)

            def value(self) -> float:
                return self.s

        stream = streaming.stream_from_directory(spark, dup_landing, SCHEMA)
        agg = streaming.stateful_running_uda(
            stream, running_sum, key_col="user_id", value_col="value")
        streaming.run_stream_to_memory(agg, "uda_t1", output_mode="update")
        out = spark.table("uda_t1").collect()
        # final state per key equals the batch groupBy sum
        final = {}
        for r in out:  # update mode may emit per micro-batch; last wins
            final[r["user_id"]] = (r["n_updates"], r["value"])
        expect = {uid: (4, float(sum(range(uid, 12, 3))))
                  for uid in range(3)}
        assert {k: v for k, v in final.items()} == expect

EV_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
])

FUNNEL_STEPS = ["view", "click", "purchase"]


@pytest.fixture()
def funnel_landing(spark, tmp_path):
    """Two time-ordered files: u1 converts across the file boundary
    (state must survive micro-batches), u2 stalls, u3 is out of order."""
    rows = [
        (0, "2024-01-01 00:00:00", 1, "view"),
        (1, "2024-01-01 00:01:00", 2, "view"),
        (2, "2024-01-01 00:02:00", 1, "click"),
        (3, "2024-01-01 00:03:00", 3, "click"),    # click before view
        # --- second file ---
        (4, "2024-01-01 00:04:00", 1, "purchase"),
        (5, "2024-01-01 00:05:00", 3, "view"),
        (6, "2024-01-01 00:06:00", 2, "other"),    # filtered out
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp_path / "funnel_landing")
    df.filter(F.col("event_id") < 4).coalesce(1) \
        .write.mode("append").parquet(d)
    df.filter(F.col("event_id") >= 4).coalesce(1) \
        .write.mode("append").parquet(d)
    return d


class TestFunnelStream:
    def test_state_survives_batches(self, spark, funnel_landing):
        stream = streaming.stream_from_directory(
            spark, funnel_landing, EV_SCHEMA,
            options={"maxFilesPerTrigger": "1"})
        out = streaming.funnel_stream(stream, "ts", "event_type",
                                      FUNNEL_STEPS)
        streaming.run_stream_to_memory(out, "funnel_t1",
                                       output_mode="update")
        rows = spark.table("funnel_t1").collect()
        # update mode: keep the LAST emission per user
        last = {}
        for r in rows:
            last[r["user_id"]] = r["steps_completed"]
        # u1 view+click in batch 1, purchase in batch 2 -> 3
        # u2 view only -> 1; u3 click arrived before view -> 1
        assert last == {1: 3, 2: 1, 3: 1}

    def test_matches_batch_funnel_on_replay(self, spark, funnel_landing):
        from pixeltable_spark.operators.timeseries import funnel
        stream = streaming.stream_from_directory(
            spark, funnel_landing, EV_SCHEMA)
        out = streaming.funnel_stream(stream, "ts", "event_type",
                                      FUNNEL_STEPS)
        streaming.run_stream_to_memory(out, "funnel_t2",
                                       output_mode="update")
        last = {}
        for r in spark.table("funnel_t2").collect():
            last[r["user_id"]] = r["steps_completed"]
        batch_df = spark.read.parquet(funnel_landing)
        batch = {r["step"]: r["users"]
                 for r in funnel(batch_df, "ts", "event_type",
                                 FUNNEL_STEPS).collect()}
        for step, users in batch.items():
            got = sum(1 for k in last.values() if k >= step)
            assert got == users, f"step {step}: stream {got} != {users}"

    def test_conversion_window(self, spark, funnel_landing):
        stream = streaming.stream_from_directory(
            spark, funnel_landing, EV_SCHEMA)
        out = streaming.funnel_stream(stream, "ts", "event_type",
                                      FUNNEL_STEPS, within_s=180)
        streaming.run_stream_to_memory(out, "funnel_t3",
                                       output_mode="update")
        last = {r["user_id"]: r["steps_completed"]
                for r in spark.table("funnel_t3").collect()}
        # u1's purchase at +4min falls outside the 3-min window
        assert last[1] == 2

    def test_validation(self, spark, funnel_landing):
        stream = streaming.stream_from_directory(
            spark, funnel_landing, EV_SCHEMA)
        with pytest.raises(ValueError):
            streaming.funnel_stream(stream, "ts", "event_type", [])


class TestSessionizeStreamStateful:
    @pytest.fixture()
    def sess_landing(self, spark, tmp_path):
        """Two files split MID-SESSION: user 1's events at minutes
        0,10 land in file A and 20, 90 in file B — the 20-minute event
        continues the session only if state carried the last timestamp
        across micro-batches; 90 opens session 2. User 2 has a single
        event per file, 3 hours apart (2 sessions)."""
        rows = [
            (1, "2024-01-01 10:00:00", 1), (2, "2024-01-01 10:10:00", 1),
            (3, "2024-01-01 13:00:00", 2),
            (4, "2024-01-01 10:20:00", 1), (5, "2024-01-01 11:30:00", 1),
            (6, "2024-01-01 16:30:00", 2),
        ]
        df = spark.createDataFrame(
            [(e, ts, u, 0.0) for e, ts, u in rows],
            "event_id long, ts string, user_id long, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        d = str(tmp_path / "sess")
        df.filter(F.col("event_id") <= 3).coalesce(1) \
          .write.mode("append").parquet(d)
        df.filter(F.col("event_id") > 3).coalesce(1) \
          .write.mode("append").parquet(d)
        return d

    def test_state_carries_across_batches(self, spark, sess_landing):
        stream = streaming.stream_from_directory(spark, sess_landing, SCHEMA)
        sess = streaming.sessionize_stream_stateful(
            stream, "ts", "user_id", gap_s=1800)
        streaming.run_stream_to_memory(sess, "sess_t1",
                                       output_mode="update")
        out = (spark.table("sess_t1").groupBy("user_id")
               .agg(F.max("n_sessions").alias("n")).collect())
        got = {r["user_id"]: r["n"] for r in out}
        # user 1: 10:00/10:10/10:20 one session (the 10:20 event only
        # continues it if last_us survived the batch boundary), 11:30
        # second session. user 2: 13:00 and 16:30 = two sessions.
        assert got == {1: 2, 2: 2}

    def test_matches_batch_sessionize(self, spark, sess_landing):
        stream = streaming.stream_from_directory(spark, sess_landing, SCHEMA)
        sess = streaming.sessionize_stream_stateful(
            stream, "ts", "user_id", gap_s=1800)
        streaming.run_stream_to_memory(sess, "sess_t2",
                                       output_mode="update")
        got = {r["user_id"]: r["n"] for r in
               (spark.table("sess_t2").groupBy("user_id")
                .agg(F.max("n_sessions").alias("n")).collect())}
        # batch replay: lag + gap over the same files
        from pyspark.sql import Window as W
        batch = spark.read.schema(SCHEMA).parquet(sess_landing)
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        us = F.unix_micros(F.col("ts"))
        prev = F.lag(us).over(w)
        newf = F.when(prev.isNull() | ((us - prev) > 1800 * 1_000_000), 1) \
            .otherwise(0)
        want = {r["user_id"]: r["n"] for r in
                batch.select("user_id", newf.alias("f"))
                .groupBy("user_id").agg(F.sum("f").alias("n")).collect()}
        assert got == want

    def test_validation(self, spark, sess_landing):
        stream = streaming.stream_from_directory(spark, sess_landing, SCHEMA)
        sess = streaming.sessionize_stream_stateful(stream, "ts", "user_id",
                                                    gap_s=60)
        streaming.run_stream_to_memory(sess, "sess_t3",
                                       output_mode="update")
        got = {r["user_id"]: r["n"] for r in
               (spark.table("sess_t3").groupBy("user_id")
                .agg(F.max("n_sessions").alias("n")).collect())}
        assert got == {1: 4, 2: 2}   # 60s gap splits every user-1 event


class TestApproxDistinctStream:
    @pytest.fixture()
    def hll_landing(self, spark, tmp_path):
        """Two files splitting each window's users across micro-batches:
        window 10:00 sees users 0..59 in file A and 30..89 in file B
        (overlap 30..59 must not double-count); window 11:00 only in B."""
        rows_a = [(i, "2024-01-01 10:00:00", i, 0.0) for i in range(60)]
        rows_b = [(100 + i, "2024-01-01 10:00:00", 30 + i, 0.0)
                  for i in range(60)] + \
                 [(200 + i, "2024-01-01 11:00:00", i % 25, 0.0)
                  for i in range(50)]
        d = str(tmp_path / "hll")
        for rows in (rows_a, rows_b):
            spark.createDataFrame(
                rows, "event_id long, ts string, user_id long, value double"
            ).withColumn("ts", F.to_timestamp("ts")).coalesce(1) \
             .write.mode("append").parquet(d)
        return d

    def _run(self, spark, landing, name):
        stream = streaming.stream_from_directory(
            spark, landing, SCHEMA,
            options={"maxFilesPerTrigger": "1"}) \
            .withColumn("wstart", F.date_trunc("hour", F.col("ts")))
        est = streaming.approx_distinct_stream(
            stream.select("wstart", "user_id"), "user_id", "wstart")
        streaming.run_stream_to_memory(est, name, output_mode="update")
        return {str(r["wstart"]): r["e"] for r in
                (spark.table(name).groupBy("wstart")
                 .agg(F.max_by("approx_distinct", "seq").alias("e"))
                 .collect())}

    def test_state_merges_across_batches(self, spark, hll_landing):
        """The 30..59 overlap arrives in BOTH micro-batches; the
        register state must fold it once (set semantics), and the
        final estimate must equal the one-shot batch sketch over the
        same rows — register max is batch-split invariant."""
        from pixeltable_spark.ndv import ndv_build, ndv_estimate

        got = self._run(spark, hll_landing, "hll_t1")
        want_10 = ndv_estimate(ndv_build(range(90)))
        want_11 = ndv_estimate(ndv_build(range(25)))
        assert got["2024-01-01 10:00:00"] == pytest.approx(want_10)
        assert got["2024-01-01 11:00:00"] == pytest.approx(want_11)
        # linear-counting regime at this size: estimates are near-exact
        assert abs(got["2024-01-01 10:00:00"] - 90) < 6
        assert abs(got["2024-01-01 11:00:00"] - 25) < 4

    def test_bounded_state_contract(self, spark, hll_landing):
        """Output rows carry one (seq, estimate) per window per batch —
        state is a fixed 2KB register array, never a seen-key set (the
        emission count pins that the operator runs per-batch folds,
        not per-event state)."""
        stream = streaming.stream_from_directory(
            spark, hll_landing, SCHEMA,
            options={"maxFilesPerTrigger": "1"}) \
            .withColumn("wstart", F.date_trunc("hour", F.col("ts")))
        est = streaming.approx_distinct_stream(
            stream.select("wstart", "user_id"), "user_id", "wstart")
        streaming.run_stream_to_memory(est, "hll_t2",
                                       output_mode="update")
        rows = spark.table("hll_t2").collect()
        # window 10:00 emits in both batches, 11:00 once
        per_w = {}
        for r in rows:
            per_w.setdefault(str(r["wstart"]), []).append(r["seq"])
        assert sorted(per_w["2024-01-01 10:00:00"]) == [1, 2]
        assert per_w["2024-01-01 11:00:00"] == [1]

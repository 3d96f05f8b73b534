"""Watermarked stream-stream join (streaming/incremental.py
stream_stream_join): availableNow replay == batch time-window join."""
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pixeltable_spark.streaming import stream_stream_join

SF = "/root/testdata/sf0.001"


def _src(spark):
    ts_type = spark.read.parquet(f"{SF}/events.parquet").schema["ts"].dataType
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    raw = (spark.readStream.format("parquet").schema(schema)
           .option("pathGlobFilter", "events.parquet").load(SF))
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw.select("event_id", "ts", "user_id", "event_type", "value")


def _batch(spark):
    df = spark.read.parquet(f"{SF}/events.parquet")
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def test_inner_join_equals_batch(spark):
    views = _src(spark).where(F.col("event_type") == "view")
    buys = _src(spark).where(F.col("event_type") == "purchase")
    joined = stream_stream_join(views, buys, "user_id", within_s=1800)
    name = "ssj_" + uuid.uuid4().hex[:8]
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["l_event_id"], r["r_event_id"])
           for r in spark.table(name).collect()}
    b = _batch(spark)
    v = b.where(F.col("event_type") == "view").alias("v")
    p = b.where(F.col("event_type") == "purchase").alias("p")
    want = {(r["lv"], r["rp"]) for r in
            v.join(p, (F.col("v.user_id") == F.col("p.user_id"))
                   & (F.col("p.ts") > F.col("v.ts"))
                   & (F.col("p.ts") <= F.col("v.ts")
                      + F.expr("INTERVAL 1800 SECONDS")))
            .select(F.col("v.event_id").alias("lv"),
                    F.col("p.event_id").alias("rp")).collect()}
    assert got == want and len(got) > 0


def test_how_validation(spark):
    views = _src(spark)
    with pytest.raises(ValueError, match="inner/leftOuter"):
        stream_stream_join(views, views, "user_id", how="full")


def test_leftouter_with_heartbeat_equals_batch(spark, tmp_path):
    """leftOuter availableNow replay + heartbeat flush == batch left
    time-window join, INCLUDING the unmatched tail rows inside the final
    watermark that plain replays withhold (incremental.py heartbeat
    protocol)."""
    import datetime

    from pixeltable_spark.streaming import heartbeat_replay_dir

    b = _batch(spark)
    maxts = b.agg(F.max("ts")).first()[0]
    hb_ts = maxts + datetime.timedelta(seconds=3600 + 1800 + 60)
    raw_schema = spark.read.parquet(f"{SF}/events.parquet").schema
    src_dir = heartbeat_replay_dir(
        spark, [f"{SF}/events.parquet"],
        [(-1, hb_ts, -1, "view", None, None),
         (-2, hb_ts, -1, "purchase", None, None)],
        raw_schema, base_dir=str(tmp_path / "replay"))

    def src():
        raw = (spark.readStream.format("parquet").schema(raw_schema)
               .option("maxFilesPerTrigger", "1").load(src_dir))
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return raw.select("event_id", "ts", "user_id", "event_type",
                          "value")

    views = src().where(F.col("event_type") == "view")
    buys = src().where(F.col("event_type") == "purchase")
    joined = stream_stream_join(views, buys, "user_id", within_s=1800,
                                watermark_s=3600, how="leftOuter",
                                heartbeat_key=-1)
    name = "ssjlo_" + uuid.uuid4().hex[:8]
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["l_event_id"], r["r_event_id"])
           for r in spark.table(name).collect()}
    bb = b.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    v = bb.where(F.col("event_type") == "view").alias("v")
    p = bb.where(F.col("event_type") == "purchase").alias("p")
    want = {(r["lv"], r["rp"]) for r in
            v.join(p, (F.col("v.user_id") == F.col("p.user_id"))
                   & (F.col("p.ts") > F.col("v.ts"))
                   & (F.col("p.ts") <= F.col("v.ts")
                      + F.expr("INTERVAL 1800 SECONDS")), "left")
            .select(F.col("v.event_id").alias("lv"),
                    F.col("p.event_id").alias("rp")).collect()}
    assert got == want
    # the tail actually exercised the flush: unmatched rows exist within
    # the final watermark window
    n_unmatched = sum(1 for _l, rr in got if rr is None)
    assert n_unmatched > 0


def _replay(spark, tmp_path, how, tag):
    import datetime

    from pixeltable_spark.streaming import heartbeat_replay_dir

    b = _batch(spark)
    maxts = b.agg(F.max("ts")).first()[0]
    hb_ts = maxts + datetime.timedelta(seconds=3600 + 1800 + 60)
    raw_schema = spark.read.parquet(f"{SF}/events.parquet").schema
    src_dir = heartbeat_replay_dir(
        spark, [f"{SF}/events.parquet"],
        [(-1, hb_ts, -1, "view", None, None),
         (-2, hb_ts, -1, "purchase", None, None)],
        raw_schema, base_dir=str(tmp_path / f"replay_{tag}"))

    def src():
        raw = (spark.readStream.format("parquet").schema(raw_schema)
               .option("maxFilesPerTrigger", "1").load(src_dir))
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return raw.select("event_id", "ts", "user_id", "event_type",
                          "value")

    views = src().where(F.col("event_type") == "view")
    buys = src().where(F.col("event_type") == "purchase")
    joined = stream_stream_join(views, buys, "user_id", within_s=1800,
                                watermark_s=3600, how=how,
                                heartbeat_key=-1)
    name = f"ssj{tag}_" + uuid.uuid4().hex[:8]
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination()
    return {(r["l_event_id"], r["r_event_id"])
            for r in spark.table(name).collect()}


def _batch_join(spark, how):
    b = _batch(spark).withColumn("ts", F.col("ts").cast(T.TimestampType()))
    v = b.where(F.col("event_type") == "view").alias("v")
    p = b.where(F.col("event_type") == "purchase").alias("p")
    cond = ((F.col("v.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") > F.col("v.ts"))
            & (F.col("p.ts") <= F.col("v.ts")
               + F.expr("INTERVAL 1800 SECONDS")))
    return {(r["lv"], r["rp"]) for r in
            v.join(p, cond, how)
            .select(F.col("v.event_id").alias("lv"),
                    F.col("p.event_id").alias("rp")).collect()}


def test_rightouter_with_heartbeat_equals_batch(spark, tmp_path):
    got = _replay(spark, tmp_path, "rightOuter", "ro")
    want = _batch_join(spark, "right")
    assert got == want
    assert any(l is None for l, _r in got)     # unmatched purchases flushed


def test_fullouter_with_heartbeat_equals_batch(spark, tmp_path):
    got = _replay(spark, tmp_path, "fullOuter", "fo")
    want = _batch_join(spark, "full")
    assert got == want
    assert any(l is None for l, _r in got)
    assert any(r is None for _l, r in got)

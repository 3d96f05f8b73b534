"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall seconds.

Each query is executed as Spark would in production: full plan -> action
(count of materialized rows), never collect-to-driver of large results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
import pixeltable_spark as pxt  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = pxt.get_session(app_name="pxt_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen + Python-worker-pool warmup so per-query numbers measure
    # the plan, not startup: one codegen agg, one parquet scan, one Arrow
    # pandas-UDF round trip (spark.python.worker.reuse keeps the pool warm)
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    warm = F.pandas_udf(lambda s: s + 1, T.LongType())
    (spark.range(1000).repartition(64)
     .select(warm(F.col("id"))).write.format("noop").mode("overwrite").save())

    import gc

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
        except Exception as e:  # noqa: BLE001
            print(f"# {name} FAILED: {type(e).__name__}: {e}", file=sys.stderr)
            dt = float("nan")
        timings[name] = round(dt, 3)
        if dt == dt:
            total += dt
        # several operators localCheckpoint small intermediates; drop the
        # driver references so the ContextCleaner can free the blocks
        # instead of letting 70+ queries' worth pile up in the block
        # manager (later queries were paying the GC pressure)
        df = None
        gc.collect()
        # deterministically drop the query's localCheckpoint blocks: every
        # query is self-contained, so any still-persistent RDD is garbage —
        # unpersist now instead of waiting for the ContextCleaner's
        # weak-ref processing (whose backlog otherwise lands on whichever
        # late query shuffles the most; observed +4-6x on late queries)
        try:
            # blocking=True: finish the removal NOW, outside any query's
            # timed window — async removal races the next query's stages.
            # NB getPersistentRDDs() proxies as a dict-like JavaMap:
            # iterate .values() directly (it has NO .iterator() — an
            # earlier version called that and silently no-opped, leaving
            # the backlog to land 25-37 s stalls on late queries)
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in list(jmap.values()):
                jrdd.unpersist(True)
        except Exception as e:  # noqa: BLE001
            print(f"# unpersist failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        # ...and force a JVM GC periodically for everything else
        # (broadcasts, shuffle state)
        if len(timings) % 10 == 0:
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:  # noqa: BLE001
                pass
    out = {
        "metric": "total wall seconds, all declared queries",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

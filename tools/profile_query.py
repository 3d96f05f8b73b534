"""Per-job time attribution for one or more declared queries.

Runs each named query exactly as bench.py does (noop sink) in a session
with the Spark event log enabled, then parses the event log and prints
every Spark job's wall time, description and task count, plus the gaps
between jobs (driver-side work: planning, manifest/commit I/O, footer
stats, py4j round trips).

Usage: python tools/profile_query.py <query_name> [more ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

LOGDIR = "/tmp/pxt_eventlogs"


def main() -> None:
    names = sys.argv[1:]
    os.makedirs(LOGDIR, exist_ok=True)
    # inject the event-log confs into get_session's builder via
    # PYSPARK_SUBMIT_ARGS (must be set before the JVM launches)
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--conf spark.eventLog.enabled=true "
        f"--conf spark.eventLog.compress=false "
        f"--conf spark.eventLog.rolling.enabled=false "
        f"--conf spark.eventLog.dir={LOGDIR} pyspark-shell")
    import pixeltable_spark as pxt
    spark = pxt.get_session(app_name="pxt_profile")
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    # warmup (mirror bench.py)
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    warm = F.pandas_udf(lambda s: s + 1, T.LongType())
    (spark.range(1000).repartition(64)
     .select(warm(F.col("id"))).write.format("noop").mode("overwrite").save())

    windows = []
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time()
        df.write.format("noop").mode("overwrite").save()
        t1 = time.time()
        windows.append((name, t0, t_build, t1))
        print(f"== {name}: total {t1 - t0:.2f}s "
              f"(build {t_build - t0:.2f}s, action {t1 - t_build:.2f}s)")
    spark.stop()

    # parse event log
    path = os.path.join(LOGDIR, app_id)
    if not os.path.exists(path):
        cands = [p for p in os.listdir(LOGDIR) if p.startswith(app_id)]
        if not cands:
            print("no event log found", file=sys.stderr)
            return
        path = os.path.join(LOGDIR, cands[0])
    jobs = {}
    stage_tasks = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"] / 1000.0,
                    "desc": props.get("spark.job.description",
                                      props.get("spark.jobGroup.id", "")),
                    "group": props.get("spark.jobGroup.id", ""),
                    "stages": [s["Stage ID"]
                               for s in ev.get("Stage Infos", [])],
                    "ntasks": sum(s.get("Number of Tasks", 0)
                                  for s in ev.get("Stage Infos", [])),
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"] / 1000.0

    for name, t0, t_build, t1 in windows:
        print(f"\n==== {name} ({t1 - t0:.2f}s wall) ====")
        win = [j | {"id": jid} for jid, j in sorted(jobs.items())
               if "end" in j and t0 - 0.5 <= j["start"] <= t1 + 0.5
               and (j["group"] == name or not j["group"])]
        win = [j for j in win if j["start"] >= t0 - 0.2]
        prev_end = t0
        tot_job = 0.0
        for j in win:
            gap = j["start"] - prev_end
            dur = j["end"] - j["start"]
            tot_job += dur
            gap_s = f"  [driver gap {gap:.2f}s]" if gap > 0.15 else ""
            if gap_s:
                print(gap_s)
            desc = (j["desc"] or "")[:90]
            print(f"  job {j['id']:>4} {dur:6.2f}s  {j['ntasks']:>4} tasks"
                  f"  {desc}")
            prev_end = max(prev_end, j["end"])
        tail = t1 - prev_end
        if tail > 0.15:
            print(f"  [driver tail {tail:.2f}s]")
        print(f"  -- {len(win)} jobs, {tot_job:.2f}s in jobs, "
              f"{t1 - t0 - tot_job:.2f}s outside jobs")


if __name__ == "__main__":
    main()

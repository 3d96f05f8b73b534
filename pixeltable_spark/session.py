"""SparkSession factory tuned for the test/bench environment.

local[N] single-JVM for tests; the same config block is what we'd ship for a
real cluster minus the master/memory settings (AQE on, Arrow on, UTC).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import SparkSession

_precompile_started = False


def _precompile_package() -> None:
    """One-time background bytecode precompile of this package.

    The sandbox sets PYTHONDONTWRITEBYTECODE=1, which disables WRITING
    .pyc files but not READING them — so with no __pycache__, every
    process (driver, each of the 32 reused Python workers on first UDF
    touch, every pytest run) re-compiles the whole ~33k-LoC package
    from source (~0.4 s CPU per process, measured). compileall writes
    the cache explicitly regardless of the env flag; it skips files
    whose .pyc is already current, and py_compile's atomic
    write-then-rename means a worker importing mid-compile just falls
    back to source for that file. Code-object caching only — no data
    or results are cached."""
    global _precompile_started
    if _precompile_started:
        return
    _precompile_started = True

    def _run() -> None:
        try:
            import compileall
            pkg = os.path.dirname(os.path.abspath(__file__))
            compileall.compile_dir(pkg, quiet=2)
        except Exception:  # noqa: BLE001 — purely an optimization
            pass

    threading.Thread(target=_run, daemon=True,
                     name="pxt-precompile").start()


def get_session(app_name: str = "pixeltable_spark", shuffle_partitions: int | None = None) -> SparkSession:
    from .config import get_config
    cfg = get_config()
    cpus = str(cfg.get("spark", "cpus", "32", env="SPARK_GRAFT_CPUS"))
    shuffle = str(shuffle_partitions
                  or cfg.get("spark", "shuffle_partitions", cpus))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory",
                cfg.get("spark", "driver_memory", "48g",
                        env="SPARK_DRIVER_MEM"))
        # dozens of distinct queries per session generate enough
        # whole-stage-codegen classes to fill the default 240m JIT code
        # cache, after which the compiler shuts off and late queries run
        # interpreted (observed: a pure-JVM query 7x slower at the end of
        # a 78-query bench than in a fresh session)
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1g "
                + str(cfg.get("spark", "java_opts", "",
                              env="SPARK_GRAFT_JAVA_OPTS")))
        .config("spark.sql.session.timeZone", "UTC")
        # parquet TIMESTAMP(NANOS) (pandas-written) has no Spark type; read as
        # long and let the source layer cast to timestamp (registry.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # reap idle Python workers: long sessions otherwise accumulate
        # 32 resident pandas/numpy processes' memory across heterogeneous
        # queries, and the JVM-only stretches pay the pressure
        .config("spark.python.worker.idleTimeoutSeconds", "120")
        # make the ContextCleaner's shuffle removal BLOCKING: the default
        # async deletion of 60+ queries' shuffle files (triggered by the
        # periodic System.gc in long sessions) otherwise lands as an
        # 8-30 s IO burst inside whichever query runs next
        .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
        # DataFrame-debugging call-site capture costs TWO py4j round
        # trips (conf.get + PySparkCurrentOrigin.set) plus a Python
        # stack walk on EVERY DataFrame API call — measured ~25-40% of
        # all py4j traffic in the mutation batteries. It only enriches
        # error messages with the user call site; errors themselves are
        # unchanged. Scale-independent driver-overhead setting.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # FileOutputCommitter v2 + no _SUCCESS marker: the engine's own
        # manifest commit (catalog._commit_files) is the atomicity
        # point — files are written to a private .tmp dir, renamed, and
        # only become visible when the manifest lands — so the v1
        # committer's two-phase rename tree and the _SUCCESS file are
        # pure overhead paid by EVERY store write (measured 0.27 s ->
        # 0.15 s per small commit write; scale-independent: v2 is the
        # standard choice whenever the writer above it is atomic).
        # Nothing in the engine reads _SUCCESS (grep: only pruned as
        # debris).
        .config("spark.hadoop.mapreduce.fileoutputcommitter"
                ".algorithm.version", "2")
        .config("spark.hadoop.mapreduce.fileoutputcommitter"
                ".marksuccessfuljobs", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    _precompile_package()
    return spark

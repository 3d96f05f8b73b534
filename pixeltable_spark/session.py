"""SparkSession factory tuned for the test/bench environment.

local[N] single-JVM for tests; the same config block is what we'd ship for a
real cluster minus the master/memory settings (AQE on, Arrow on, UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app_name: str = "pixeltable_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = str(shuffle_partitions or cpus)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        # parquet TIMESTAMP(NANOS) (pandas-written) has no Spark type; read as
        # long and let the source layer cast to timestamp (registry.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

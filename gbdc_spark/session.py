"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the same configs (AQE, Arrow batching,
skew-join handling) are what we'd ship to a 1000-executor cluster via
spark-submit --py-files (see gbdc_spark/job.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "gbdc-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing + skew-join splitting (north_rule backstop)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow is the JVM<->Python boundary for every UDF stage
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # token arrays are wide rows; keep scan splits moderate
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # GBDC_SAT_BACKEND is read inside the EXECUTOR's Python worker
    # (kernels/gates.py _make_sat_solver); local[N] workers inherit the
    # driver process env, but real executors do not — propagate the
    # driver-side setting via executorEnv so `export GBDC_SAT_BACKEND=
    # pysat; spark-submit job.py` behaves identically on a cluster
    sat_backend = os.environ.get("GBDC_SAT_BACKEND")
    if sat_backend:
        b = b.config("spark.executorEnv.GBDC_SAT_BACKEND", sat_backend)
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()

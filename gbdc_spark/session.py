"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the same configs (AQE, Arrow batching,
skew-join handling) are what we'd ship to a 1000-executor cluster via
spark-submit --py-files (see gbdc_spark/job.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "forward_executor_env"]

# Env vars read inside EXECUTOR Python workers.  local[N] workers
# inherit the driver process env, but real executors do not — any
# driver-side export must travel via spark.executorEnv.*  Add new
# executor-visible variables HERE so both session factories (library
# get_spark and the spark-submit job entry) forward them.
_EXECUTOR_ENV_VARS = ("GBDC_SAT_BACKEND",)  # read in kernels/gates.py


def forward_executor_env(builder):
    """Forward the driver's executor-visible env vars to executors."""
    for var in _EXECUTOR_ENV_VARS:
        val = os.environ.get(var)
        if val:
            builder = builder.config(f"spark.executorEnv.{var}", val)
    return builder


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
    b = forward_executor_env(b)
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()

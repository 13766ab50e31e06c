"""Tuned SparkSession factory.

Local-mode defaults match the 32-core test box; every knob here is also
the right default on a real cluster (AQE, UTC, Arrow) except
shuffle.partitions, which a cluster deployment would raise to ~2-3x
total cores (or rely on AQE coalescing from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "sanctions_data_pipeline_spark",
              cpus: str | int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    - AQE on (runtime re-plan, partition coalescing, skew-join handling)
    - UTC session timezone (deterministic timestamp semantics vs oracles)
    - Arrow enabled (fast pandas interchange for the few Pandas-UDF ops)
    - shuffle partitions sized to cores in local mode
    """
    cpus = str(cpus or DEFAULT_CPUS)
    # Single-threaded BLAS in PySpark workers: task-level parallelism
    # already saturates the cores, and multi-threaded OpenBLAS inside
    # FORKED python workers is fork-unsafe (25 workers x 32 BLAS
    # threads crashed the ×100 kNN dgemm — "Python worker exited
    # unexpectedly"). Workers inherit the JVM's env, which inherits
    # this process's, so setting it before the JVM launches reaches
    # every worker; setdefault keeps a user's explicit override.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let AQE re-plan (coalesce / broadcast) inside cached plans —
        # critical for iterative algorithms that persist per-round state
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        # the synthetic events table stores TIMESTAMP(NANOS); read as long
        # and convert in catalog.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""Table catalog: scale-factor directory -> named DataFrames / temp views.

The synthetic star schema (TESTDATA.md): TPC-H-ish dimensions + facts,
an ``events`` stream table, and the training-data tables ``documents``
and ``embeddings``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor the
# schema implies (region/nation are fixed-size; supplier scales slowly).
BROADCAST_DIMS = ("region", "nation", "supplier")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Defensive: the caller may hand us a session we didn't build (the
    # driver does); both confs are runtime-settable and required for
    # deterministic, oracle-matching reads.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # untagged parquet timestamps (isAdjustedToUTC=false) should read as
    # session-tz TIMESTAMP, matching DuckDB's naive-timestamp oracle view
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # events.ts as parquet TIMESTAMP(NANOS) — Spark reads it as long
        # (spark.sql.legacy.parquet.nanosAsLong); truncate to micros like
        # DuckDB's epoch_us does.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for col, dtype in df.dtypes:
        # belt-and-braces: a session we didn't build may have NTZ
        # inference baked into an already-cached relation
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API) and return
    the DataFrames keyed by name."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def widen_small_scan(df, *key_cols):
    """Adaptive split for CPU-heavy map stages: a small local corpus
    arrives as ONE parquet split (a single row group can't split),
    which would serialize the whole map stage on one core. Repartition
    to the session parallelism only when the scan is under-parallel —
    at 100 TB scans have thousands of splits and this never triggers.
    Output values must be (and, for every caller, are)
    partitioning-independent."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par, *key_cols) if key_cols \
            else df.repartition(par)
    return df

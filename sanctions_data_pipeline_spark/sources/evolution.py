"""Schema-evolution-tolerant parquet reads.

A 100 TB dataset is written over months by evolving jobs: early
partitions miss columns that later ones have, int32 ids widen to
int64, columns get added or dropped. Two failure modes and their
fixes:

- A DEFAULT read samples one footer for the schema, silently dropping
  columns that sample lacks. :func:`read_merged` (``mergeSchema``)
  unions all footers — but it launches a footer-merge job over every
  file and REFUSES type changes (Spark raises CANNOT_MERGE_SCHEMAS on
  int vs bigint).
- :func:`read_aligned` is the production path: pass the schema the
  PIPELINE expects to the scan itself. The parquet reader then serves
  missing columns as typed nulls, upcasts compatible physical types
  (int32 -> long, float -> double) per file, prunes unknown columns at
  the footer — no pre-pass job, no merge restrictions, and the scan's
  ReadSchema is exactly the target (best possible column pruning at
  100 TB).

:func:`align_to_schema` covers the same contract for an already-loaded
DataFrame (e.g. after a format that can't take a read schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def read_merged(spark: SparkSession, path: str) -> DataFrame:
    """Union-of-footers read (``mergeSchema``): keeps every column ever
    written, nulls where a file lacks one. Use when the consumer wants
    "everything on disk"; same-name columns must agree on type."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_aligned(spark: SparkSession, path: str,
                 target: T.StructType) -> DataFrame:
    """Read conformed to the pipeline's target schema at the scan:
    missing -> typed null, extra -> pruned, int32/float -> widened."""
    return spark.read.schema(target).parquet(path)


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Conform a loaded DataFrame to ``target``: missing columns become
    typed nulls, extra columns are dropped, mismatched primitive types
    are cast. Column order follows ``target``. Purely a projection —
    no shuffle, fully codegen'd."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif have[f.name] != f.dataType:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)

"""Query registry: name -> (spark builder, optional DuckDB oracle SQL).

Every operator in SURVEY.md §2 registers here; ``__spark_entry__.py``
exposes the registry to the driver. Invariants for oracle-checked
queries (the driver hash-compares values order-insensitively after
sorting columns by name):

- identical column names on both sides (alias everything);
- no raw timestamp columns in outputs (format to strings/dates);
- double-typed aggregates are computed decimal-exact and cast to
  double at the edge, so the value is independent of partition order
  and bit-identical across engines;
- similarity/ratio scores rounded to a fixed number of decimals on
  both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None -> rows-only check
    headline: bool = False  # include in bench.py


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, headline: bool = False):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name=name, build=fn, oracle=oracle, headline=headline)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: qd.build for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle}


def headline_queries() -> dict[str, QueryDef]:
    _ensure_loaded()
    return {name: qd for name, qd in REGISTRY.items() if qd.headline}


_loaded = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    from sanctions_data_pipeline_spark.plans import relational  # noqa: F401
    from sanctions_data_pipeline_spark.plans import relational_ext  # noqa: F401
    from sanctions_data_pipeline_spark.plans import tpch_shapes  # noqa: F401
    from sanctions_data_pipeline_spark.plans import tpch_shapes2  # noqa: F401
    try:
        from sanctions_data_pipeline_spark.plans import sanctions  # noqa: F401
    except ImportError:
        pass
    try:
        from sanctions_data_pipeline_spark.plans import training_data  # noqa: F401
    except ImportError:
        pass
    try:
        from sanctions_data_pipeline_spark.plans import streaming  # noqa: F401
    except ImportError:
        pass
    try:
        from sanctions_data_pipeline_spark.plans import multimodal  # noqa: F401
    except ImportError:
        pass
    try:
        from sanctions_data_pipeline_spark.plans import temporal  # noqa: F401
    except ImportError:
        pass
    _loaded = True

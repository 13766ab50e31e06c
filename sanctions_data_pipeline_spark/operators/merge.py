"""Upsert / merge-latest: latest-version-wins merge of change sets into
a base table — the batch equivalent of ``MERGE INTO`` (SCD type-1).

Spark-first shape: union the base and every change set with a version
ordinal, then keep the max-version row per key with ``max_by`` over a
single hash aggregation — ONE shuffle on the merge key, with map-side
partial combine, no window sort. At 100 TB the shuffle carries only the
columns being merged, and AQE handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def upsert_latest(base: DataFrame, updates: DataFrame, keys: list[str],
                  version_col: str = "_version") -> DataFrame:
    """Merge ``updates`` into ``base``: rows sharing ``keys`` are
    replaced by the update row; new keys are inserted.

    Both inputs must share a schema (minus ``version_col``, added
    here). Returns the merged table with base's column order plus
    ``n_versions`` (how many versions were seen per key — 1 for
    untouched rows, 2+ for upserts).
    """
    cols = base.columns
    tagged = (base.select(*cols, F.lit(0).alias(version_col))
              .unionByName(updates.select(*cols, F.lit(1).alias(version_col))))
    payload = F.struct(*[F.col(c) for c in cols if c not in keys])
    merged = (tagged.groupBy(*keys)
              .agg(F.max_by(payload, F.col(version_col)).alias("_p"),
                   F.count(F.lit(1)).cast("bigint").alias("n_versions")))
    return merged.select(
        *keys,
        *[F.col(f"_p.{c}").alias(c) for c in cols if c not in keys],
        "n_versions")

"""Entity-matching operators (reference main.py:421-522, 809-830,
950-1028), re-expressed as distributed DataFrame transformations.

The reference does dict lookups and sequential row scans on the driver;
here the mapping is a broadcast dimension and the variant probe is an
exploded equi-join — shuffle-free on the probe side at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from sanctions_data_pipeline_spark.functions.names import variant_keys


def build_variant_mapping(entries: DataFrame, name_col: str,
                          id_col: str, value_col: str) -> DataFrame:
    """Reference build_pdf_rem2_mapping (main.py:421-522): each entry
    contributes its 3 normalized name-variant keys; on key collision the
    FIRST entry wins (``if key not in mapping``), modeled by min(id)
    per key. Returns (match_key, <value_col>)."""
    exploded = entries.select(
        F.col(id_col).alias("__mid"),
        F.col(value_col).alias("__mval"),
        F.explode(variant_keys(F.col(name_col))).alias("match_key"),
    ).filter(F.col("match_key") != "")
    w = W.partitionBy("match_key").orderBy("__mid")
    return (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("match_key", F.col("__mval").alias(value_col))
    )


def variant_match(candidates: DataFrame, key_cols: list[str],
                  name_col: str, priority_col: str,
                  mapping: DataFrame, value_col: str) -> DataFrame:
    """Reference candidate loop (main.py:809-830): for each entity, try
    candidate names in priority order, and for each name its 3 variant
    keys in order; the first key present in the mapping wins.

    Distributed form: posexplode the variant keys (priority =
    priority_col * 3 + variant position), broadcast-join the mapping,
    keep the minimum-priority hit per entity."""
    exploded = candidates.select(
        *key_cols,
        F.col(priority_col).alias("__prio"),
        F.posexplode(variant_keys(F.col(name_col))).alias("__vpos", "match_key"),
    )
    hits = exploded.join(F.broadcast(mapping), "match_key")
    w = W.partitionBy(*key_cols).orderBy(
        F.col("__prio").asc(), F.col("__vpos").asc())
    return (
        hits.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*key_cols, F.col(value_col))
    )


def neighbor_fill(df: DataFrame, order_col: str, name_col: str,
                  cand_col: str, out_col: str = "filled",
                  flag_col: str | None = None) -> DataFrame:
    """Reference second pass (main.py:950-993): rows whose name is
    unique keep their candidate; 'UNKNOWN' rows blank out; duplicate
    names take the nearest non-empty candidate BEFORE and AFTER in the
    global row order, filled only when the two agree.

    The reference semantic is inherently global-sequential, so the
    windows here are unpartitioned (single-reducer). At 100 TB this
    operator is only meaningful per ordered shard; callers partition
    first (the E2E pipeline runs it per source file).

    ``flag_col`` (if given) marks rows whose value came from NEIGHBOR
    INFERENCE rather than their own candidate — the data-table
    equivalent of the reference's red row fill (main.py:994-1040,
    which colors inferred REM2 cells and propagates red to the row).
    """
    cand = F.when(F.col(cand_col) != "", F.col(cand_col))  # '' -> NULL
    w_all = W.orderBy(order_col)
    prev_ne = F.last(cand, ignorenulls=True).over(
        w_all.rowsBetween(W.unboundedPreceding, -1))
    next_ne = F.first(cand, ignorenulls=True).over(
        w_all.rowsBetween(1, W.unboundedFollowing))
    n_occ = F.count(F.lit(1)).over(W.partitionBy(name_col))
    filled = (
        F.when(F.col(name_col) == "UNKNOWN", F.lit(""))
        .when(n_occ == 1, F.coalesce(F.col(cand_col), F.lit("")))
        .when(prev_ne.isNotNull() & (prev_ne == next_ne), prev_ne)
        .otherwise(F.lit(""))
    )
    out = df.withColumn(out_col, filled)
    if flag_col:
        inferred = ((F.col(name_col) != "UNKNOWN") & (n_occ > 1)
                    & prev_ne.isNotNull() & (prev_ne == next_ne)
                    & cand.isNull())
        out = out.withColumn(
            flag_col, F.when(inferred, 1).otherwise(0).cast("bigint"))
    return out

"""Temporal join operators Spark has no native form for: as-of join
(point-in-time lookup) and range join (interval containment), both
expressed as compositions of built-in ops that scale linearly.

As-of: the classic union-merge — tag both sides, one shuffle by key,
``last_value(ignore nulls)`` over the interleaved time order. No per-row
subquery, no join explosion; cost is one shuffle + one sort per key
group, the same plan a native ASOF JOIN would produce.

Range: bucketize the probe window — right rows land in fixed-width time
buckets, each left row probes the ceil(window/width)+1 buckets its
interval spans (explode), equi-join on bucket, then exact-filter. The
fan-out is a small constant when width ~ window, so a 100 TB join
shuffles ~(1+fanout)x rows, never |L|x|R|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str = "ts",
              right_cols: list[str] | None = None,
              strict: bool = True) -> DataFrame:
    """For each left row, attach the most recent right row with the same
    ``on`` key and right.ts < left.ts (``strict``; <= otherwise).

    Ties inside the right side resolve to the row latest in
    (ts, *right_cols) order — deterministic. Output: every left column
    plus ``right_cols`` prefixed ``asof_`` (null when no prior row).
    """
    right_cols = right_cols or [c for c in right.columns
                                if c not in (on, ts)]
    lt = left.withColumn("_kind", F.lit(0 if strict else 2))
    rt = right.select(
        on, ts, *right_cols).withColumn("_kind", F.lit(1))
    aligned = lt.unionByName(rt, allowMissingColumns=True)
    order = [F.col(ts), F.col("_kind")] + [F.col(c) for c in right_cols]
    w = (W.partitionBy(on).orderBy(*order)
         .rowsBetween(W.unboundedPreceding, 0))
    filled = aligned.select(
        "*",
        *[F.last(F.when(F.col("_kind") == 1, F.col(c)), ignorenulls=True)
           .over(w).alias(f"asof_{c}") for c in right_cols],
    )
    return (filled.filter(F.col("_kind") != 1)
            .drop("_kind", *right_cols))


def range_join_count(left: DataFrame, right: DataFrame, ts: str = "ts",
                     window_us: int = 300_000_000,
                     agg_alias: str = "n_in_range") -> DataFrame:
    """Count right rows with ts in (left.ts - window, left.ts], with no
    equi-key — the bucketed range-join pattern. Bucket width = window
    width, so each left row probes exactly 2 buckets."""
    l_us = F.unix_micros(F.col(ts))
    r_us = F.unix_micros(F.col(ts))
    # integer `div` for bucket ids — float division can misplace values
    # sitting within one ulp of a bucket edge
    l_bucket = F.expr(f"unix_micros({ts}) div {window_us}")
    r_bucket = F.expr(f"unix_micros({ts}) div {window_us}")
    probe = left.select(
        "*", F.explode(F.array(l_bucket, l_bucket - 1)).alias("_bucket"),
        l_us.alias("_l_us"))
    build = right.select(r_bucket.alias("_bucket"), r_us.alias("_r_us"))
    joined = probe.join(
        build,
        (probe["_bucket"] == build["_bucket"])
        & (F.col("_r_us") > F.col("_l_us") - F.lit(window_us))
        & (F.col("_r_us") <= F.col("_l_us")),
        "left_outer")
    # a left row appears once per probed bucket; an in-range right row
    # matches only in its own bucket, so each pair counts exactly once
    # and the groupBy re-merges the probe copies (left needs a unique key
    # among its columns for that merge to be per-row)
    return joined.groupBy(*left.columns).agg(
        F.count("_r_us").alias(agg_alias))

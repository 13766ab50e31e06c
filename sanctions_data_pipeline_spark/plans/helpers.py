"""Cross-engine determinism helpers.

Double-typed aggregates computed naively (``SUM(double)``) depend on
partition/accumulation order, so a Spark result and a DuckDB oracle can
differ in the last bits and fail a value-hash compare. All money/metric
aggregations here go through decimal (exact, order-independent) and are
cast to double only at the output edge — bit-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Canonical decimal shapes: values (prices, quantities) are < 10^12 with
# 2-4 meaningful decimals; rates (discount/tax) are < 1 with 4 decimals.
VAL = "decimal(18,4)"
RATE = "decimal(8,4)"


def dval(col) -> Column:
    return F.col(col).cast(VAL) if isinstance(col, str) else col.cast(VAL)


def drate(col) -> Column:
    return F.col(col).cast(RATE) if isinstance(col, str) else col.cast(RATE)


def _as_exact_double(dec_agg: Column) -> Column:
    """Exact decimal -> double, deterministically and identically across
    engines.

    A plain decimal->double cast is NOT portable: DuckDB computes
    int128_unscaled * 10^-scale in float math (1-ulp off once the
    unscaled value passes 2^53) while Spark's BigDecimal.doubleValue is
    correctly rounded. Route through round-to-4dp -> scaled bigint ->
    /10000.0: integer-exact on both sides, then one IEEE division both
    engines perform identically. Exact while |value| < 2^53/10^4 ≈ 9e11.
    """
    return (F.round(dec_agg, 4) * 10000).cast("bigint") / F.lit(10000.0)


def dsum(col: Column, alias: str) -> Column:
    """Exact decimal sum, surfaced as a portable double."""
    return _as_exact_double(F.sum(col)).alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    return (_as_exact_double(F.sum(col)) / F.count(F.lit(1))).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB fragment mirroring :func:`dsum`."""
    return f"CAST(ROUND(SUM({expr}), 4) * 10000 AS BIGINT) / 10000.0 AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB fragment mirroring :func:`davg`."""
    return f"CAST(ROUND(SUM({expr}), 4) * 10000 AS BIGINT) / 10000.0 / COUNT(*) AS {alias}"


# Common SQL operand shapes (oracle side of dval/drate compositions)
SQL_VAL = "CAST({} AS DECIMAL(18,4))"
SQL_RATE = "CAST({} AS DECIMAL(8,4))"
SQL_REVENUE = ("CAST(l_extendedprice AS DECIMAL(18,4))"
               " * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))")


def lcount(alias: str) -> Column:
    return F.count(F.lit(1)).alias(alias)


def ts_str(col, fmt: str = "yyyy-MM-dd") -> Column:
    """Format a timestamp for output (never emit raw timestamps: Spark
    session-TZ timestamps vs DuckDB naive timestamps hash differently)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)


def pround6(col: Column) -> Column:
    """Portable 6dp rounding for small-integer quotients: floor(x*1e6
    + 0.5) over the identical IEEE double. F.round's HALF_UP and
    DuckDB's float round disagree when the quotient lands exactly on a
    .5 ulp boundary (seen at sf0.1 in q_rank_functions); pair with
    :func:`sql_pround6` on the oracle side."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def sql_pround6(expr: str) -> str:
    """DuckDB fragment mirroring :func:`pround6`."""
    return f"CAST(FLOOR(({expr}) * 1000000 + 0.5) AS BIGINT) / 1000000.0"


def sharded_lateness_hours(ev):
    """Whole-hours lateness of each event vs the event_id-order
    high-water-mark, computed with the SHARDED prefix-max plan:
    events range-shard on event_id (order-preserving), the running max
    windows PER SHARD, and the cross-shard carry-in is a prefix max
    over the tiny per-shard-max table (broadcast back). Identical
    values to one global window; the big sort is n_shards-way
    parallel. Driver state is two longs (min/max event_id); an EMPTY
    events table short-circuits to an empty frame (the hardening
    contract — aggregating Nones would crash at plan-build time).
    Shared by q_lateness_profile and q_watermark_advice."""
    from pyspark.sql import Window as W, functions as F

    mn, mx = ev.agg(F.min("event_id"), F.max("event_id")).first()
    if mn is None:
        return ev.select(F.lit(0).cast("bigint").alias("late_hours")).limit(0)
    n_shards = 32
    width = max(1, (int(mx) - int(mn)) // n_shards + 1)
    e = ev.select(
        "event_id", F.unix_micros("ts").alias("us"),
        ((F.col("event_id") - F.lit(int(mn))) / F.lit(width))
        .cast("bigint").alias("shard"))
    local = e.withColumn(
        "local_hwm",
        F.max("us").over(
            W.partitionBy("shard").orderBy("event_id")
            .rowsBetween(W.unboundedPreceding, 0)))
    carry = (e.groupBy("shard").agg(F.max("us").alias("shard_max"))
             .select("shard",
                     F.max("shard_max").over(
                         W.orderBy("shard")
                         .rowsBetween(W.unboundedPreceding, -1))
                     .alias("carry_hwm")))
    return (local.join(F.broadcast(carry), "shard")
            .select(F.floor((F.greatest("local_hwm", "carry_hwm")
                             - F.col("us")) / F.lit(3600000000.0))
                    .cast("bigint").alias("late_hours")))

"""Relational operator suite (SURVEY.md §2, block 1).

TPC-H-style queries over the synthetic star schema, each exercising a
core operator family: scan→filter→agg, multi-way joins (broadcast dims),
window top-k, conditional agg, rollup, semi/anti joins, set ops, time
bucketing and sessionization.

Scale notes (100 TB): all dimension joins (region/nation/supplier and
customer where it is dim-like) are explicitly broadcast; fact-side aggs
are partial (map-side combine comes free with hash aggregation); window
queries partition by bounded keys (nation, user) so no global sort is
ever required; every filter is a plain column predicate that pushes to
the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from sanctions_data_pipeline_spark.catalog import load_table, widen_small_scan
from sanctions_data_pipeline_spark.plans.helpers import (
    SQL_REVENUE, davg, drate, dsum, dval, lcount, sql_davg, sql_dsum, ts_str,
)
from sanctions_data_pipeline_spark.plans.registry import register


# --------------------------------------------------------------------------
# q1: pricing summary — scan → filter → 8-agg hash aggregate
# --------------------------------------------------------------------------
@register("q1_pricing_summary", headline=True, oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum("CAST(l_quantity AS DECIMAL(18,4))", "sum_qty")},
       {sql_dsum("CAST(l_extendedprice AS DECIMAL(18,4))", "sum_base_price")},
       {sql_dsum(SQL_REVENUE, "sum_disc_price")},
       {sql_dsum(SQL_REVENUE + " * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))",
                 "sum_charge")},
       {sql_davg("CAST(l_quantity AS DECIMAL(18,4))", "avg_qty")},
       {sql_davg("CAST(l_extendedprice AS DECIMAL(18,4))", "avg_price")},
       {sql_davg("CAST(l_discount AS DECIMAL(8,4))", "avg_disc")},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dval("l_extendedprice") * (F.lit(1).cast("decimal(8,4)") - drate("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(8,4)") + drate("l_tax"))
    # the 8 decimal aggregates are the CPU-heavy map side: parallelize
    # an under-split local scan AFTER the pushed filter (no-op at
    # cluster scale — see widen_small_scan). The shuffle keys on
    # l_extendedprice — a column the aggregate already scans (keying on
    # l_orderkey would widen ReadSchema by one column, which the
    # test_q1_scan_prunes_columns lint rejects) with enough distinct
    # values to spread evenly.
    return (
        widen_small_scan(
            li.filter(F.col("l_shipdate")
                      <= F.lit("2000-12-01").cast("timestamp")),
            "l_extendedprice")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dval("l_quantity"), "sum_qty"),
            dsum(dval("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(dval("l_quantity"), "avg_qty"),
            davg(dval("l_extendedprice"), "avg_price"),
            davg(drate("l_discount"), "avg_disc"),
            lcount("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q3: shipping priority — fact-fact joins + agg + deterministic top-k
# --------------------------------------------------------------------------
@register("q3_shipping_priority", headline=True, oracle=f"""
SELECT l_orderkey,
       {sql_dsum(SQL_REVENUE, "revenue")},
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    revenue = dval("l_extendedprice") * (F.lit(1).cast("decimal(8,4)") - drate("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select(
            "l_orderkey", "revenue",
            ts_str("o_orderdate").alias("o_orderdate_str"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q5: local supplier volume — 6-way join, broadcast dims
# --------------------------------------------------------------------------
@register("q5_local_supplier", headline=True, oracle=f"""
SELECT n_name,
       {sql_dsum(SQL_REVENUE, "revenue")}
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""")
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dval("l_extendedprice") * (F.lit(1).cast("decimal(8,4)") - drate("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp),
              (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
    )


# --------------------------------------------------------------------------
# q6: forecast revenue — highly selective scan, full predicate pushdown
# --------------------------------------------------------------------------
@register("q6_forecast_revenue", headline=True, oracle=f"""
SELECT {sql_dsum("CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(8,4))",
                 "revenue")},
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(
            dsum(dval("l_extendedprice") * drate("l_discount"), "revenue"),
            lcount("n_items"),
        )
    )


# --------------------------------------------------------------------------
# window top-k per group
# --------------------------------------------------------------------------
@register("q_top_customers_window", oracle="""
SELECT n_name, c_name, c_acctbal, rnk FROM (
  SELECT n_name, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) WHERE rnk <= 3
""")
def q_top_customers_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_name", "c_acctbal", "c_custkey")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .drop("c_custkey")
    )


# --------------------------------------------------------------------------
# conditional aggregation (pivot-style)
# --------------------------------------------------------------------------
@register("q_priority_pivot", oracle=f"""
SELECT c_mktsegment,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
           AS n_high,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
       CAST(SUM(CASE WHEN o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') THEN 1 ELSE 0 END) AS BIGINT)
           AS n_low,
       COUNT(*) AS n_orders,
       {sql_dsum("CAST(o_totalprice AS DECIMAL(18,4))", "total_price")}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""")
def q_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    def flag(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            flag(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).alias("n_high"),
            flag(F.col("o_orderpriority") == "3-MEDIUM").alias("n_medium"),
            flag(F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")).alias("n_low"),
            lcount("n_orders"),
            dsum(dval("o_totalprice"), "total_price"),
        )
    )


# --------------------------------------------------------------------------
# rollup — hierarchical aggregation
# --------------------------------------------------------------------------
@register("q_rollup_sales", oracle=f"""
SELECT r_name, n_name,
       {sql_dsum("CAST(c_acctbal AS DECIMAL(18,4))", "total_acctbal")},
       COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""")
def q_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(dsum(dval("c_acctbal"), "total_acctbal"), lcount("n_customers"))
    )


# --------------------------------------------------------------------------
# semi / anti joins (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------
@register("q_semi_anti", oracle="""
WITH w AS (
  SELECT c_mktsegment, COUNT(*) AS n_with_orders
  FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_mktsegment
), wo AS (
  SELECT c_mktsegment, COUNT(*) AS n_without_orders
  FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_mktsegment
)
SELECT s.c_mktsegment,
       COALESCE(w.n_with_orders, 0) AS n_with_orders,
       COALESCE(wo.n_without_orders, 0) AS n_without_orders
FROM (SELECT DISTINCT c_mktsegment FROM customer) s
LEFT JOIN w ON s.c_mktsegment = w.c_mktsegment
LEFT JOIN wo ON s.c_mktsegment = wo.c_mktsegment
""")
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment").agg(lcount("n_with_orders")))
    without_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment").agg(lcount("n_without_orders")))
    segments = cust.select("c_mktsegment").distinct()
    return (
        segments
        .join(with_orders, "c_mktsegment", "left")
        .join(without_orders, "c_mktsegment", "left")
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


# --------------------------------------------------------------------------
# set ops: union all + distinct
# --------------------------------------------------------------------------
@register("q_distinct_union", oracle="""
SELECT DISTINCT n_name, kind FROM (
  SELECT n_name, 'customer_nation' AS kind
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT n_name, 'supplier_nation' AS kind
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
)
""")
def q_distinct_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    a = (cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
         .select("n_name", F.lit("customer_nation").alias("kind")))
    b = (supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
         .select("n_name", F.lit("supplier_nation").alias("kind")))
    return a.unionAll(b).distinct()


# --------------------------------------------------------------------------
# time bucketing (tumbling window, batch form)
# --------------------------------------------------------------------------
@register("q_events_bucketed", headline=True, oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum("CAST(value AS DECIMAL(18,4))", "total_value")},
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
""")
def q_events_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            ts_str(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type")
        .agg(
            lcount("n_events"),
            dsum(dval("value"), "total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# --------------------------------------------------------------------------
# sessionization — gaps-and-islands via window functions
# --------------------------------------------------------------------------
@register("q_sessionize", headline=True, oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                   OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, event_id, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       COUNT(*) AS n_events,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) AS session_end_us,
       {sql_dsum("CAST(value AS DECIMAL(18,4))", "total_value")}
FROM sessions
GROUP BY user_id, session_seq
""")
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)) > 1_800_000_000),
            1).otherwise(0))
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("bigint"))
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            lcount("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
            dsum(dval("value"), "total_value"),
        )
    )


# --------------------------------------------------------------------------
# q_skew_salted — two-stage salted aggregation for hot grouping keys.
# events has only 5 event_type values, so at 100 TB a single-stage
# groupBy(event_type) funnels everything through 5 reducers; salting
# fans each hot key across 32 partial groups first and combines the 32
# partials second, keeping every reducer busy. Decimal partials keep
# the sum exact, so the result (and oracle) equal the unsalted agg.
# --------------------------------------------------------------------------
@register("q_skew_salted", headline=True, oracle=f"""
SELECT event_type, COUNT(*) AS n_events,
       {sql_dsum("CAST(value AS DECIMAL(18,4))", "total_value")}
FROM events
GROUP BY event_type
""")
def q_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctions_data_pipeline_spark.plans.helpers import _as_exact_double

    ev = load_table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("_salt", F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(32)))
        .groupBy("event_type", "_salt")
        .agg(F.count(F.lit(1)).alias("_n"),
             F.sum(dval("value")).alias("_v"))
    )
    return (
        partial.groupBy("event_type")
        .agg(F.sum("_n").alias("n_events"),
             _as_exact_double(F.sum("_v")).alias("total_value"))
    )


# --------------------------------------------------------------------------
# q_cube_sales — full grouping-sets lattice (CUBE) over order
# priority x status: all four grouping combinations in ONE pass over
# the fact table (Catalyst expands the lattice map-side; one shuffle).
# --------------------------------------------------------------------------
@register("q_cube_sales", oracle=f"""
SELECT o_orderpriority, o_orderstatus,
       {sql_dsum("CAST(o_totalprice AS DECIMAL(18,4))", "total_price")},
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""")
def q_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(dsum(dval("o_totalprice"), "total_price"), lcount("n_orders"))
    )


# --------------------------------------------------------------------------
# q_approx_sketch — sketch aggregates: HyperLogLog++ distinct counts and
# t-digest-style approximate quantiles. THE at-scale substitute for
# exact COUNT(DISTINCT)/percentile: fixed-size mergeable sketch state
# flows through the map-side combine, no per-key explosion, one narrow
# shuffle of sketch buffers.
#
# Oracle contract: sketch ESTIMATES are engine-specific, so the query
# emits (a) the exact counts (hash-verified cross-engine) and (b) the
# accuracy invariants AS BOOLEAN COLUMNS computed in-query — HLL++
# estimate within 3*rsd of the exact distinct, approx-median inside
# the exact [p45, p55] band — which the oracle states as literals.
# A sketch regression flips a boolean and fails the driver hash; the
# raw-estimate tolerance pin in tests/test_relational.py remains.
# --------------------------------------------------------------------------
@register("q_approx_sketch", oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS users_within_rsd,
       TRUE AS median_in_band
FROM events GROUP BY event_type
""")
def q_approx_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_median"),
        F.count_distinct("user_id").alias("exact_users"),
        F.expr("percentile(value, 0.45)").alias("p45"),
        F.expr("percentile(value, 0.55)").alias("p55"),
        lcount("n_events"))
    tol = F.greatest(F.lit(2.0), F.lit(0.03) * F.col("exact_users"))
    return agg.select(
        "event_type", "n_events",
        F.col("exact_users").cast("bigint").alias("exact_users"),
        (F.abs(F.col("approx_users") - F.col("exact_users")) <= tol)
        .alias("users_within_rsd"),
        ((F.col("approx_median") >= F.col("p45"))
         & (F.col("approx_median") <= F.col("p55"))).alias("median_in_band"))

"""Temporal-join suite: as-of join and range join over the events
stream (operators Spark lacks natively; see operators/temporal.py for
the scalable compositions).

Oracle discipline: the as-of oracle mirrors the union-merge windowing
EXACTLY (same interleave ordering, same tie-breaks) rather than using
DuckDB's ASOF JOIN keyword, whose tie resolution among equal right
timestamps is unspecified; the range oracle is a plain non-equi join
DuckDB executes as an IEJoin. Timestamps surface as epoch micros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.operators.temporal import (
    asof_join, range_join_count,
)
from sanctions_data_pipeline_spark.plans.registry import register


# --------------------------------------------------------------------------
# q_asof_join — for each click, the user's most recent STRICTLY-prior
# purchase (point-in-time state lookup)
# --------------------------------------------------------------------------
@register("q_asof_join", headline=True, oracle="""
WITH tagged AS (
  SELECT user_id, ts, event_id, NULL::BIGINT AS p_event_id,
         NULL::DOUBLE AS p_value, 0 AS kind
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, NULL, event_id, value, 1
  FROM events WHERE event_type = 'purchase'
), filled AS (
  SELECT user_id, ts, event_id, kind,
         last_value(p_event_id IGNORE NULLS) OVER w AS asof_p_event_id,
         last_value(p_value IGNORE NULLS) OVER w AS asof_p_value
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind, p_event_id, p_value
               ROWS UNBOUNDED PRECEDING)
)
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       asof_p_event_id, round(asof_p_value, 6) AS asof_p_value
FROM filled WHERE kind = 0
""")
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("p_event_id"), F.col("value").alias("p_value"))
    out = asof_join(clicks, purchases, on="user_id", ts="ts",
                    right_cols=["p_event_id", "p_value"], strict=True)
    return out.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        "asof_p_event_id", F.round("asof_p_value", 6).alias("asof_p_value"))


# --------------------------------------------------------------------------
# q_range_join — clicks within the 5 minutes before each error (no
# equi-key; bucketed range join, 2-bucket fan-out)
# --------------------------------------------------------------------------
@register("q_range_join", headline=True, oracle="""
SELECT e.event_id, epoch_us(e.ts) AS ts_us, count(c.ts) AS n_clicks
FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT ts FROM events WHERE event_type = 'click') c
  ON epoch_us(c.ts) > epoch_us(e.ts) - 300000000
 AND epoch_us(c.ts) <= epoch_us(e.ts)
GROUP BY e.event_id, e.ts
""")
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("ts")
    out = range_join_count(errors, clicks, ts="ts",
                           window_us=300_000_000, agg_alias="n_clicks")
    return out.select("event_id", F.unix_micros("ts").alias("ts_us"),
                      "n_clicks")

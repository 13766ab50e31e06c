"""Structured Streaming suite (SURVEY.md §2): watermarked tumbling and
session-window aggregations, drained through ``availableNow`` into a
memory sink so the driver's batch oracle can hash-compare them.

In ``complete`` output mode over a bounded file source the streaming
result equals the batch aggregation exactly, which is what the DuckDB
oracles express. Append-mode watermark semantics (late-row drop, closed
-window emission) are pinned by ``tests/test_streaming.py`` instead —
they depend on trigger batch boundaries, which no batch SQL can mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sanctions_data_pipeline_spark.plans.helpers import sql_dsum
from sanctions_data_pipeline_spark.plans.registry import register
from sanctions_data_pipeline_spark.streaming.ops import (
    dedup_hourly, read_events_stream, run_available_now, session_agg,
    tumbling_agg, user_running_stats,
)

_DVAL = "CAST(value AS DECIMAL(18,4))"


# --------------------------------------------------------------------------
# st_tumbling — watermark + 1h tumbling window agg (streaming)
# --------------------------------------------------------------------------
@register("st_tumbling", oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR,
                '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum(_DVAL, "total_value")}
FROM events
GROUP BY 1, 2, 3
""")
def st_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return run_available_now(tumbling_agg(ev, "1 hour", watermark="2 hours"))


# --------------------------------------------------------------------------
# st_session — session_window (30 min gap) streaming agg. Spark's merge
# is INCLUSIVE at the boundary (an event at exactly last_event + gap
# extends the session — pinned by tests/test_streaming.py), so the
# oracle's new-session predicate is strictly `> gap`.
# --------------------------------------------------------------------------
@register("st_session", headline=True, oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) + 1800000000 AS session_end_us,
       COUNT(*) AS n_events,
       {sql_dsum(_DVAL, "total_value")}
FROM sessions
GROUP BY user_id, session_seq
""")
def st_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return run_available_now(session_agg(ev, "30 minutes", watermark="2 hours"))


# --------------------------------------------------------------------------
# st_dedup — watermark-bounded streaming exact dedup
# (dropDuplicatesWithinWatermark; state evicted past the horizon)
# --------------------------------------------------------------------------
@register("st_dedup", oracle="""
SELECT DISTINCT user_id, event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour
FROM events
""")
def st_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return run_available_now(dedup_hourly(ev, watermark="2 hours"),
                             output_mode="append")


# --------------------------------------------------------------------------
# st_user_state — custom stateful operator (applyInPandasWithState):
# per-user running count/max. Over the bounded availableNow stream the
# final emission per user equals the batch aggregate, which the oracle
# expresses; incremental multi-batch state updates are pinned by
# tests/test_streaming.py.
# --------------------------------------------------------------------------
@register("st_user_state", oracle="""
SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
FROM events
GROUP BY user_id
""")
def st_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return run_available_now(user_running_stats(ev), output_mode="append")


# --------------------------------------------------------------------------
# st_stream_static — stream-static broadcast join + per-segment agg.
# In complete mode over the bounded availableNow stream the result
# equals the batch left-join aggregate the oracle expresses.
# --------------------------------------------------------------------------
@register("st_stream_static", oracle=f"""
SELECT c_mktsegment,
       COUNT(*) AS n_events,
       {sql_dsum(_DVAL, "total_value")}
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""")
def st_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctions_data_pipeline_spark.catalog import load_table
    from sanctions_data_pipeline_spark.streaming.ops import stream_static_enrich

    ev = read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    return run_available_now(stream_static_enrich(ev, cust))


# --------------------------------------------------------------------------
# st_sliding — sliding-window (2h length, 1h slide) streaming agg: each
# event lands in exactly two windows, whose starts are its floor-hour
# and the hour before — which is what the oracle's unnest expresses.
# --------------------------------------------------------------------------
@register("st_sliding", oracle=f"""
WITH x AS (
  SELECT event_type, value,
         unnest([date_trunc('hour', ts),
                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
  FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(ws + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum(_DVAL, "total_value")}
FROM x GROUP BY 1, 2, 3
""")
def st_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctions_data_pipeline_spark.streaming.ops import sliding_agg

    ev = read_events_stream(spark, sf_dir)
    return run_available_now(sliding_agg(ev, "2 hours", "1 hour",
                                         watermark="2 hours"))


# --------------------------------------------------------------------------
# st_stream_stream — watermarked stream-stream interval join (click →
# same-user purchase within 30 min). Append mode; equals the batch
# interval join the oracle expresses.
# --------------------------------------------------------------------------
@register("st_stream_stream", oracle="""
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
""")
def st_stream_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctions_data_pipeline_spark.streaming.ops import click_purchase_join

    ev1 = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "click")
    ev2 = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    return run_available_now(click_purchase_join(ev1, ev2),
                             output_mode="append")


# --------------------------------------------------------------------------
# st_left_outer_join — watermarked LEFT OUTER stream-stream interval
# join (every click; purchase columns NULL once the watermark proves
# no match can arrive). Outer rows are final only when the click's
# join state is evictable. Spark tracks event-time watermarks in
# MILLISECONDS (EventTimeStats) and solves the state-watermark
# inequality at ms granularity with conservative rounding, so the
# empirically-pinned cutoff (tests/test_streaming.py boundary cases)
# is: emitted iff ceil_ms(click_ts) + horizon < floor_ms(min of both
# streams' max event time) - delay. The oracle encodes exactly that;
# matched rows are never withheld.
# --------------------------------------------------------------------------
@register("st_left_outer_join", oracle="""
WITH c AS (
  SELECT user_id, ts AS click_ts, event_id AS click_id,
         CASE WHEN date_trunc('milliseconds', ts) = ts
              THEN ts
              ELSE date_trunc('milliseconds', ts) + INTERVAL 1 MILLISECOND
         END AS click_ceil_ms
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id AS pu, ts AS pts, event_id AS pid
  FROM events WHERE event_type = 'purchase'
),
wm AS (
  SELECT date_trunc('milliseconds',
                    least((SELECT max(click_ts) FROM c),
                          (SELECT max(pts) FROM p)))
         - INTERVAL 2 HOUR AS w
)
SELECT c.user_id, c.click_id, p.pid AS purchase_id,
       epoch_us(p.pts) - epoch_us(c.click_ts) AS delay_us
FROM c JOIN p ON c.user_id = p.pu
             AND p.pts >= c.click_ts
             AND p.pts <= c.click_ts + INTERVAL 30 MINUTE
UNION ALL
SELECT c.user_id, c.click_id,
       CAST(NULL AS BIGINT) AS purchase_id, CAST(NULL AS BIGINT) AS delay_us
FROM c, wm
WHERE NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.pu = c.user_id AND p.pts >= c.click_ts
          AND p.pts <= c.click_ts + INTERVAL 30 MINUTE)
  AND c.click_ceil_ms + INTERVAL 30 MINUTE < wm.w
""")
def st_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctions_data_pipeline_spark.streaming.ops import (
        click_purchase_left_join)

    ev1 = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "click")
    ev2 = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    return run_available_now(click_purchase_left_join(ev1, ev2),
                             output_mode="append")


# --------------------------------------------------------------------------
# st_foreach_upsert — foreachBatch MERGE sink: per-user latest state
# maintained across micro-batches in a parquet state table. Over the
# bounded source the final state equals the batch argmax-by-(ts,
# event_id) per user, which the oracle expresses with ROW_NUMBER.
# --------------------------------------------------------------------------
@register("st_foreach_upsert", oracle="""
SELECT user_id, last_ts_us, last_event_id, last_value
FROM (
  SELECT user_id, epoch_us(ts) AS last_ts_us, event_id AS last_event_id,
         value AS last_value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""")
def st_foreach_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctions_data_pipeline_spark.streaming.ops import foreach_upsert_latest

    return foreach_upsert_latest(spark, sf_dir)


# --------------------------------------------------------------------------
# st_chained_windows — TWO stateful window aggregations chained in one
# streaming query (15-min tumbling -> hourly re-agg), Spark's
# multi-stateful-operator support.
#
# Oracle contract (round 9): the RAW drained emission set is
# batch-structure-dependent — a round-7 conversion attempt measured
# two different cutoff rules (sf0.001 single-batch emits hourly
# windows with end <= max(ts) - wm(2h) - outer(1h); multi-batch
# structures emit up to end <= max(ts) - wm because the propagated
# watermark ratchets per micro-batch). But every structure emits AT
# LEAST the worst-case prefix end <= max(ts) - 3h (one full
# watermark-propagation delay behind the final watermark), so the
# registered entry keeps exactly that STABLE PREFIX: deterministic
# across batch structures, engines and restarts — the subset a
# downstream consumer may rely on without replaying the trigger
# sequence. The oracle is the batch hourly rollup under the same
# cutoff; the raw emission-set-vs-batch-prefix law (including the
# structure-dependent tail) stays pinned by tests/test_streaming.py.
# --------------------------------------------------------------------------
@register("st_chained_windows", oracle=f"""
WITH mx AS (SELECT max(ts) AS m FROM events)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum(_DVAL, "total_value")}
FROM events, mx
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 3 HOUR
GROUP BY 1, 2
""")
def st_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctions_data_pipeline_spark.catalog import load_table
    from sanctions_data_pipeline_spark.streaming.ops import chained_window_agg

    ev = read_events_stream(spark, sf_dir)
    drained = run_available_now(chained_window_agg(ev), output_mode="append")
    mx = load_table(spark, sf_dir, "events").agg(F.max("ts")).first()[0]
    if mx is None:
        return drained
    return drained.filter(
        F.to_timestamp("window_start") + F.expr("INTERVAL 1 HOUR")
        <= F.lit(mx) - F.expr("INTERVAL 3 HOURS"))


# --------------------------------------------------------------------------
# st_scd2_lookup — stream-static join against a TYPE-2 dimension:
# each streaming event looks up the status version whose validity
# interval covers its event time (open-ended current rows match the
# 2024 event stream; closed history rows can't). Stream-static joins
# accept arbitrary predicates, so the interval condition runs as-is;
# the dim is driver-built once per micro-batch and broadcast. Oracle
# is the identical batch join.
# --------------------------------------------------------------------------
@register("st_scd2_lookup", oracle="""
WITH ordered AS (
  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
         LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
), changes AS (
  SELECT * FROM ordered WHERE prev IS NULL OR prev <> o_orderstatus
), dim AS (
  SELECT o_custkey AS k, o_orderstatus AS status, o_orderdate AS vf,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS vt
  FROM changes
)
SELECT e.event_id, e.user_id, d.status,
       CAST(COUNT(*) OVER () AS BIGINT) AS n_matched
FROM events e JOIN dim d
  ON e.user_id = d.k AND e.ts >= d.vf AND (d.vt IS NULL OR e.ts < d.vt)
""")
def st_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctions_data_pipeline_spark.catalog import load_table
    from sanctions_data_pipeline_spark.plans.temporal import q_scd2

    dim = (q_scd2(spark, sf_dir)
           .select(F.col("o_custkey").alias("k"), "status",
                   F.to_timestamp("valid_from").alias("vf"),
                   F.to_timestamp("valid_to").alias("vt")))
    ev = read_events_stream(spark, sf_dir)
    joined = ev.join(
        F.broadcast(dim),
        (ev.user_id == dim.k) & (ev.ts >= dim.vf)
        & (dim.vt.isNull() | (ev.ts < dim.vt)))
    out = run_available_now(
        joined.select("event_id", "user_id", "status"), output_mode="append")
    n = out.count()
    return out.withColumn("n_matched", F.lit(n).cast("bigint"))


# --------------------------------------------------------------------------
# st_anomaly — streaming z-score window monitor: per (1h tumbling
# window, event_type), exact-decimal n/mean/std/max and an outlier
# flag (max > mean + 2σ). All three moments are map-side-combinable,
# so streaming state per open window is O(1); in complete mode over
# the bounded source it equals the batch aggregation the oracle
# expresses.
# --------------------------------------------------------------------------
_SQ = f"({_DVAL} * {_DVAL})"
_ZS_STATS = f"""
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR,
                  '%Y-%m-%d %H:%M:%S') AS window_end,
         event_type,
         COUNT(*) AS n_events,
         CAST(ROUND(SUM({_DVAL}), 4) * 10000 AS BIGINT) / 10000.0 AS s,
         CAST(ROUND(SUM({_SQ}), 4) * 10000 AS BIGINT) / 10000.0 AS sq,
         CAST(ROUND(MAX({_DVAL}), 4) * 10000 AS BIGINT) / 10000.0 AS mx
  FROM events GROUP BY 1, 2, 3
"""


@register("st_anomaly", oracle=f"""
WITH a AS ({_ZS_STATS})
SELECT window_start, window_end, event_type,
       CAST(n_events AS BIGINT) AS n_events,
       round(s / n_events, 6) AS mean_value,
       round(sqrt(greatest(sq / n_events
                           - (s / n_events) * (s / n_events), 0.0)), 6)
         AS std_value,
       round(mx, 6) AS max_value,
       (mx - s / n_events)
         > 2.0 * sqrt(greatest(sq / n_events
                               - (s / n_events) * (s / n_events), 0.0))
         AS has_outlier
FROM a
""")
def st_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctions_data_pipeline_spark.streaming.ops import zscore_window_agg

    ev = read_events_stream(spark, sf_dir)
    return run_available_now(zscore_window_agg(ev, "1 hour",
                                               watermark="2 hours"))


# --------------------------------------------------------------------------
# st_topk_trending — windowed trending top-k: the streaming side
# maintains the watermarked 1h tumbling (window, event_type) counts;
# the per-window rank runs on the DRAINED complete-mode result — the
# standard deployment split (stateful counting in the stream, ranking
# in the serving query / foreachBatch), since a global rank is not an
# incremental operator. Top-3 per window, count-desc, type-asc ties.
# --------------------------------------------------------------------------
_TOPK_TREND = 3


@register("st_topk_trending", oracle=f"""
WITH c AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT window_start, event_type, n_events,
         CAST(ROW_NUMBER() OVER (PARTITION BY window_start
                            ORDER BY n_events DESC, event_type) AS BIGINT)
           AS rnk
  FROM c
)
SELECT window_start, event_type, n_events, rnk
FROM r WHERE rnk <= {_TOPK_TREND}
""")
def st_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = read_events_stream(spark, sf_dir)
    counts = run_available_now(
        ev.withWatermark("ts", "2 hours")
          .groupBy(F.window("ts", "1 hour"), "event_type")
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_events")))
    w = W.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type"))
    return (counts.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .alias("window_start"), "event_type", "n_events")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _TOPK_TREND))

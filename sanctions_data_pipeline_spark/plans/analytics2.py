"""Round-4 analytics, continued (SURVEY.md §2): technical-analysis
style screens over the daily event-value series (Bollinger bands,
drawdown-from-peak, RSI) and rank statistics (Spearman correlation).

Mirrors the reference's time-series monitoring surface (reference
analyzes per-day aggregate movements of scraped sanction totals) the
Spark-first way: one daily pre-aggregation (map-side combine into a
tiny day-grid), then bounded window math over the day series. The day
grid is O(days) regardless of input scale, so every op here scans the
events table once, shuffles only (day, exact-int aggregate) pairs, and
runs the window pass on a table of a few thousand rows — at 100 TB the
scan dominates and parallelizes; the series math stays trivial.

Cross-engine float discipline (same as plans/analytics.py): daily
values are x4 fixed-point bigints (exact, order-independent); moving
means/variances fold the windowed values in day order on both engines
so double accumulation is bit-identical; ratios rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.plans.helpers import lcount
from sanctions_data_pipeline_spark.plans.registry import register

# Daily value series: x4 fixed-point sum of events.value per UTC day.
# Exact bigint on both engines (decimal accumulate, one scale shift).
_DAILY_SQL = """
  SELECT CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS i,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) * 10000
              AS BIGINT) AS x4
  FROM events GROUP BY 1, 2
"""


def _daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.unix_micros(F.date_trunc("day", "ts"))
                / F.lit(86400000000)).cast("bigint").alias("i"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg((F.round(F.sum(F.col("value").cast("decimal(18,4)")), 4)
           * 10000).cast("bigint").alias("x4"))


# ---------------------------------------------------------------------------
# q_bollinger_bands — 20-day trailing Bollinger bands over the daily
# event-value series: moving mean, population stddev, mean ± 2σ, and
# %B (where today sits inside the band). The mean comes from exact
# window sums; the variance folds the windowed values in day order
# (list-over-window → sort → sequential double fold, bit-identical on
# both engines — the q_acf discipline applied inside a moving frame).
# ---------------------------------------------------------------------------
_BOLL_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
w AS (
  SELECT i, day, x4,
         CAST(count(*) OVER win AS BIGINT) AS n,
         CAST(sum(x4) OVER win AS BIGINT) AS s,
         list(x4) OVER win AS xs
  FROM daily
  WINDOW win AS (ORDER BY i ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
),
m AS (
  SELECT i, day, x4, n,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean4,
         sqrt(list_aggregate(list_transform(list_sort(xs),
           v -> (CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))),
           'sum') / CAST(n AS DOUBLE)) AS sd4
  FROM w
)
SELECT day, n, x4 / 10000.0 AS x,
       round(mean4 / 10000.0, 6) AS mean,
       round(sd4 / 10000.0, 6) AS sd,
       round((mean4 + 2.0 * sd4) / 10000.0, 6) AS upper,
       round((mean4 - 2.0 * sd4) / 10000.0, 6) AS lower,
       CASE WHEN sd4 > 0.0
            THEN round((CAST(x4 AS DOUBLE) - (mean4 - 2.0 * sd4))
                       / ((mean4 + 2.0 * sd4) - (mean4 - 2.0 * sd4)), 6)
       END AS pct_b
FROM m
"""


@register("q_bollinger_bands", oracle=_BOLL_ORACLE)
def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir)
    win = W.orderBy("i").rowsBetween(-19, 0)
    w = daily.select(
        "i", "day", "x4",
        F.count(F.lit(1)).over(win).cast("bigint").alias("n"),
        F.sum("x4").over(win).cast("bigint").alias("s"),
        F.collect_list("x4").over(win).alias("xs"))
    mean4 = F.col("s").cast("double") / F.col("n").cast("double")
    sd4 = F.sqrt(
        F.aggregate(
            F.transform(F.array_sort(F.col("xs")),
                        lambda v: (v.cast("double") - mean4)
                        * (v.cast("double") - mean4)),
            F.lit(0.0), lambda acc, v: acc + v) / F.col("n").cast("double"))
    m = w.select("day", "n", "x4", mean4.alias("mean4"), sd4.alias("sd4"))
    up4 = F.col("mean4") + F.lit(2.0) * F.col("sd4")
    lo4 = F.col("mean4") - F.lit(2.0) * F.col("sd4")
    return m.select(
        "day", "n", (F.col("x4") / F.lit(10000.0)).alias("x"),
        F.round(F.col("mean4") / 10000.0, 6).alias("mean"),
        F.round(F.col("sd4") / 10000.0, 6).alias("sd"),
        F.round(up4 / 10000.0, 6).alias("upper"),
        F.round(lo4 / 10000.0, 6).alias("lower"),
        F.when(F.col("sd4") > 0.0,
               F.round((F.col("x4").cast("double") - lo4) / (up4 - lo4), 6))
        .alias("pct_b"))


# ---------------------------------------------------------------------------
# q_drawdown — running peak and drawdown-from-peak of the cumulative
# daily event-value series (the "how far below the high-water mark"
# monitor). Cumulative sums accumulate in DECIMAL(38,0)/HUGEINT so the
# running total never wraps (the q_gini_coefficient overflow lesson),
# and surface as bigint/1e4 doubles — exact while the grand total is
# under ~9.2e14 currency units.
# ---------------------------------------------------------------------------
_DRAWDOWN_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
c0 AS (
  SELECT i, day,
         sum(CAST(x4 AS HUGEINT)) OVER (ORDER BY i) AS cum4
  FROM daily
),
c AS (
  SELECT i, day, cum4,
         max(cum4) OVER (ORDER BY i) AS peak4
  FROM c0
)
SELECT day,
       CAST(cum4 AS BIGINT) / 10000.0 AS cum_value,
       CAST(peak4 AS BIGINT) / 10000.0 AS peak_value,
       CAST(peak4 - cum4 AS BIGINT) / 10000.0 AS drawdown,
       CASE WHEN CAST(peak4 AS BIGINT) > 0
            THEN round(CAST(CAST(peak4 - cum4 AS BIGINT) AS DOUBLE)
                       / CAST(CAST(peak4 AS BIGINT) AS DOUBLE), 6)
       END AS drawdown_pct
FROM c
"""


@register("q_drawdown", oracle=_DRAWDOWN_ORACLE)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir)
    wc = W.orderBy("i").rowsBetween(W.unboundedPreceding, 0)
    c = daily.select(
        "i", "day",
        F.sum(F.col("x4").cast("decimal(38,0)")).over(wc).alias("cum4"))
    c = c.select(
        "day", "cum4", F.max("cum4").over(wc).alias("peak4"))
    cum_b = F.col("cum4").cast("bigint")
    peak_b = F.col("peak4").cast("bigint")
    dd_b = (F.col("peak4") - F.col("cum4")).cast("bigint")
    return c.select(
        "day",
        (cum_b / F.lit(10000.0)).alias("cum_value"),
        (peak_b / F.lit(10000.0)).alias("peak_value"),
        (dd_b / F.lit(10000.0)).alias("drawdown"),
        F.when(peak_b > 0,
               F.round(dd_b.cast("double") / peak_b.cast("double"), 6))
        .alias("drawdown_pct"))


# ---------------------------------------------------------------------------
# q_rsi — 14-day relative strength index of the daily event-value
# series (cutler's SMA variant: sums of gains vs losses over the
# trailing window — the recursive Wilder EWMA is deliberately avoided
# so the statistic stays an exact windowed integer sum on both
# engines). RSI = 100·gains/(gains+losses); flat windows → NULL.
# ---------------------------------------------------------------------------
_RSI_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
d AS (
  SELECT i, day,
         x4 - lag(x4) OVER (ORDER BY i) AS diff
  FROM daily
),
g AS (
  SELECT i, day,
         greatest(diff, 0) AS gain,
         greatest(-diff, 0) AS loss
  FROM d WHERE diff IS NOT NULL
),
w AS (
  SELECT day,
         CAST(count(*) OVER win AS BIGINT) AS n_diffs,
         CAST(sum(gain) OVER win AS BIGINT) AS gains,
         CAST(sum(loss) OVER win AS BIGINT) AS losses
  FROM g
  WINDOW win AS (ORDER BY i ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT day, n_diffs,
       gains / 10000.0 AS gain_sum,
       losses / 10000.0 AS loss_sum,
       CASE WHEN gains + losses > 0
            THEN round(100.0 * CAST(gains AS DOUBLE)
                       / (CAST(gains AS DOUBLE) + CAST(losses AS DOUBLE)), 6)
       END AS rsi
FROM w
"""


@register("q_rsi", oracle=_RSI_ORACLE)
def q_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_value(spark, sf_dir)
    wl = W.orderBy("i")
    d = daily.select(
        "i", "day", (F.col("x4") - F.lag("x4").over(wl)).alias("diff"))
    g = d.filter(F.col("diff").isNotNull()).select(
        "i", "day",
        F.greatest(F.col("diff"), F.lit(0)).alias("gain"),
        F.greatest(-F.col("diff"), F.lit(0)).alias("loss"))
    win = W.orderBy("i").rowsBetween(-13, 0)
    w = g.select(
        "day",
        F.count(F.lit(1)).over(win).cast("bigint").alias("n_diffs"),
        F.sum("gain").over(win).cast("bigint").alias("gains"),
        F.sum("loss").over(win).cast("bigint").alias("losses"))
    gd, ld = F.col("gains").cast("double"), F.col("losses").cast("double")
    return w.select(
        "day", "n_diffs",
        (F.col("gains") / F.lit(10000.0)).alias("gain_sum"),
        (F.col("losses") / F.lit(10000.0)).alias("loss_sum"),
        F.when(F.col("gains") + F.col("losses") > 0,
               F.round(F.lit(100.0) * gd / (gd + ld), 6)).alias("rsi"))


# ---------------------------------------------------------------------------
# q_spearman_corr — Spearman rank correlation between daily event
# count and daily event value (do busier days move more money?).
# Ranks are row_number over (metric, day) — the deterministic
# tie-break both engines share — so Σd² is an exact integer and
# ρ = 1 − 6Σd²/(m(m²−1)) is one identical double tree. Integer-exact
# in double to ~2500 years of days.
# ---------------------------------------------------------------------------
_SPEARMAN_ORACLE = """
WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS i,
         CAST(count(*) AS BIGINT) AS n,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) * 10000
              AS BIGINT) AS v4
  FROM events GROUP BY 1
),
r AS (
  SELECT row_number() OVER (ORDER BY n, i) AS rn,
         row_number() OVER (ORDER BY v4, i) AS rv
  FROM daily
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum((rn - rv) * (rn - rv)) AS BIGINT) AS sum_d2
  FROM r
)
SELECT m, sum_d2,
       CASE WHEN m > 1
            THEN round(1.0 - 6.0 * CAST(sum_d2 AS DOUBLE)
                       / (CAST(m AS DOUBLE)
                          * (CAST(m AS DOUBLE) * CAST(m AS DOUBLE) - 1.0)), 6)
       END AS spearman_rho
FROM s
"""


@register("q_spearman_corr", oracle=_SPEARMAN_ORACLE)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_micros(F.date_trunc("day", "ts"))
                / F.lit(86400000000)).cast("bigint").alias("i"),
    ).agg(lcount("n"),
          (F.round(F.sum(F.col("value").cast("decimal(18,4)")), 4)
           * 10000).cast("bigint").alias("v4"))
    r = daily.select(
        F.row_number().over(W.orderBy("n", "i")).alias("rn"),
        F.row_number().over(W.orderBy("v4", "i")).alias("rv"))
    s = r.agg(
        lcount("m"),
        F.sum((F.col("rn") - F.col("rv")) * (F.col("rn") - F.col("rv")))
        .cast("bigint").alias("sum_d2"))
    m_d = F.col("m").cast("double")
    return s.select(
        "m", "sum_d2",
        F.when(F.col("m") > 1,
               F.round(F.lit(1.0) - F.lit(6.0) * F.col("sum_d2").cast("double")
                       / (m_d * (m_d * m_d - F.lit(1.0))), 6))
        .alias("spearman_rho"))

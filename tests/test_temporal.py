"""As-of and range join: strictness, tie-breaks, bucket boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from sanctions_data_pipeline_spark.operators.temporal import (
    asof_join, range_join_count,
)


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts_s")).drop("ts_s")


def test_asof_strict_excludes_simultaneous(spark):
    left = _ts(spark, [(1, "2024-01-01 10:00:00", 100)],
               "user_id long, ts_s string, event_id long")
    right = _ts(spark, [(1, "2024-01-01 10:00:00", 7, 5.0),
                        (1, "2024-01-01 09:00:00", 3, 2.0)],
                "user_id long, ts_s string, p_event_id long, p_value double")
    strict = asof_join(left, right, "user_id", "ts",
                       ["p_event_id", "p_value"], strict=True).collect()[0]
    assert strict["asof_p_event_id"] == 3  # 10:00 purchase invisible
    loose = asof_join(left, right, "user_id", "ts",
                      ["p_event_id", "p_value"], strict=False).collect()[0]
    assert loose["asof_p_event_id"] == 7


def test_asof_tie_on_right_resolves_to_max_order_cols(spark):
    left = _ts(spark, [(1, "2024-01-01 10:00:00", 100)],
               "user_id long, ts_s string, event_id long")
    right = _ts(spark, [(1, "2024-01-01 09:00:00", 3, 2.0),
                        (1, "2024-01-01 09:00:00", 9, 1.0)],
                "user_id long, ts_s string, p_event_id long, p_value double")
    got = asof_join(left, right, "user_id", "ts",
                    ["p_event_id", "p_value"]).collect()[0]
    assert got["asof_p_event_id"] == 9


def test_asof_no_prior_row_gives_null(spark):
    left = _ts(spark, [(1, "2024-01-01 08:00:00", 100),
                       (2, "2024-01-01 12:00:00", 200)],
               "user_id long, ts_s string, event_id long")
    right = _ts(spark, [(1, "2024-01-01 09:00:00", 3, 2.0)],
                "user_id long, ts_s string, p_event_id long, p_value double")
    got = {r["event_id"]: r["asof_p_event_id"]
           for r in asof_join(left, right, "user_id", "ts",
                              ["p_event_id", "p_value"]).collect()}
    assert got == {100: None, 200: None}


def test_range_join_boundaries_and_dedup(spark):
    """Window is (ts-5min, ts]: exact -5min excluded, exact ts included;
    probe-bucket duplication must not double count."""
    left = _ts(spark, [(1, "2024-01-01 10:05:00")],
               "event_id long, ts_s string")
    right = _ts(spark, [("2024-01-01 10:00:00",),   # exactly -5min: OUT
                        ("2024-01-01 10:00:01",),   # in
                        ("2024-01-01 10:05:00",),   # exactly ts: IN
                        ("2024-01-01 10:05:01",)],  # after: OUT
                "ts_s string")
    got = range_join_count(left, right, "ts", 300_000_000).collect()[0]
    assert got["n_in_range"] == 2


def test_range_join_zero_matches_kept(spark):
    left = _ts(spark, [(1, "2024-01-01 00:00:00")],
               "event_id long, ts_s string")
    right = _ts(spark, [("2024-06-01 00:00:00",)], "ts_s string")
    got = range_join_count(left, right, "ts", 300_000_000).collect()
    assert len(got) == 1 and got[0]["n_in_range"] == 0

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


def _runq(spark, sf_dir, name):
    from sanctions_data_pipeline_spark.plans import registry
    return registry.queries()[name](spark, sf_dir)


def test_scd2_intervals_chain_per_customer(spark, sf_dir):
    rows = _runq(spark, sf_dir, "q_scd2").collect()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for cust, rs in by_cust.items():
        rs = sorted(rs, key=lambda r: r.valid_from)
        # exactly one open (current) interval per customer
        assert sum(1 for r in rs if r.valid_to is None) == 1
        assert rs[-1].valid_to is None
        # consecutive intervals never share a status (they were collapsed)
        for a, b in zip(rs, rs[1:]):
            assert a.status != b.status or a.valid_from != b.valid_from


def test_funnel_is_monotone(spark, sf_dir):
    row = _runq(spark, sf_dir, "q_funnel").collect()[0]
    assert row.n_viewed >= row.n_clicked >= row.n_purchased
    assert row.n_purchased >= 0


def test_retention_week0_covers_all_cohort_users(spark, sf_dir):
    rows = _runq(spark, sf_dir, "q_retention").collect()
    from sanctions_data_pipeline_spark.catalog import load_table
    n_users = (load_table(spark, sf_dir, "events")
               .select("user_id").distinct().count())
    # every user is active in their own week 0
    week0 = sum(r.n_active for r in rows if r.week_offset == 0)
    assert week0 == n_users
    assert all(r.week_offset >= 0 for r in rows)


def test_rollup_reuse_equals_raw_daily_agg(spark, sf_dir):
    from sanctions_data_pipeline_spark.catalog import load_table
    from sanctions_data_pipeline_spark.plans.helpers import _as_exact_double
    rows = {(r.day, r.event_type): (r.n_events, r.total_value)
            for r in _runq(spark, sf_dir, "q_rollup_reuse").collect()}
    ev = load_table(spark, sf_dir, "events")
    raw = {(r.day, r.event_type): (r.n_events, r.total_value)
           for r in ev.groupBy(
               F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
               "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                _as_exact_double(
                    F.sum(F.col("value").cast("decimal(18,4)")))
                .alias("total_value")).collect()}
    assert rows == raw  # re-aggregation from the rollup is lossless


def test_cogroup_asof_equals_window_asof(spark, sf_dir):
    """Two independent implementations (cogrouped pandas merge_asof vs
    union-merge window) must agree row-for-row."""
    win = {(r.event_id): (r.asof_p_event_id, r.asof_p_value)
           for r in _runq(spark, sf_dir, "q_asof_join").collect()}
    cg = {(r.event_id): (r.asof_p_event_id, r.asof_p_value)
          for r in _runq(spark, sf_dir, "cg_asof_pandas").collect()}
    assert cg == win


def test_range_frame_counts_trailing_hour_only(spark, sf_dir):
    from sanctions_data_pipeline_spark.plans import registry
    rows = registry.queries()["q_range_frame"](spark, sf_dir).collect()
    assert rows
    # every event counts at least itself
    assert all(r.n_events_1h >= 1 for r in rows)
    # independently recompute one user's frame counts in python
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    uid, evs = max(by_user.items(), key=lambda kv: len(kv[1]))
    evs = sorted(evs, key=lambda r: r.ts_us)
    hour = 3_600_000_000
    for r in evs:
        expect = sum(1 for o in evs if r.ts_us - hour <= o.ts_us <= r.ts_us)
        assert r.n_events_1h == expect


def test_asof_forward_is_strictly_later_and_earliest(spark, sf_dir):
    from sanctions_data_pipeline_spark.catalog import load_table
    from sanctions_data_pipeline_spark.plans import registry
    from pyspark.sql import functions as F

    rows = registry.queries()["q_asof_forward"](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    purchases = {}
    for r in (ev.filter(F.col("event_type") == "purchase")
              .select("user_id", F.unix_micros("ts").alias("ts_us"),
                      "event_id").collect()):
        purchases.setdefault(r.user_id, []).append((r.ts_us, r.event_id))
    matched = 0
    for r in rows:
        later = sorted(t for t in purchases.get(r.user_id, [])
                       if t[0] > r.ts_us)
        if r.next_p_event_id is None:
            assert not later
        else:
            matched += 1
            # earliest strictly-later purchase (event_id tie-break)
            assert later[0][1] == r.next_p_event_id
    assert matched > 0

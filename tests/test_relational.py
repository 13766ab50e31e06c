"""Sanity tests for the relational suite at sf0.001 (correctness vs the
DuckDB oracle is covered by tools/check_oracle.py and the driver gate;
these check shapes, invariants, and a few hand-verifiable facts)."""

from __future__ import annotations

from sanctions_data_pipeline_spark.plans import registry


def _run(spark, sf_dir, name):
    return registry.queries()[name](spark, sf_dir)


def test_registry_has_all_relational_queries():
    names = set(registry.queries())
    expected = {
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
        "q6_forecast_revenue", "q_top_customers_window", "q_priority_pivot",
        "q_rollup_sales", "q_semi_anti", "q_distinct_union",
        "q_events_bucketed", "q_sessionize",
    }
    assert expected <= names


def test_q1_shape_and_invariants(spark, sf_dir):
    rows = _run(spark, sf_dir, "q1_pricing_summary").collect()
    assert 1 <= len(rows) <= 6  # at most |returnflag|x|linestatus|
    for r in rows:
        assert r.sum_charge >= r.sum_disc_price  # tax >= 0
        assert r.sum_base_price >= r.sum_disc_price  # discount >= 0
        assert r.count_order > 0


def test_q3_topk_sorted(spark, sf_dir):
    rows = _run(spark, sf_dir, "q3_shipping_priority").collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_window_topk_bounded_per_group(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_top_customers_window").collect()
    per_nation: dict[str, list] = {}
    for r in rows:
        per_nation.setdefault(r.n_name, []).append(r)
    for name, grp in per_nation.items():
        assert len(grp) <= 3
        bals = [g.c_acctbal for g in grp]
        assert bals == sorted(bals, reverse=True)


def test_semi_anti_partition_customers(spark, sf_dir):
    from sanctions_data_pipeline_spark.catalog import load_table
    rows = _run(spark, sf_dir, "q_semi_anti").collect()
    total = sum(r.n_with_orders + r.n_without_orders for r in rows)
    assert total == load_table(spark, sf_dir, "customer").count()


def test_sessionize_invariants(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_sessionize").collect()
    assert rows
    for r in rows[:200]:
        assert r.session_end_us >= r.session_start_us
        assert r.n_events >= 1


def test_entry_contract(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() >= 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)


def test_cube_lattice_complete(spark, sf_dir):
    from sanctions_data_pipeline_spark.plans.registry import REGISTRY

    rows = REGISTRY["q_cube_sales"].build(spark, sf_dir).collect()
    combos = {(r["o_orderpriority"] is None, r["o_orderstatus"] is None)
              for r in rows}
    assert combos == {(False, False), (False, True), (True, False), (True, True)}
    [total] = [r for r in rows
               if r["o_orderpriority"] is None and r["o_orderstatus"] is None]
    import sanctions_data_pipeline_spark.catalog as cat
    assert total["n_orders"] == cat.load_table(spark, sf_dir, "orders").count()


def test_approx_sketch_within_tolerance(spark, sf_dir):
    from pyspark.sql import functions as F
    from sanctions_data_pipeline_spark.plans.registry import REGISTRY
    import sanctions_data_pipeline_spark.catalog as cat

    from sanctions_data_pipeline_spark.plans import registry

    got = {r["event_type"]: r
           for r in registry.queries()["q_approx_sketch"](spark, sf_dir)
           .collect()}
    ev = cat.load_table(spark, sf_dir, "events")
    exact = {r["event_type"]: r for r in
             ev.groupBy("event_type").agg(
                 F.countDistinct("user_id").alias("u"),
                 F.approx_count_distinct("user_id", rsd=0.01).alias("apx"),
                 F.expr("percentile(value, 0.5)").alias("med"),
                 F.percentile_approx("value", 0.5, 10000).alias("amed"))
             .collect()}
    for et, e in exact.items():
        g = got[et]
        # the in-query invariants hold (these ARE the driver-hashed cols)
        assert g["exact_users"] == e["u"]
        assert g["users_within_rsd"] and g["median_in_band"]
        # and the raw estimates themselves stay within tolerance
        assert abs(e["apx"] - e["u"]) <= max(2, 0.05 * e["u"])
        assert abs(e["amed"] - e["med"]) <= 0.1 * max(1.0, abs(e["med"]))


def test_catalog_reads_events_ts_as_session_timestamp(spark, sf_dir):
    """Guard against testdata regeneration flipping events.ts to
    TIMESTAMP_NTZ (micros, no tz flag) or nanos-as-long: the catalog
    must always surface a session-tz timestamp, or every unix_micros/
    watermark consumer breaks."""
    from sanctions_data_pipeline_spark.catalog import load_table
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # and unix_micros works (the operation NTZ rejects)
    from pyspark.sql import functions as F
    assert df.select(F.unix_micros("ts")).first()[0] is not None

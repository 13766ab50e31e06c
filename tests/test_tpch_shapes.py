"""Semantic pins for the second TPC-H-shape batch (sf0.001).
Cross-engine value equality is covered by tools/check_oracle.py and the
driver gate; these pin invariants the oracle compare can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.plans import registry


def _run(spark, sf_dir, name):
    return registry.queries()[name](spark, sf_dir)


def test_q4_semi_join_never_exceeds_order_count(spark, sf_dir):
    rows = _run(spark, sf_dir, "q4_order_priority").collect()
    orders = load_table(spark, sf_dir, "orders")
    in_window = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))).count()
    assert sum(r.order_count for r in rows) <= in_window
    assert all(r.order_count > 0 for r in rows)
    # semi join must not fan out: priorities are distinct
    names = [r.o_orderpriority for r in rows]
    assert len(names) == len(set(names))


def test_q7_bidirectional_nation_pair(spark, sf_dir):
    rows = _run(spark, sf_dir, "q7_volume_shipping").collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert pairs <= {("NATION_3", "NATION_8"), ("NATION_8", "NATION_3")}
    assert pairs, "nation pair empty at this scale factor"
    assert all(r.revenue > 0 for r in rows)


def test_q8_share_bounded_and_no_nation_filter_loss(spark, sf_dir):
    rows = _run(spark, sf_dir, "q8_market_share").collect()
    assert rows, "market-share query returned no years"
    assert all(0.0 <= r.mkt_share <= 1.0 for r in rows)


def test_q10_topk_is_deterministic_and_sorted(spark, sf_dir):
    rows = _run(spark, sf_dir, "q10_returned_items").collect()
    assert len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    again = _run(spark, sf_dir, "q10_returned_items").collect()
    assert [(r.c_custkey, r.revenue) for r in rows] == \
        [(r.c_custkey, r.revenue) for r in again]


def test_q14_percentage_bounds(spark, sf_dir):
    row = _run(spark, sf_dir, "q14_promo_revenue").collect()[0]
    assert 0.0 <= row.promo_revenue <= 100.0


def test_q18_threshold_respected(spark, sf_dir):
    rows = _run(spark, sf_dir, "q18_large_orders").collect()
    assert all(r.sum_qty > 200 for r in rows)
    # one output row per qualifying order
    keys = [r.o_orderkey for r in rows]
    assert len(keys) == len(set(keys))


def test_q18_probe_aggregates_before_join(spark, sf_dir):
    # the lineitem aggregate must sit BELOW the joins in the physical
    # plan, so the joins move orders-sized, not lineitem-sized, data
    df = _run(spark, sf_dir, "q18_large_orders")
    plan = df._jdf.queryExecution().executedPlan().toString()
    agg_pos = plan.find("HashAggregate(keys=[l_orderkey")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1
    # tree prints parents first: the agg must be a DESCENDANT of the join
    assert join_pos < agg_pos
    assert "partial_sum(cast(l_quantity" in plan  # map-side combine


def test_q22_threshold_and_anti_join(spark, sf_dir):
    rows = _run(spark, sf_dir, "q22_idle_customers").collect()
    cust = load_table(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(F.avg("c_acctbal")).collect()[0][0]
    # every contributing customer is above the positive average, so each
    # segment's mean balance must exceed the global positive average
    for r in rows:
        assert r.numcust > 0
        assert r.totacctbal / r.numcust > avg_bal


def test_q15_all_rows_share_the_max(spark, sf_dir):
    rows = _run(spark, sf_dir, "q15_top_supplier").collect()
    assert rows
    assert len({r.total_revenue for r in rows}) == 1


def test_window_navigation_invariants(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_window_navigation").collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.segment, []).append(r)
    for seg, rs in by_seg.items():
        assert {r.quartile for r in rs} <= {1, 2, 3, 4}
        assert all(0.0 <= r.pct_rank <= 1.0 for r in rs)
        assert all(0.0 < r.cume <= 1.0 for r in rs)
        # exactly one row per segment has no successor
        assert sum(1 for r in rs if r.next_cust is None) == 1
        # quartiles are balanced to within one row
        sizes = [sum(1 for r in rs if r.quartile == q) for q in (1, 2, 3, 4)]
        assert max(sizes) - min(sizes) <= 1


def test_repetition_fracs_bounded(spark, sf_dir):
    rows = _run(spark, sf_dir, "tx_repetition").collect()
    assert rows
    for r in rows:
        assert 0.0 < r.top_token_frac <= 1.0
        assert 0.0 <= r.dup_bigram_frac <= 1.0


def test_mix_temperature_upweights_small_sources(spark, sf_dir):
    rows = _run(spark, sf_dir, "mix_temperature").collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-9
    # sqrt scaling: weight per doc decreases as source size increases
    rows = sorted(rows, key=lambda r: r.n_docs)
    per_doc = [r.mix_weight / r.n_docs for r in rows]
    assert all(a >= b - 1e-12 for a, b in zip(per_doc, per_doc[1:]))


def test_multi_distinct_plans_expand_not_multiple_jobs(spark, sf_dir):
    df = _run(spark, sf_dir, "q_multi_distinct")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan  # one shuffle via row replication
    rows = {r.l_returnflag: r for r in df.collect()}
    for r in rows.values():
        assert r.n_supp <= r.n_rows and r.n_orders <= r.n_rows


def test_nullsafe_join_matches_null_keys_and_stays_hashed(spark, sf_dir):
    df = _run(spark, sf_dir, "q_nullsafe_join")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # <=> is a hashable key
    rows = {r.status_name: r.n_orders for r in df.collect()}
    assert rows.get("pending", 0) > 0  # NULL keys matched NULL
    from sanctions_data_pipeline_spark.catalog import load_table
    orders = load_table(spark, sf_dir, "orders")
    assert sum(rows.values()) == orders.count()  # partition of all rows


def test_pivot_native_partitions_counts(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_pivot_native").collect()
    from sanctions_data_pipeline_spark.catalog import load_table
    orders = load_table(spark, sf_dir, "orders")
    total = sum(r.n_open + r.n_finished + r.n_pending for r in rows)
    assert total == orders.count()
    assert all(r.n_open >= 0 for r in rows)


def test_try_arith_absorbs_bad_casts(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_try_arith").collect()
    for r in rows:
        assert r.n_name_casts == 0          # full names never cast
        assert r.n_suffix_casts >= 0        # digit suffixes may
        assert r.n_div_nulls >= 0           # floor()==0 rows absorbed


# ------------------------- third batch (tpch_shapes2) -------------------------

def test_q2_min_cost_is_group_minimum(spark, sf_dir):
    rows = _run(spark, sf_dir, "q2_min_cost_supplier").collect()
    assert rows, "no min-cost suppliers found"
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, set()).add(r.supp_cost)
    # all winners for one part share the SAME (minimal) cost
    assert all(len(costs) == 1 for costs in by_part.values())


def test_q2_window_reuses_agg_shuffle(spark, sf_dir):
    df = _run(spark, sf_dir, "q2_min_cost_supplier")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    assert "Window" in plan and "HashAggregate" in plan
    # the pre-partition on l_partkey must serve the aggregate AND the
    # window: exactly ONE hash-partition exchange in the whole plan
    n_hash_exchanges = sum(1 for line in plan.splitlines()
                           if "Exchange hashpartitioning" in line)
    assert n_hash_exchanges == 1, plan


def test_q9_profit_covers_only_widget_parts(spark, sf_dir):
    rows = _run(spark, sf_dir, "q9_product_profit").collect()
    assert rows
    years = {r.o_year for r in rows}
    assert all(1990 < y < 2010 for y in years)


def test_q11_threshold_cuts_below_average_parts(spark, sf_dir):
    rows = _run(spark, sf_dir, "q11_important_parts").collect()
    assert rows, "q11 selected nothing at this scale factor"
    vals = [r.part_value for r in rows]
    # every selected part beats the overall average by construction
    assert min(vals) > 0


def test_q12_priority_classes_partition_lines(spark, sf_dir):
    rows = _run(spark, sf_dir, "q12_late_lines").collect()
    assert rows
    for r in rows:
        assert r.high_line_count >= 0 and r.low_line_count >= 0
        assert r.high_line_count + r.low_line_count > 0


def test_q16_excluded_suppliers_absent(spark, sf_dir):
    from sanctions_data_pipeline_spark.catalog import load_table
    sup_total = load_table(spark, sf_dir, "supplier").count()
    rows = _run(spark, sf_dir, "q16_supplier_cnt").collect()
    assert rows
    # counts can never exceed the non-excluded supplier population
    excluded = (load_table(spark, sf_dir, "supplier")
                .filter(F.col("s_name").like("%9")).count())
    assert all(r.supplier_cnt <= sup_total - excluded for r in rows)


def test_q20_share_threshold_selects_strict_subset(spark, sf_dir):
    from sanctions_data_pipeline_spark.catalog import load_table
    rows = _run(spark, sf_dir, "q20_top_share_suppliers").collect()
    assert rows, "q20 selected nothing at this scale factor"
    keys = [r.s_suppkey for r in rows]
    assert len(keys) == len(set(keys))  # semi join must not fan out
    assert len(keys) < load_table(spark, sf_dir, "supplier").count()


def test_null_skew_bypass_keeps_nulls_out_of_the_join(spark, sf_dir):
    from sanctions_data_pipeline_spark.catalog import load_table
    rows = {r.status_name: r for r in
            _run(spark, sf_dir, "q_null_skew_outer").collect()}
    orders = load_table(spark, sf_dir, "orders")
    # the NULL bucket is exactly the 'O' majority and bypassed the join
    assert rows[None].n_orders == orders.filter("o_orderstatus = 'O'").count()
    assert sum(r.n_orders for r in rows.values()) == orders.count()

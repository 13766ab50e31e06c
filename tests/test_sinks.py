"""Sink coverage: partitioned parquet round-trip and bucketed tables
whose co-bucketed join runs WITHOUT a shuffle exchange."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from tests.test_plans import plan_of
from sanctions_data_pipeline_spark.sources.sinks import write_bucketed, write_output


def test_partitioned_parquet_roundtrip_prunes(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    out = tempfile.mkdtemp(prefix="sink_part_")
    try:
        write_output(cust, out, partition_by=["c_mktsegment"])
        back = spark.read.parquet(out)
        assert back.count() == cust.count()
        # partition pruning: reading one segment must scan only its dir
        one = back.filter(F.col("c_mktsegment") == "BUILDING")
        plan = plan_of(one)
        assert one.count() == cust.filter(F.col("c_mktsegment") == "BUILDING").count()
        assert "PartitionFilters: [isnotnull(c_mktsegment" in plan
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_bucketed_join_no_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    try:
        write_bucketed(orders.select("o_orderkey", "o_orderdate"),
                       "t_orders_b", ["o_orderkey"], n_buckets=8)
        write_bucketed(li.select("l_orderkey", "l_quantity"),
                       "t_lineitem_b", ["l_orderkey"], n_buckets=8)
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        # disable broadcast so the test exercises the sort-merge path
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = plan_of(joined)
            assert "Exchange" not in plan, plan
            assert joined.count() == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")

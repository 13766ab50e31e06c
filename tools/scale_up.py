"""Materialize a K-times-wider bench tier from an existing sf dir.

Usage: python tools/scale_up.py /root/testdata/sf0.1 /tmp/sf0.1x3 3
Then:  SPARK_GRAFT_SF_DIR=/tmp/sf0.1x3 python bench.py

This is a MEASUREMENT harness, not synthetic test data: every copy k
is the driver-generated tables verbatim with primary/foreign keys
shifted by k * stride (ONE global power of ten above the max key in
any table, so cross-table joins stay consistent within each copy), so referential integrity, skew shape, duplicate structure, and
value distributions are preserved exactly while row counts scale K×.
Oracle correctness still runs on the pristine sf dirs only.

Key columns shifted per table (all others copied as-is):
  region/nation: none (dimension tables stay identical — their copies
    would collide on PK; queries join them, so keep one copy)
  customer: c_custkey, c_nationkey->unchanged
  supplier: s_suppkey
  part: p_partkey
  orders: o_orderkey, o_custkey
  lineitem: l_orderkey, l_partkey, l_suppkey
  events: event_id, user_id
  documents: doc_id
  embeddings: vec_id
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sanctions_data_pipeline_spark.catalog import load_table  # noqa: E402
from sanctions_data_pipeline_spark.session import get_spark  # noqa: E402

SHIFT_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _global_stride(spark, src: str) -> int:
    """ONE stride shared by every shifted key column across all tables.

    A per-table stride breaks referential integrity: orders' stride
    (derived from o_orderkey magnitude) would shift o_custkey by a
    different amount than customer's c_custkey, so copy k's orders
    would join no customer. One global power of ten above the maximum
    key anywhere keeps each copy a self-contained consistent universe
    (dims region/nation stay shared — their keys are never shifted).
    """
    top = 0
    for table, cols in SHIFT_COLS.items():
        if not cols:
            continue
        df = load_table(spark, src, table)
        mx = df.agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
        top = max(top, max(int(v or 0) for v in mx))
    s = 1
    while s <= top:
        s *= 10
    return s


def scale_up(src: str, dst: str, k: int) -> None:
    spark = get_spark("scale_up")
    os.makedirs(dst, exist_ok=True)
    stride = _global_stride(spark, src)
    for table, cols in SHIFT_COLS.items():
        df = load_table(spark, src, table)
        if not cols or k == 1:
            out = df
        else:
            copies = [df] + [
                df.select(*[
                    (F.col(c) + F.lit(i * stride)).alias(c)
                    if c in cols else F.col(c)
                    for c in df.columns])
                for i in range(1, k)
            ]
            out = copies[0]
            for c in copies[1:]:
                out = out.unionAll(c)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))
        print(f"{table}: x{1 if not cols else k}")


if __name__ == "__main__":
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    scale_up(src, dst, k)

"""Materialize a HOT-LABEL adversarial variant of a bench tier.

Usage: python tools/make_skew_tier.py /tmp/sf0.1x10 /tmp/sf0.1x10skew
Then:  SPARK_GRAFT_SF_DIR=/tmp/sf0.1x10skew python bench.py \
           sim_maxsim emb_centroid_classify

The broadcast-scoring family (sim_maxsim, emb_centroid_classify)
shuffles on `label`; this harness rewrites the embeddings table so
~90% of the scorable corpus carries ONE label — the worst case for
that shuffle — while every other table is copied verbatim:

  - rows with vec_id < 200 keep their original label (sim_maxsim's
    bounded query-side contract reads label = 0 AND vec_id < 200 —
    the query set must stay constant under the skew, same idiom as
    tools/scale_up.py's fixed-query-set note);
  - rows with vec_id >= 200 move to label 1 when vec_id % 10 != 0
    (deterministic, ~90% hot), else keep their label.

A skew ratio is then (hot-tier runtime / flat-tier runtime) measured
the same way in the same session (BENCH_BASELINE.md round-11 skew
table).
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sanctions_data_pipeline_spark.catalog import load_table  # noqa: E402
from sanctions_data_pipeline_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents")


def make_skew(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        s = os.path.join(src, f"{t}.parquet")
        d = os.path.join(dst, f"{t}.parquet")
        if os.path.exists(d):
            shutil.rmtree(d) if os.path.isdir(d) else os.remove(d)
        (shutil.copytree if os.path.isdir(s) else shutil.copy2)(s, d)
    spark = get_spark("make_skew_tier")
    emb = load_table(spark, src, "embeddings")
    skewed = emb.withColumn(
        "label",
        F.when((F.col("vec_id") >= 200) & (F.col("vec_id") % 10 != 0),
               F.lit(1).cast(emb.schema["label"].dataType))
        .otherwise(F.col("label")))
    skewed.write.mode("overwrite").parquet(
        os.path.join(dst, "embeddings.parquet"))
    frac = (load_table(spark, dst, "embeddings")
            .agg((F.sum((F.col("label") == 1).cast("long"))
                  / F.count(F.lit(1))).alias("hot_frac")).collect()[0][0])
    print(f"hot-label fraction: {frac:.3f}")


if __name__ == "__main__":
    make_skew(sys.argv[1], sys.argv[2])

"""Multimodal suite (SURVEY.md §2): binary media columns decoded via
Arrow-batched mapInPandas.

mm_decode is rows-only: the fake codec's byte math has no DuckDB twin
(no byte-level blob explode); determinism and exact values are pinned
by ``tests/test_multimodal.py`` against a pure-Python recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.multimodal.ops import attach_media, decode_features
from sanctions_data_pipeline_spark.plans.registry import register


@register("mm_decode", headline=True)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = decode_features(attach_media(docs))
    return feats.select(
        "doc_id", "media_type", "n_bytes", "width", "height", "n_frames",
        F.round(F.element_at("features", 1), 6).alias("feat0"),
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6)
         .alias("feat_sum"),
    )

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


@register("mm_resize")
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing (rows-only): deterministic byte-resample
    kernel inside the real mapInPandas pipeline; emits sizes + a
    payload digest so the driver's rows-check pins determinism."""
    from sanctions_data_pipeline_spark.multimodal.ops import resize_images

    docs = load_table(spark, sf_dir, "documents")
    out = resize_images(attach_media(docs), 32, 8)
    return out.select("doc_id", "width", "height",
                      F.md5(F.col("media")).alias("payload_md5"))


@register("mm_frames")
def mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (rows-only): 1→many mapInPandas
    fan-out; emits per-doc sampled-frame counts + digest of the first
    frame."""
    from sanctions_data_pipeline_spark.multimodal.ops import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_media(docs), every_n=2)
    return (frames.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_frames_sampled"),
                 F.md5(F.min_by("frame", F.col("frame_idx"))).alias("first_frame_md5")))


@register("mm_audio_windows")
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing (rows-only): int16-PCM interpretation of the
    media payload framed into 256-sample windows at 128-sample hop,
    RMS + zero-crossing features per window — real vectorized DSP (no
    codec needed for raw PCM), pinned by an independent numpy
    recomputation in tests. Emits a per-doc rollup so the driver's
    rows-check is compact and deterministic."""
    from sanctions_data_pipeline_spark.multimodal.ops import window_audio

    docs = load_table(spark, sf_dir, "documents")
    wins = window_audio(attach_media(docs), frame_len=256, hop_len=128)
    return (wins.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_windows"),
                 F.round(F.max("rms"), 6).alias("max_rms"),
                 F.sum("zero_crossings").cast("bigint").alias("total_zc")))

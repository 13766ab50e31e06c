"""Schema-evolution reads: target-schema scans (missing -> typed null,
extra -> pruned, int32 -> widened), mergeSchema unions, and projection
alignment for loaded frames."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from sanctions_data_pipeline_spark.sources.evolution import (
    align_to_schema, read_aligned, read_merged,
)

TARGET = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("quality", T.IntegerType()),  # never written
])


@pytest.fixture()
def evolving_dataset(spark, tmp_path):
    """Two generations in one dataset dir: gen1 (id INT, name) and
    gen2 (id LONG, name, score, extra) — added column, widened id,
    extra column the pipeline doesn't know."""
    base = str(tmp_path / "ds")
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string") \
        .write.parquet(base + "/gen=1")
    spark.createDataFrame([(3, "c", 0.5, "x")],
                          "id long, name string, score double, extra string") \
        .write.parquet(base + "/gen=2")
    return base


def test_plain_read_would_lose_columns(spark, evolving_dataset):
    """The failure mode the helpers exist for: a non-merged read can
    sample the old footer and silently drop new columns."""
    plain = spark.read.parquet(evolving_dataset + "/gen=1")
    assert "score" not in plain.columns


def test_merge_schema_refuses_widened_types(spark, evolving_dataset):
    """mergeSchema unions columns but raises on int-vs-bigint — the
    documented reason read_aligned exists."""
    with pytest.raises(Exception, match="MERGE"):
        read_merged(spark, evolving_dataset).collect()


def test_merged_read_unions_same_typed_generations(spark, tmp_path):
    base = str(tmp_path / "ok")
    spark.createDataFrame([(1, "a")], "id long, name string") \
        .write.parquet(base + "/gen=1")
    spark.createDataFrame([(2, "b", 0.5)], "id long, name string, score double") \
        .write.parquet(base + "/gen=2")
    df = read_merged(spark, base)
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None and rows[2].score == 0.5


def test_aligned_read_conforms_at_the_scan(spark, evolving_dataset):
    df = read_aligned(spark, evolving_dataset, TARGET)
    # partition-discovery columns (gen=N dirs) append AFTER the target
    assert df.columns == ["id", "name", "score", "quality", "gen"]
    assert dict(df.dtypes) == {"id": "bigint", "name": "string",
                               "score": "double", "quality": "int",
                               "gen": "int"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].quality is None and rows[1].score is None  # old gen
    assert rows[3].score == 0.5                               # new gen
    assert not hasattr(rows[3], "extra")                      # pruned
    # the scan's ReadSchema IS the target — column pruning holds
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "extra" not in plan


def test_align_is_projection_only(spark):
    """No exchange in the aligned plan — pure narrow projection."""
    df = spark.createDataFrame([(1, "a", "junk")],
                               "id int, name string, extra string")
    target = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("missing", T.StringType())])
    out = align_to_schema(df, target)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    [r] = out.collect()
    assert r.id == 1 and r.missing is None
    assert out.columns == ["id", "missing"]

"""Vector similarity operators over embedding columns (array<float>).

Cosine arithmetic is done in double with strictly sequential folds
(F.aggregate / zip_with), matching DuckDB's list_inner_product order —
results are bit-identical across engines, so oracle checks compare
rounded values exactly.

Scale: brute-force top-k broadcasts the (small) query set and computes
map-side per-partition top-k before the final per-query merge; the LSH
variant buckets the corpus by sign-projection so each query probes one
bucket instead of the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (== DuckDB list_inner_product)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_pairs(vecs: DataFrame, block_cols: list[str], threshold: float,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup: pairs within a blocking group with
    cosine >= threshold. Output (i, j, cos)."""
    v = vecs.select(*block_cols, F.col(id_col).alias("i"),
                    as_double(F.col(vec_col)).alias("va"))
    w = vecs.select(*block_cols, F.col(id_col).alias("j"),
                    as_double(F.col(vec_col)).alias("vb"))
    return (
        v.join(w, on=block_cols)
        .filter(F.col("i") < F.col("j"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("i", "j", "cos")
    )


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus,
    rank per query (ties broken by corpus id). Output
    (query_id, neighbor_id, cos, rnk)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       as_double(F.col(vec_col)).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      as_double(F.col(vec_col)).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def sign_lsh_key(vec: Column, n_bits: int = 8) -> Column:
    """Sign-projection LSH bucket: bit i = sign of component i.
    Deterministic and engine-portable (no random hyperplanes — at scale
    substitute seeded projections shipped as a broadcast matrix)."""
    pow2 = F.array(*[F.lit(1 << b) for b in range(n_bits)])
    return F.aggregate(
        F.zip_with(
            F.slice(vec, 1, n_bits),
            F.sequence(F.lit(1), F.lit(n_bits)),
            lambda x, i: F.when(x >= 0, F.element_at(pow2, i)).otherwise(F.lit(0))),
        F.lit(0), lambda acc, x: acc + x)


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int, n_bits: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: queries probe only their own sign-LSH bucket.
    Output (query_id, neighbor_id, cos, rnk)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       as_double(F.col(vec_col)).alias("qv"),
                       sign_lsh_key(as_double(F.col(vec_col)), n_bits).alias("bucket"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      as_double(F.col(vec_col)).alias("cv"),
                      sign_lsh_key(as_double(F.col(vec_col)), n_bits).alias("bucket"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )

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


def _with_norm(df: DataFrame, vec: str, norm: str) -> DataFrame:
    """Materialize sqrt(dot(v,v)) once per row. Join-side cosines then
    cost ONE fold per pair instead of three; the arithmetic (sequential
    fold + same sqrt) is bit-identical to computing the norms inline,
    so oracle value-hashes are unaffected."""
    return df.withColumn(norm, F.sqrt(dot(F.col(vec), F.col(vec))))


def cosine_pairs(vecs: DataFrame, block_cols: list[str], threshold: float,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup: pairs within a blocking group with
    cosine >= threshold. Output (i, j, cos).

    The quadratic term is bounded by the block size by construction; at
    corpus scale compose the block key with an LSH/IVF cell (see
    sign_lsh_key / assign_cells) to cap it."""
    v = _with_norm(vecs.select(*block_cols, F.col(id_col).alias("i"),
                               as_double(F.col(vec_col)).alias("va")),
                   "va", "na")
    w = _with_norm(vecs.select(*block_cols, F.col(id_col).alias("j"),
                               as_double(F.col(vec_col)).alias("vb")),
                   "vb", "nb")
    return (
        v.join(w, on=block_cols)
        .filter(F.col("i") < F.col("j"))
        .withColumn("cos", F.round(
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("i", "j", "cos")
    )


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus,
    rank per query (ties broken by corpus id). Output
    (query_id, neighbor_id, cos, rnk)."""
    q = _with_norm(queries.select(F.col(id_col).alias("query_id"),
                                  as_double(F.col(vec_col)).alias("qv")),
                   "qv", "qn")
    c = _with_norm(corpus.select(F.col(id_col).alias("neighbor_id"),
                                 as_double(F.col(vec_col)).alias("cv")),
                   "cv", "cn")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6))
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
    q = _with_norm(
        queries.select(F.col(id_col).alias("query_id"),
                       as_double(F.col(vec_col)).alias("qv"),
                       sign_lsh_key(as_double(F.col(vec_col)), n_bits).alias("bucket")),
        "qv", "qn")
    c = _with_norm(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      as_double(F.col(vec_col)).alias("cv"),
                      sign_lsh_key(as_double(F.col(vec_col)), n_bits).alias("bucket")),
        "cv", "cn")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: deterministic spherical k-means coarse
# quantizer + cell-probed search. The Lloyd loop is driver-coordinated
# like MLlib's KMeans — each iteration is one distributed assign +
# component-mean aggregation whose result (n_centroids x dim doubles)
# is tiny; the corpus itself never leaves executors.
# ---------------------------------------------------------------------------

def _unit(vec: list[float]) -> list[float]:
    import math

    n = math.sqrt(sum(x * x for x in vec))
    return [x / n for x in vec] if n else list(vec)


def _centroid_lit(c: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in c])


def assign_cells(base: DataFrame, cents_unit: list[list[float]],
                 vec_col: str = "v") -> DataFrame:
    """Nearest-centroid cell (1-based) by cosine. Centroids are
    pre-normalized so the argmax over plain dot products equals the
    cosine argmax (the row norm is a common positive factor); the dot
    array is let-bound to evaluate once per row."""
    from sanctions_data_pipeline_spark.functions.hof import let

    dots = F.array(*[dot(F.col(vec_col), _centroid_lit(c))
                     for c in cents_unit])
    cell = let(dots, lambda d: F.array_position(d, F.array_max(d)))
    return base.withColumn("cell", cell.cast("int"))


def kmeans_fit(corpus: DataFrame, n_centroids: int = 16, n_iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic spherical k-means: seeds are the n_centroids rows
    with the smallest xxhash64(id) (stable pseudo-random), then n_iters
    Lloyd steps (cosine assign, component-mean update, re-normalize).
    Cells that lose all members keep their previous centroid."""
    base = corpus.select(F.col(id_col),
                         as_double(F.col(vec_col)).alias("v"))
    seeds = (base.orderBy(F.xxhash64(F.col(id_col).cast("string")), id_col)
             .limit(n_centroids).collect())
    cents = [_unit(list(r["v"])) for r in seeds]
    for _ in range(n_iters):
        means = (
            assign_cells(base, cents)
            .select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos").agg(F.avg("x").alias("m"))
        ).collect()
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        cents = [
            _unit([by_cell[cell][p] for p in sorted(by_cell[cell])])
            if cell in by_cell else cents[cell - 1]
            for cell in range(1, len(cents) + 1)
        ]
    return cents


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int,
             n_centroids: int = 16, n_iters: int = 2, n_probe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN top-k: corpus rows live in their nearest-centroid cell;
    each query probes its n_probe nearest cells only. At scale the
    corpus side is written partitioned by cell so a probe reads
    n_probe/n_centroids of the data; queries broadcast.
    Output (query_id, neighbor_id, cos, rnk)."""
    from sanctions_data_pipeline_spark.functions.hof import let

    cents = kmeans_fit(corpus, n_centroids, n_iters, id_col, vec_col)
    c = assign_cells(
        _with_norm(corpus.select(F.col(id_col).alias("neighbor_id"),
                                 as_double(F.col(vec_col)).alias("cv")),
                   "cv", "cn"), cents, "cv")
    scored_cells = F.array(*[
        F.struct(dot(F.col("qv"), _centroid_lit(cc)).alias("d"),
                 F.lit(i + 1).alias("cell"))
        for i, cc in enumerate(cents)])
    probes = (
        _with_norm(queries.select(F.col(id_col).alias("query_id"),
                                  as_double(F.col(vec_col)).alias("qv")),
                   "qv", "qn")
        .select(
            "query_id", "qv", "qn",
            F.explode(let(scored_cells, lambda s: F.slice(
                F.reverse(F.array_sort(s)), 1, n_probe))).alias("p"))
        .select("query_id", "qv", "qn", F.col("p.cell").alias("cell"))
    )
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )

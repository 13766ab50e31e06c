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
    sign_lsh_key / assign_cells) to cap it.

    DUPLICATE MASS (round 9, the operators/dedup.py pair-family
    discipline): K identical vectors inside one block form a K-clique
    — cos(a, x) is a function of the VECTOR, so identical rows are
    interchangeable. A CBO probe (count vs approx-distinct vector
    hash) routes duplicate-heavy inputs through collapse-first: the
    blocked join runs on one representative per (block, vector) group,
    within-group cliques are emitted as narrow explodes carrying the
    rep's self-cosine (the SAME expression tree the direct join would
    evaluate on two identical rows — bit-identical, including the
    NaN-excludes-zero-vectors edge), and cross-group pairs expand the
    rep pair list. Only the unavoidable output stays K²."""
    st = vecs.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(F.xxhash64(vec_col), rsd=0.05).alias("d")
    ).first()
    if (not st["n"]) or st["n"] <= st["d"] * 1.15:
        return _cosine_pairs_direct(vecs, block_cols, threshold,
                                    id_col, vec_col)
    from sanctions_data_pipeline_spark.operators import dedup as dd

    par = vecs.sparkSession.sparkContext.defaultParallelism
    groups = (vecs
              .select(*block_cols, F.col(id_col).alias("i"),
                      F.col(vec_col).alias("__v"))
              .groupBy(*block_cols, "__v")
              .agg(F.min("i").alias("rep"),
                   F.collect_list("i").alias("members"))
              .repartition(par, "rep")
              .persist())
    reps = groups.select(*block_cols, F.col("rep").alias(id_col),
                         F.col("__v").alias(vec_col))
    rep_pairs = _cosine_pairs_direct(reps, block_cols, threshold,
                                     id_col, vec_col)
    u = as_double(F.col("__v"))
    selfcos = F.round(dot(u, u) / (F.sqrt(dot(u, u)) * F.sqrt(dot(u, u))), 6)
    within = (groups
              .withColumn("__c", selfcos)
              .filter((F.size("members") >= 2) & (F.col("__c") >= threshold))
              .select(F.explode("members").alias("i"), "members", "__c")
              .select("i", F.explode("members").alias("j"), "__c")
              .filter(F.col("i") < F.col("j"))
              .select("i", "j", F.col("__c").alias("cos")))
    cross = dd._expand_rep_pairs(rep_pairs, groups, ["cos"])
    return within.unionByName(cross)


def cosine_pair_counts(vecs: DataFrame, block_cols: list[str],
                       threshold: float, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """The :func:`cosine_pairs` multiset WITHOUT enumeration: rows
    (cos, w) where w is the number of (i < j) pairs sharing that
    cosine cell. sum(w) over any cos-predicate equals the count of
    cosine_pairs rows satisfying it — the contract consumers that only
    AGGREGATE over pairs (threshold sweeps, histograms) should use.

    Under duplicate mass the collapse-first path of cosine_pairs still
    pays the unavoidable K² OUTPUT expansion (members_i × members_j
    rows); here the expansion is replaced by arithmetic — cross-group
    rep pairs carry w = |members_i| * |members_j| and within-group
    cliques w = k(k-1)/2 — so the result stays rep-pair-sized at any
    duplicate multiplicity (measured: dd_threshold_sweep at the ×100
    duplicate-mass tier was 59.5 s of pure pair expansion feeding a
    count). Dup-light corpora route through the direct join with
    w = 1 (same CBO probe as cosine_pairs)."""
    st = vecs.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(F.xxhash64(vec_col), rsd=0.05).alias("d")
    ).first()
    if (not st["n"]) or st["n"] <= st["d"] * 1.15:
        return (_cosine_pairs_direct(vecs, block_cols, threshold,
                                     id_col, vec_col)
                .select("cos", F.lit(1).cast("bigint").alias("w")))
    par = vecs.sparkSession.sparkContext.defaultParallelism
    groups = (vecs
              .select(*block_cols, F.col(id_col).alias("i"),
                      F.col(vec_col).alias("__v"))
              .groupBy(*block_cols, "__v")
              .agg(F.min("i").alias("rep"),
                   F.count(F.lit(1)).alias("k"))
              .repartition(par, "rep")
              .persist())
    reps = groups.select(*block_cols, F.col("rep").alias(id_col),
                         F.col("__v").alias(vec_col))
    sizes = groups.select(F.col("rep"), F.col("k"))
    rep_pairs = _cosine_pairs_direct(reps, block_cols, threshold,
                                     id_col, vec_col)
    cross = (rep_pairs
             .join(F.broadcast(sizes.withColumnRenamed("rep", "i")
                               .withColumnRenamed("k", "__ki")), "i")
             .join(F.broadcast(sizes.withColumnRenamed("rep", "j")
                               .withColumnRenamed("k", "__kj")), "j")
             .select("cos", (F.col("__ki") * F.col("__kj"))
                     .cast("bigint").alias("w")))
    u = as_double(F.col("__v"))
    selfcos = F.round(dot(u, u) / (F.sqrt(dot(u, u)) * F.sqrt(dot(u, u))), 6)
    within = (groups
              .withColumn("__c", selfcos)
              .filter((F.col("k") >= 2) & (F.col("__c") >= threshold))
              .select(F.col("__c").alias("cos"),
                      (F.col("k") * (F.col("k") - 1) / 2)
                      .cast("bigint").alias("w")))
    return within.unionByName(cross)


def _cosine_pairs_direct(vecs: DataFrame, block_cols: list[str],
                         threshold: float, id_col: str,
                         vec_col: str) -> DataFrame:
    """The blocked all-pairs join proper (see cosine_pairs)."""
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


def range_search(queries: DataFrame, corpus: DataFrame, threshold: float,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All corpus neighbors with cosine >= threshold per query (the
    radius/range-query twin of top-k — retrieval-augmented dedup and
    contamination sweeps want 'everything this similar', not 'the best
    k'). Queries broadcast; the corpus is scanned once, map-side, with
    no shuffle at all — the cheapest possible shape at 100 TB.
    Output (query_id, neighbor_id, cos)."""
    q = _with_norm(queries.select(F.col(id_col).alias("query_id"),
                                  as_double(F.col(vec_col)).alias("qv")),
                   "qv", "qn")
    c = _with_norm(corpus.select(F.col(id_col).alias("neighbor_id"),
                                 as_double(F.col(vec_col)).alias("cv")),
                   "cv", "cn")
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6))
        .filter(F.col("cos") >= threshold)
        .select("query_id", "neighbor_id", "cos")
    )


def knn_graph(vecs: DataFrame, k: int, block_cols: list[str] | None = None,
              id_col: str = "vec_id", vec_col: str = "embedding",
              matmul_max_corpus: int = 200_000) -> DataFrame:
    """k-nearest-neighbor graph over the WHOLE embedding set: each
    node's top-k cosine neighbors (the substrate for graph-based
    semantic clustering and SemDeDup-style pruning). Output
    (src_id, dst_id, cos, rnk).

    With ``block_cols`` the self-join runs within blocks only (the
    scale path: pass an IVF cell or LSH bucket — exact within each
    block, like FAISS IVF with n_probe=1). Without blocks it is the
    exact quadratic baseline — only for corpus sizes where n² pairs
    fit the cluster, same contract as sim_topk_bruteforce.

    PHYSICAL STRATEGY for the no-blocks case (round 11): when the
    corpus fits a broadcast (<= ``matmul_max_corpus`` rows), scoring
    runs as dim-ORDERED numpy accumulation inside Arrow-batched
    mapInPandas over the src side — each (src, dst) dot accumulates
    d = 0..D-1 sequentially, the float-op-for-float-op twin of the
    zip_with fold (and of DuckDB's list_inner_product), so RAW cosines
    are bit-identical to the crossJoin path and oracle value-hashes
    are unaffected. The UDF emits each src's candidates down to the
    k-th raw cosine minus 2e-6 (rounding to 6 dp moves a value < 1e-6,
    so no candidate outside that margin can enter the rounded top-k —
    the cut is exact, not heuristic); Spark then applies the SAME
    round + window rank as the crossJoin path. ~20x over the
    interpreted per-pair HOF fold (34 s -> ~2 s at sf0.1). Corpora
    over the bound keep the crossJoin plan (no single-node corpus
    copy), matching the documented exact-baseline contract.

    DUPLICATE MASS (round 11, the pair-family discipline): cos is a
    function of the VECTOR, so identical rows are interchangeable and
    a duplicate-heavy corpus (the same CBO probe as cosine_pairs)
    routes through collapse-first — the quadratic scoring runs on one
    representative per distinct vector and the graph is reconstructed
    by an exact rank-preserving expansion (:func:`_knn_graph_collapsed`
    proves the cut). 456 s -> ~7 s at the ×100 duplicate-mass tier."""
    on = block_cols or []
    if not on:
        st = vecs.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(F.xxhash64(vec_col), rsd=0.05).alias("d")
        ).first()
        if st["n"] and st["n"] > st["d"] * 1.15:
            return _knn_graph_collapsed(vecs, k, id_col, vec_col,
                                        matmul_max_corpus)
        if st["n"] and st["n"] <= matmul_max_corpus:
            return _finalize_knn(
                _knn_matmul_cand(vecs, k, id_col, vec_col), k)
    a = _with_norm(vecs.select(*on, F.col(id_col).alias("src_id"),
                               as_double(F.col(vec_col)).alias("va")),
                   "va", "na")
    b = _with_norm(vecs.select(*on, F.col(id_col).alias("dst_id"),
                               as_double(F.col(vec_col)).alias("vb")),
                   "vb", "nb")
    joined = (a.join(b, on=on) if on else a.crossJoin(b)).filter(
        F.col("src_id") != F.col("dst_id"))
    # rank within (block, src): under multi-probe replication a src
    # appears in several blocks, and each block must yield its own
    # exact top-k (the caller re-ranks the union)
    w = W.partitionBy(*on, "src_id").orderBy(F.desc("cos"), F.asc("dst_id"))
    return (
        joined.withColumn("cos", F.round(
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("src_id", "dst_id", "cos", "rnk")
    )


def _finalize_knn(cand: DataFrame, k: int) -> DataFrame:
    """Shared final step over raw candidates (src_id, dst_id, cos_raw):
    the SAME round + window rank every knn_graph path applies."""
    w = W.partitionBy("src_id").orderBy(F.desc("cos"), F.asc("dst_id"))
    return (cand.withColumn("cos", F.round(F.col("cos_raw"), 6))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("src_id", "dst_id", "cos", "rnk"))


def _knn_crossjoin_cand(vecs: DataFrame, id_col: str,
                        vec_col: str) -> DataFrame:
    """ALL raw pairs (src_id, dst_id, cos_raw), src != dst — the
    fold-exact candidate producer for corpora past the broadcast
    bound."""
    a = _with_norm(vecs.select(F.col(id_col).alias("src_id"),
                               as_double(F.col(vec_col)).alias("va")),
                   "va", "na")
    b = _with_norm(vecs.select(F.col(id_col).alias("dst_id"),
                               as_double(F.col(vec_col)).alias("vb")),
                   "vb", "nb")
    return (a.crossJoin(b)
            .filter(F.col("src_id") != F.col("dst_id"))
            .select("src_id", "dst_id",
                    (dot(F.col("va"), F.col("vb"))
                     / (F.col("na") * F.col("nb"))).alias("cos_raw")))


def _knn_graph_collapsed(vecs: DataFrame, k: int, id_col: str,
                         vec_col: str, matmul_max_corpus: int) -> DataFrame:
    """Collapse-first exact kNN under duplicate mass: identical
    vectors are interchangeable, so score REPRESENTATIVES only and
    expand — quadratic work on distinct mass, output-linear otherwise.

    EXACTNESS ARGUMENT (every cut proven, no recall loss):
    1. Rep-level candidates at depth k+1 with the 2e-6 raw margin,
       PLUS one self row per group (rep, rep, selfcos) — a member's
       own group is a candidate source for its siblings. A member's
       final top-k excludes exactly one row (itself), so it is
       contained in the group's top-(k+1); the (k+1)-th EXPANDED raw
       cos >= the (k+1)-th rep-level raw cos (expansion only adds
       copies of existing values), so the rep cut keeps everything
       within margin of any member's k-th.
    2. dst-side member expansion of the kept reps, then ONE exact
       group-level cut at depth k+1 by the FINAL rounded order
       (round(cos) desc, dst_id asc — a total order, dst_id unique):
       rounding is monotone and the rep cut guarantees every dropped
       row rounds strictly below at least k+1 kept rows, so the
       rounded order over kept rows is complete to depth k+1.
    3. src-side member expansion of the <= k+1 group rows, self
       filter, and the shared final rank — n x (k+1) narrow rows, the
       only term that scales with duplicate multiplicity."""
    groups = (vecs.select(F.col(id_col).alias("__i"),
                          F.col(vec_col).alias("__v"))
              .groupBy("__v")
              .agg(F.min("__i").alias("rep"),
                   F.collect_list("__i").alias("members"))
              .persist())
    reps = groups.select(F.col("rep").alias(id_col),
                         F.col("__v").alias(vec_col))
    if groups.count() <= matmul_max_corpus:
        cand = _knn_matmul_cand(reps, k + 1, id_col, vec_col)
    else:
        cand = _knn_crossjoin_cand(reps, id_col, vec_col)
    u = as_double(F.col("__v"))
    selfcos = dot(u, u) / (F.sqrt(dot(u, u)) * F.sqrt(dot(u, u)))
    cand = cand.unionByName(
        groups.select(F.col("rep").alias("src_id"),
                      F.col("rep").alias("dst_id"),
                      selfcos.alias("cos_raw")))
    # rep cut: raw margin below the (k+1)-th (NaN ranks FIRST under
    # desc, matching Spark's ordering; a NaN kth1 keeps everything)
    wsrc = W.partitionBy("src_id")
    rn = F.row_number().over(
        wsrc.orderBy(F.desc("cos_raw"), F.asc("dst_id")))
    kth1 = F.max(F.when(F.col("__rn") == k + 1, F.col("cos_raw"))).over(wsrc)
    cand = (cand.withColumn("__rn", rn)
            .withColumn("__kth1", kth1)
            .filter(F.col("__kth1").isNull() | F.isnan("__kth1")
                    | F.isnan("cos_raw")
                    | (F.col("cos_raw") >= F.col("__kth1") - F.lit(2e-6)))
            .select("src_id", "dst_id", "cos_raw"))
    # dst expansion, then the exact rounded-order cut at depth k+1
    gj = groups.select(F.col("rep").alias("dst_id"),
                       F.col("members").alias("__mj"))
    expanded = (cand.join(gj, "dst_id")
                .select("src_id", F.explode("__mj").alias("dst_id"),
                        "cos_raw"))
    grn = F.row_number().over(
        wsrc.orderBy(F.round(F.col("cos_raw"), 6).desc(),
                     F.asc("dst_id")))
    top = (expanded.withColumn("__grn", grn)
           .filter(F.col("__grn") <= k + 1)
           .select(F.col("src_id").alias("__rep"), "dst_id", "cos_raw"))
    # src expansion + self filter + shared final rank
    gi = groups.select(F.col("rep").alias("__rep"),
                       F.col("members").alias("__mi"))
    out = (top.join(gi, "__rep")
           .select(F.explode("__mi").alias("src_id"), "dst_id", "cos_raw")
           .filter(F.col("src_id") != F.col("dst_id")))
    return _finalize_knn(out, k)


def _knn_matmul_cand(vecs: DataFrame, k: int, id_col: str,
                     vec_col: str) -> DataFrame:
    """Broadcast-corpus exact kNN candidates (src_id, dst_id, cos_raw)
    down to the k-th raw cosine minus the margin: see
    :func:`knn_graph`. The corpus (id, vector) ships once per
    executor; candidate emission is n x (k + margin) rows, so no n²
    relation ever materializes."""
    import numpy as np

    rows = (vecs.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
            .collect())
    corpus_ids = np.array([r[0] for r in rows], dtype="int64")
    corpus_v = np.array([r.v for r in rows], dtype="float64")
    d = corpus_v.shape[1]

    def _seq_norm(m: "np.ndarray") -> "np.ndarray":
        # sqrt of the dim-ORDERED sum of squares — the zip_with fold's
        # exact float association (acc + x*x, d ascending)
        s = np.zeros(m.shape[0])
        for di in range(m.shape[1]):
            s = s + m[:, di] * m[:, di]
        return np.sqrt(s)

    corpus_norm = _seq_norm(corpus_v)
    # ship the corpus ONCE per executor, not once per serialized task
    bc = vecs.sparkSession.sparkContext.broadcast(
        (corpus_ids, corpus_v, corpus_norm))

    def score(batches):
        import pandas as pd
        corpus_ids, corpus_v, corpus_norm = bc.value
        n_corpus = len(corpus_ids)
        col_of = {int(cid): c for c, cid in enumerate(corpus_ids)}
        # row-block the Arrow batch so the selection matrices stay
        # ~256 MB regardless of corpus size (a 10k-row batch against a
        # 150k corpus would otherwise allocate 12 GB)
        blk = max(1, int(32_000_000 // max(1, n_corpus)))
        for pdf in batches:
            for lo in range(0, len(pdf), blk):
                chunk = pdf.iloc[lo:lo + blk]
                if not len(chunk):
                    continue
                sids = chunk[id_col].to_numpy(dtype="int64")
                sv = np.array(chunk["v"].tolist(), dtype="float64")
                sn = _seq_norm(sv)
                # SELECTION pass: one dgemm + whole-matrix masking
                # (a per-row loop allocated ~6 corpus-length temps per
                # row — terabyte-scale allocation traffic at a 150k
                # corpus; measured 459 s -> vectorized). The dgemm's
                # float association differs from the dim-ordered fold
                # by <= ~d*eps*|x||y| (~1e-13 absolute for d=64),
                # absorbed by widening the emission margin 1e-9 past
                # the 2e-6 rounding margin — the exact fold is then
                # recomputed ONLY on the emitted n*(k+margin)
                # candidates.
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = ((sv @ corpus_v.T)
                           / (sn[:, None] * corpus_norm[None, :]))
                # non-finite sorts FIRST under Spark's desc
                # (NaN > any double) -> +inf for selection
                sel = np.where(np.isfinite(cos), cos, np.inf)
                self_r, self_c = [], []
                for i, sid in enumerate(sids):
                    c = col_of.get(int(sid))
                    if c is not None:
                        self_r.append(i)
                        self_c.append(c)
                sel[self_r, self_c] = -np.inf      # self never selected
                if n_corpus <= k + 1:
                    keep = sel > -np.inf
                else:
                    kth = np.partition(sel, n_corpus - k,
                                       axis=1)[:, n_corpus - k]
                    keep = sel >= (kth[:, None] - 2e-6 - 1e-9)
                ri, ci = np.nonzero(keep)
                # EXACT pass, dim-ordered accumulation over the kept
                # pairs only — bit-identical to the zip_with fold
                a, b = sv[ri], corpus_v[ci]
                acc = np.zeros(len(ri))
                for di in range(d):
                    acc = acc + a[:, di] * b[:, di]
                with np.errstate(divide="ignore", invalid="ignore"):
                    exact = acc / (sn[ri] * corpus_norm[ci])
                yield pd.DataFrame({
                    "src_id": pd.Series(sids[ri], dtype="int64"),
                    "dst_id": pd.Series(corpus_ids[ci], dtype="int64"),
                    "cos_raw": pd.Series(exact, dtype="float64")})

    return (vecs.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
            .mapInPandas(score, "src_id long, dst_id long, cos_raw double"))


def semantic_dedup(vecs: DataFrame, threshold: float, n_centroids: int = 16,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   cents: list[list[float]] | None = None) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): cluster embeddings
    with the deterministic spherical k-means coarse quantizer, find
    within-cluster pairs with cosine >= threshold, and drop the member
    of each pair FARTHER from its cluster centroid (keep the most
    prototypical copy). Output (vec_id, cell, keep) for every input row.

    Scale shape is identical to IVF indexing: k-means driver state is
    centroids x dim, assignment is map-side, and the quadratic pair
    join is bounded by cell population (grow n_centroids with the
    corpus to hold cell size constant).

    ``cents`` lets a caller that already fitted the quantizer (e.g. a
    checker recomputing the drop rule from the same cells) thread the
    centroids in, instead of paying a second fit and leaning on the
    trainer being bitwise deterministic across invocations."""
    if cents is None:
        cents = kmeans_fit(vecs, n_centroids, id_col=id_col, vec_col=vec_col)
    base = assign_cells(
        vecs.select(F.col(id_col), as_double(F.col(vec_col)).alias("v")),
        cents)
    # distance-to-centroid, by cell (dot with unit centroid on unit-ish
    # vectors; higher = more prototypical)
    cent_arr = F.array(*[_centroid_lit(c) for c in cents])
    # scored feeds four consumers (both cosine_pairs join sides via
    # pairs, both sc probe joins, and the final keep join): persist so
    # the assignment + centroid-dot map runs once, not per consumer
    # (round-12 subtree lint; corpus-linear rows, the r11 persist class)
    scored = base.withColumn(
        "cdot", F.round(dot(F.col("v"), F.element_at(cent_arr, F.col("cell")))
                        / F.sqrt(dot(F.col("v"), F.col("v"))), 6)).persist()
    pairs = cosine_pairs(scored.select("cell", F.col(id_col), F.col("v")),
                         ["cell"], threshold, id_col=id_col, vec_col="v")
    # a row is dropped if ANY over-threshold partner is more
    # prototypical (ties broken toward the smaller id, which survives)
    sc = scored.select(F.col(id_col).alias("__sid"), F.col("cdot"))
    both = (pairs
            .join(sc.withColumnRenamed("__sid", "i").withColumnRenamed("cdot", "di"), "i")
            .join(sc.withColumnRenamed("__sid", "j").withColumnRenamed("cdot", "dj"), "j"))
    losers = (both.select(
        F.when((F.col("di") < F.col("dj"))
               | ((F.col("di") == F.col("dj")) & (F.col("i") > F.col("j"))),
               F.col("i")).otherwise(F.col("j")).alias(id_col))
        .distinct())
    return (scored.join(losers.withColumn("__drop", F.lit(1)), id_col, "left")
            .select(id_col, "cell",
                    F.when(F.col("__drop").isNull(), 1).otherwise(0)
                     .cast("bigint").alias("keep")))


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


def assign_cells_multi(base: DataFrame, cents_unit: list[list[float]],
                       n_probe: int = 2, vec_col: str = "v") -> DataFrame:
    """Replicate each row into its n_probe nearest cells (IVF
    multi-probe on the INDEX side): two vectors meet if any of their
    probed cells coincide, which repairs most boundary-straddling
    neighbor pairs that single-cell blocking severs. Replication
    factor is exactly n_probe."""
    from sanctions_data_pipeline_spark.functions.hof import let

    scored = F.array(*[
        F.struct(dot(F.col(vec_col), _centroid_lit(c)).alias("d"),
                 F.lit(i + 1).alias("cell"))
        for i, c in enumerate(cents_unit)])
    probes = let(scored, lambda s: F.slice(
        F.reverse(F.array_sort(s)), 1, n_probe))
    return (base.withColumn("__p", F.explode(probes))
            .withColumn("cell", F.col("__p.cell").cast("int"))
            .drop("__p"))


def knn_graph_ivf(vecs: DataFrame, k: int, n_centroids: int = 8,
                  n_probe: int = 2, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Scale path of :func:`knn_graph`: deterministic k-means cells,
    multi-probe membership, exact scoring within each cell, then a
    global per-source re-rank over the candidate union (duplicates
    from shared cells collapse before ranking). Quadratic work is
    bounded by (cell population × n_probe²); grow n_centroids with the
    corpus to hold cell size constant.

    In-cell scoring is one Arrow-batched numpy matmul per cell
    (applyInPandas) — the FAISS in-list scan — instead of n² interpreted
    higher-order-function folds: ~15× on the all-pairs stage, which
    dominates this operator. Ranking semantics match :func:`knn_graph`
    exactly (cos rounded 6dp, desc, ties by ascending dst_id); the
    rounded cosines can differ from the fold path only when an exact
    last-ulp rounding boundary is hit (numpy pairwise vs sequential
    summation), which the recall-based tests tolerate by design."""
    import numpy as np
    import pandas as pd

    cents = kmeans_fit(vecs, n_centroids, id_col=id_col, vec_col=vec_col)
    celled = assign_cells_multi(
        vecs.select(F.col(id_col), as_double(F.col(vec_col)).alias("v")),
        cents, n_probe)

    def cell_topk(pdf):
        ids = pdf[id_col].to_numpy()
        m = len(ids)
        kk = min(k, m - 1)
        if kk <= 0:
            return pd.DataFrame({"src_id": pd.Series([], dtype="int64"),
                                 "dst_id": pd.Series([], dtype="int64"),
                                 "cos": pd.Series([], dtype="float64")})
        v = np.array(pdf["v"].tolist(), dtype="float64")
        u = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
        cos = np.round(u @ u.T, 6)
        src, dst, val = [], [], []
        for i in range(m):
            order = np.lexsort((ids, -cos[i]))   # desc cos, ties asc id
            picked = order[order != i][:kk]
            src.extend([ids[i]] * len(picked))
            dst.extend(ids[picked].tolist())
            val.extend(cos[i, picked].tolist())
        return pd.DataFrame({"src_id": src, "dst_id": dst, "cos": val})

    cell_topk.__annotations__ = {"pdf": pd.DataFrame, "return": pd.DataFrame}
    cand = (celled.groupBy("cell")
            .applyInPandas(cell_topk, "src_id long, dst_id long, cos double")
            .distinct())
    w = W.partitionBy("src_id").orderBy(F.desc("cos"), F.asc("dst_id"))
    return (cand.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def kmeans_fit(corpus: DataFrame, n_centroids: int = 16, n_iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               sample: int = 4096) -> list[list[float]]:
    """Deterministic spherical k-means trained on a bounded sample —
    the FAISS IndexIVF practice (quantizers train on samples, never the
    corpus): the training set is the ``sample`` rows with the smallest
    xxhash64(id) (stable pseudo-random, one TakeOrdered job — no global
    sort materializes), seeds are its first n_centroids rows (identical
    to the historical full-corpus seed rule), then n_iters Lloyd steps
    driver-side (cosine assign = first-max dot, component mean,
    re-normalize; cells that lose all members keep their previous
    centroid). Driver work is O(sample x n_centroids x d); the corpus
    itself never shuffles for training — assignment over the full
    corpus happens exactly once, map-side, in the caller's encode pass.
    (The previous implementation ran each Lloyd step as a full-corpus
    posexplode shuffle with centroid-literal expression trees re-built
    and re-analyzed per iteration — correct but all fixed overhead.)"""
    import numpy as np

    base = corpus.select(F.col(id_col),
                         as_double(F.col(vec_col)).alias("v"))
    rows = (base.orderBy(F.xxhash64(F.col(id_col).cast("string")), id_col)
            .limit(max(sample, n_centroids)).collect())
    cents = [_unit(list(r["v"])) for r in rows[:n_centroids]]
    if not rows:
        return cents
    x = np.array([r["v"] for r in rows], dtype="float64")
    for _ in range(n_iters):
        c = np.array(cents, dtype="float64")
        assign = (x @ c.T).argmax(axis=1)      # first max, like array_position
        nxt = []
        for cell in range(len(cents)):
            mask = assign == cell
            nxt.append(_unit(x[mask].mean(axis=0).tolist()) if mask.any()
                       else cents[cell])
        cents = nxt
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


# ---------------------------------------------------------------------------
# PQ (product quantization) ANN: the memory-compression scale path —
# each d-dim float vector becomes m uint8 codes (d*4 bytes -> m bytes,
# 32x at d=64/m=8), searched via asymmetric distance computation (ADC)
# and exactly re-ranked. Codebooks train on a BOUNDED deterministic
# sample on the driver (standard practice — FAISS trains on samples;
# driver work is O(sample x d), never corpus-sized); encoding and
# scoring are distributed Arrow-batched numpy over executor partitions.
# ---------------------------------------------------------------------------

def pq_train_codebooks(corpus: DataFrame, m: int = 8, ksub: int = 16,
                       n_iters: int = 8, sample: int = 1024,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> "np.ndarray":  # noqa: F821
    """Train m per-subspace codebooks of ksub centroids each on a
    deterministic md5-ordered sample (stable across runs/partitioning).
    Returns array (m, ksub, d/m). Vectors are unit-normalized first so
    ADC dot products approximate cosine."""
    import numpy as np

    rows = (corpus.select(F.col(id_col).alias("i"),
                          as_double(F.col(vec_col)).alias("v"))
            .orderBy(F.md5(F.col("i").cast("string")), "i")
            .limit(sample).collect())
    x = np.array([r["v"] for r in rows], dtype="float64")
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    d = x.shape[1]
    assert d % m == 0, f"dim {d} not divisible into {m} subspaces"
    dsub = d // m
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        xs = x[:, s * dsub:(s + 1) * dsub]
        cents = xs[:ksub].copy()  # deterministic seed: first sample rows
        for _ in range(n_iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    cents[c] = xs[mask].mean(axis=0)
        books[s] = cents
    return books


def _pq_encode(df, books, extra_cols=(), cents=None):
    """Shared PQ encoder: ``df`` has (i, v[, extra...]); emits
    (neighbor_id[, extra...], codes) with one vectorized Arrow pass.
    Both pq_topk and ivfpq_topk encode through HERE so the norm guard
    and argmin semantics can never diverge between the two indexes."""
    import numpy as np
    import pandas as pd

    mm, _, dsub = books.shape
    bbooks = books
    extra = list(extra_cols)
    carr = None if cents is None else __import__("numpy").array(
        cents, dtype="float64")

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf["v"].tolist(), dtype="float64")
            vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True),
                               1e-12)
            codes = np.empty((len(pdf), mm), dtype="int32")
            for sub in range(mm):
                xs = vecs[:, sub * dsub:(sub + 1) * dsub]
                d2 = ((xs[:, None, :] - bbooks[sub][None, :, :]) ** 2).sum(axis=2)
                codes[:, sub] = d2.argmin(axis=1)
            out = {"neighbor_id": pdf["i"]}
            for c in extra:
                out[c] = pdf[c]
            if carr is not None:
                # IVF cell in the SAME Arrow pass (argmax dot vs unit
                # centroids, first-max tie — cosine argmax since rows
                # here are normalized and the true row norm is a common
                # positive factor), instead of a second corpus pass
                # through a centroid-literal expression tree
                out["cell"] = (vecs @ carr.T).argmax(axis=1) + 1
            out["codes"] = list(codes.tolist())
            yield pd.DataFrame(out)

    cellcol = "cell int, " if cents is not None else ""
    schema = ("neighbor_id long, "
              + "".join(f"{c} int, " for c in extra) + cellcol
              + "codes array<int>")
    return df.mapInPandas(encode, schema)


def _pq_query_lut(queries, books, id_col, vec_col):
    """Collect the (small by contract) query side and build the ADC
    lookup table lut[q, s, c] = dot(q_sub, centroid). Returns
    (query_ids ndarray, lut ndarray)."""
    import numpy as np

    mm, _, dsub = books.shape
    q_rows = (queries.select(F.col(id_col).alias("query_id"),
                             as_double(F.col(vec_col)).alias("qv"))
              .collect())
    qids = np.array([r["query_id"] for r in q_rows])
    qv = np.array([r["qv"] for r in q_rows], dtype="float64")
    qv /= np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-12)
    lut = np.stack([qv[:, sub * dsub:(sub + 1) * dsub] @ books[sub].T
                    for sub in range(mm)], axis=1)
    return qids, lut


def _exact_cosine_rerank(cand, queries, corpus, k,
                         id_col="vec_id", vec_col="embedding"):
    """Shared exact re-rank: join approximate candidates back to real
    vectors, score true cosine, keep top-k per query."""
    cv = _with_norm(corpus.select(F.col(id_col).alias("neighbor_id"),
                                  as_double(F.col(vec_col)).alias("cv")),
                    "cv", "cn")
    qdf = _with_norm(
        queries.select(F.col(id_col).alias("query_id"),
                       as_double(F.col(vec_col)).alias("qv")), "qv", "qn")
    scored = (cand.join(cv, "neighbor_id")
              .join(F.broadcast(qdf), "query_id")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", F.round(
                  dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                  6)))
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "cos", "rnk"))


def pq_topk(queries: DataFrame, corpus: DataFrame, k: int, m: int = 8,
            ksub: int = 16, rerank: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """PQ-ADC top-k with exact re-rank.

    corpus -> (id, m uint8 codes) via one mapInPandas encode pass;
    queries (small side) broadcast their per-subspace ADC lookup tables
    (m x ksub floats each); a second mapInPandas scores codes against
    every query's LUT in one vectorized matmul-free gather per batch;
    the per-query approximate top (rerank*k) candidates then join back
    to real vectors for EXACT cosine re-ranking, so returned scores are
    true cosines and ranking errors are bounded to recall, never to
    score quality. Output (query_id, neighbor_id, cos, rnk).

    Scale: codes are m bytes/vector (32x smaller than float32 at
    d=64/m=8) — the corpus side that must be scanned per query fits in
    memory 32x further up; LUTs are m*ksub doubles per query, broadcast
    with the query batch; the exact re-rank join touches only
    rerank*k rows per query.
    """
    import numpy as np
    import pandas as pd

    books = pq_train_codebooks(corpus, m=m, ksub=ksub,
                               id_col=id_col, vec_col=vec_col)
    mm = books.shape[0]
    coded = _pq_encode(corpus.select(F.col(id_col).alias("i"),
                                     as_double(F.col(vec_col)).alias("v")),
                       books)
    # ADC LUT: lut[q, s, c] = dot(q_sub, centroid)  -> approx cosine is
    # sum over subspaces of lut[q, s, code[s]]
    qids, lut = _pq_query_lut(queries, books, id_col, vec_col)
    n_cand = rerank * k

    def score(batches):
        for pdf in batches:
            codes = np.array(pdf["codes"].tolist(), dtype="int64")
            nids = pdf["neighbor_id"].to_numpy()
            # approx[q, row] = sum_s lut[q, s, codes[row, s]]
            approx = lut[:, np.arange(mm)[None, :], codes].sum(axis=2)
            out_q, out_n, out_a = [], [], []
            for qi in range(len(qids)):
                take = min(n_cand, approx.shape[1])
                idx = np.argpartition(-approx[qi], take - 1)[:take]
                out_q.extend([int(qids[qi])] * take)
                out_n.extend(nids[idx].tolist())
                out_a.extend(approx[qi, idx].tolist())
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                                "approx": out_a})

    cand = coded.mapInPandas(
        score, "query_id long, neighbor_id long, approx double")
    # per-query global candidate cut (partitions each emitted n_cand)
    wq = W.partitionBy("query_id").orderBy(F.desc("approx"), "neighbor_id")
    cand = (cand.withColumn("r", F.row_number().over(wq))
            .filter(F.col("r") <= n_cand).drop("r", "approx"))
    return _exact_cosine_rerank(cand, queries, corpus, k, id_col, vec_col)


def ivfpq_topk(queries: DataFrame, corpus: DataFrame, k: int,
               n_centroids: int = 8, n_probe: int = 2, m: int = 8,
               ksub: int = 16, rerank: int = 4,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF+PQ top-k — the canonical composed ANN index (the
    IndexIVFPQ shape of Jégou et al., TPAMI 2011): coarse k-means cells
    restrict WHICH codes each query scans (IVF, multi-probe on the
    query side), PQ-ADC scores the surviving m-byte codes, and the
    approximate top rerank*k re-rank on exact cosine.

    Scale: combines both partial indexes' wins — the scan per query is
    (corpus/n_centroids)*n_probe rows of m bytes instead of the whole
    float corpus, so cost falls ~n_centroids/n_probe × 32 vs brute
    force while recall stays bounded by the same two knobs measured in
    sim_recall_eval.
    """
    import numpy as np
    import pandas as pd

    cents = kmeans_fit(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
    books = pq_train_codebooks(corpus, m=m, ksub=ksub,
                               id_col=id_col, vec_col=vec_col)
    mm = books.shape[0]

    base = corpus.select(F.col(id_col).alias("i"),
                         as_double(F.col(vec_col)).alias("v"))
    # cells assigned inside the PQ-encode Arrow pass: one corpus scan
    # builds the whole index (cell + m-byte code per row)
    coded = _pq_encode(base, books, cents=cents)

    qids, lut = _pq_query_lut(queries, books, id_col, vec_col)
    qpos = {int(q): i for i, q in enumerate(qids)}

    # query-side multi-probe driver-side (|queries| x n_centroids dots;
    # desc-dot, desc-cell ties — the assign_cells_multi order): the
    # probe list ships as a literal broadcast frame instead of another
    # centroid-literal expression tree
    carr = np.array(cents, dtype="float64")
    q_rows = (queries.select(F.col(id_col).alias("q"),
                             as_double(F.col(vec_col)).alias("v"))
              .collect())
    probe_rows = []
    for r in q_rows:
        d = np.array(r["v"], dtype="float64") @ carr.T
        order = sorted(range(len(cents)), key=lambda c: (-d[c], -(c + 1)))
        probe_rows += [(int(r["q"]), c + 1) for c in order[:n_probe]]
    qcells = queries.sparkSession.createDataFrame(
        probe_rows, "query_id long, cell int")
    # IVF restriction: each query scores only its probed cells' codes
    cand_rows = coded.join(F.broadcast(qcells), "cell")

    def adc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(pdf["codes"].tolist(), dtype="int64")
            qi = np.array([qpos[int(q)] for q in pdf["query_id"]])
            approx = lut[qi[:, None], np.arange(mm)[None, :], codes].sum(axis=1)
            yield pd.DataFrame({"query_id": pdf["query_id"],
                                "neighbor_id": pdf["neighbor_id"],
                                "approx": approx})

    cand = (cand_rows.select("query_id", "neighbor_id", "codes")
            .mapInPandas(adc, "query_id long, neighbor_id long, approx double"))
    n_cand = rerank * k
    wq = W.partitionBy("query_id").orderBy(F.desc("approx"), "neighbor_id")
    cand = (cand.withColumn("r", F.row_number().over(wq))
            .filter(F.col("r") <= n_cand).drop("r", "approx"))
    return _exact_cosine_rerank(cand, queries, corpus, k, id_col, vec_col)

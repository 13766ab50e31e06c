"""Round-3 corpus-quality & graph extensions (SURVEY.md §2):
Gopher-rule quality filtering, soft dedup downweighting, PageRank over
the co-purchase graph, MMR result diversification, k-means training
surface.

Same cross-engine float discipline as ``training_data.py``: every
double that reaches an oracle is either a single division of exact
integers or a strictly sequential fold over a sorted array, rounded to
6dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.operators import similarity as sim
from sanctions_data_pipeline_spark.operators import textstats as tx
from sanctions_data_pipeline_spark.plans.helpers import lcount
from sanctions_data_pipeline_spark.plans.registry import register

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"

# ---------------------------------------------------------------------------
# tx_gopher_rules — the Gopher quality-filter rule set (Rae et al.
# 2021, appendix A1.1), the most-cited public heuristic battery for
# pretraining corpora: word-count bounds, mean-word-length bounds,
# symbol-to-word ratio, alphabetic-word fraction, stopword presence.
# (The two line-level rules — bullet starts / ellipsis line ends — are
# omitted: the synthetic corpus is single-line; the per-line shape
# would be the same list_filter over split(text, '\n').)
#
# Scale: pure map-side column algebra over one corpus scan — no
# shuffle, no UDF; every metric is a higher-order function on the
# token array. The classic first-pass filter you run on all 100 TB.
# ---------------------------------------------------------------------------
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

_GOPHER_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS} AS toks FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
              AS DOUBLE) / len(toks) AS mwl,
         CAST(length(text) - length(replace(text, '#', ''))
              + (length(text) - length(replace(text, '...', ''))) / 3
              AS DOUBLE) / len(toks) AS swr,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
              AS DOUBLE) / len(toks) AS alpha,
         len(list_filter([{', '.join("'" + w + "'" for w in _GOPHER_STOPS)}],
                         w -> list_contains(toks, w))) AS n_stop
  FROM t
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       round(mwl, 6) AS mean_word_len,
       round(swr, 6) AS symbol_ratio,
       round(alpha, 6) AS alpha_ratio,
       CAST(n_stop AS BIGINT) AS n_stopwords,
       (n_words BETWEEN 50 AND 100000
        AND mwl BETWEEN 3 AND 10
        AND swr <= 0.1
        AND alpha >= 0.8
        AND n_stop >= 2) AS passes
FROM m
"""


@register("tx_gopher_rules", oracle=_GOPHER_ORACLE)
def tx_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    base = docs.select(
        "doc_id", "text", toks.alias("toks"), F.size(toks).alias("n_words"))

    n = F.col("n_words").cast("double")
    # every ratio is (exact int) / (exact int) — one IEEE division,
    # bit-identical across engines, rounded 6dp at the edge
    sum_len = F.aggregate(F.transform("toks", F.length),
                          F.lit(0), lambda a, x: a + x)
    n_hash = F.length("text") - F.length(F.replace("text", F.lit("#")))
    n_ell = (F.length("text")
             - F.length(F.replace("text", F.lit("...")))) / F.lit(3)
    n_alpha = F.size(F.filter("toks", lambda x: x.rlike("[a-z]")))
    n_stop = F.size(F.filter(
        F.array(*[F.lit(w) for w in _GOPHER_STOPS]),
        lambda w: F.array_contains("toks", w)))

    m = base.select(
        "doc_id", "n_words",
        (sum_len.cast("double") / n).alias("mwl"),
        ((n_hash + n_ell).cast("double") / n).alias("swr"),
        (n_alpha.cast("double") / n).alias("alpha"),
        n_stop.cast("bigint").alias("n_stopwords"))
    return m.select(
        "doc_id", F.col("n_words").cast("bigint").alias("n_words"),
        F.round("mwl", 6).alias("mean_word_len"),
        F.round("swr", 6).alias("symbol_ratio"),
        F.round("alpha", 6).alias("alpha_ratio"),
        "n_stopwords",
        (F.col("n_words").between(50, 100000)
         & F.col("mwl").between(3, 10)
         & (F.col("swr") <= 0.1)
         & (F.col("alpha") >= 0.8)
         & (F.col("n_stopwords") >= 2)).alias("passes"))


# ---------------------------------------------------------------------------
# dd_soft_dedup — duplicate DOWNWEIGHTING instead of removal: every doc
# gets weight 1/c where c is its exact-duplicate group size (md5 of the
# normalized text), so a K-times-repeated page contributes one page of
# gradient mass in expectation (the soft alternative to dd_exact's
# keep-first; cf. the repetition discussion in Lee et al. 2022).
#
# Scale: identical shuffle profile to dd_exact — the 16-byte hash is
# the only corpus-wide key; the per-group count broadcasts back via the
# same window-free groupBy+join on the hash.
# ---------------------------------------------------------------------------
_SOFT_ORACLE = f"""
WITH h AS (
  SELECT doc_id, md5({_NORM}) AS k FROM documents
),
c AS (SELECT k, count(*) AS dup_count FROM h GROUP BY k)
SELECT h.doc_id, CAST(c.dup_count AS BIGINT) AS dup_count,
       round(1.0 / c.dup_count, 6) AS weight
FROM h JOIN c ON h.k = c.k
"""


@register("dd_soft_dedup", oracle=_SOFT_ORACLE)
def dd_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    h = docs.select("doc_id", F.md5(norm).alias("k"))
    c = h.groupBy("k").agg(lcount("dup_count"))
    return (h.join(c, "k")
            .select("doc_id", "dup_count",
                    F.round(F.lit(1.0) / F.col("dup_count"), 6).alias("weight")))


# ---------------------------------------------------------------------------
# tt_dedup_aware_split — train/test split that can NEVER leak an exact
# duplicate across the boundary: the split hash is computed on the
# GROUP KEY (min doc_id among exact duplicates, via md5 of the
# normalized text), so every member of a duplicate group lands on the
# same side. The failure this prevents — test documents whose
# near-copies sit in train — is precisely what tt_leakage_check
# measures after the fact; this op makes it impossible by construction
# for the exact-dup class.
#
# Scale: one hash-groupBy on the 16-byte text hash (the dd_exact
# shuffle), then the same map-side md5-bucket split as tt_split keyed
# on the group id instead of the row id.
# ---------------------------------------------------------------------------
_TTD_BUCKET = ("(('0x' || substr(md5('ttd:' || CAST(grp AS VARCHAR)), 1, 8))"
               "::BIGINT % 100)")

_TTD_ORACLE = f"""
WITH h AS (
  SELECT doc_id, md5({_NORM}) AS k FROM documents
),
g AS (SELECT k, min(doc_id) AS grp FROM h GROUP BY k)
SELECT h.doc_id, CAST(g.grp AS BIGINT) AS group_id,
       CASE WHEN {_TTD_BUCKET} < 80 THEN 'train'
            WHEN {_TTD_BUCKET} < 90 THEN 'valid'
            ELSE 'test' END AS split
FROM h JOIN g ON h.k = g.k
"""


@register("tt_dedup_aware_split", oracle=_TTD_ORACLE)
def tt_dedup_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    h = docs.select("doc_id", F.md5(norm).alias("k"))
    g = h.groupBy("k").agg(F.min("doc_id").alias("grp"))
    b = (F.conv(F.substring(
        F.md5(F.concat(F.lit("ttd:"), F.col("grp").cast("string"))), 1, 8),
        16, 10).cast("bigint") % 100)
    return (h.join(g, "k")
            .select("doc_id", F.col("grp").cast("bigint").alias("group_id"),
                    F.when(b < 80, "train").when(b < 90, "valid")
                     .otherwise("test").alias("split")))


# ---------------------------------------------------------------------------
# gr_pagerank — PageRank over the co-purchase graph (parts linked when
# bought together in >= 3 orders, symmetric, so no dangling nodes).
# Damping 0.85, uniform init 1/N, 2 power iterations; per-node
# neighbor sums are sorted sequential folds so each iteration's doubles
# are bit-identical in DuckDB (oracle unrolls the same 2 iterations).
#
# Scale: each iteration is one join on src + one agg on dst over
# (long, double) rows — the dd_cluster loop discipline (persist per
# round, bounded lineage) applies verbatim when iters grows; the
# 2-iteration registry entry exists to keep the oracle exact.
# ---------------------------------------------------------------------------
_PR_EDGES = """
  co AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p
    FROM lineitem WHERE l_partkey < 200
  ),
  edges AS (
    SELECT a.p AS src, b.p AS dst
    FROM co a JOIN co b ON a.o = b.o AND a.p <> b.p
    GROUP BY a.p, b.p HAVING count(*) >= 3
  ),
  deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
  nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg)
"""

_PR_ORACLE = f"""
WITH {_PR_EDGES},
pr0 AS (SELECT src AS node, d, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
it1 AS (
  SELECT e.dst AS node,
         0.15 / (SELECT n FROM nn) + 0.85 * list_aggregate(
           list_sort(list(p.pr / p.d)), 'sum') AS pr
  FROM edges e JOIN pr0 p ON e.src = p.node
  GROUP BY e.dst
),
it2 AS (
  SELECT e.dst AS node,
         0.15 / (SELECT n FROM nn) + 0.85 * list_aggregate(
           list_sort(list(p.pr / d.d)), 'sum') AS pr
  FROM edges e JOIN it1 p ON e.src = p.node
               JOIN deg d ON e.src = d.src
  GROUP BY e.dst
)
SELECT it2.node, CAST(deg.d AS BIGINT) AS degree, round(it2.pr, 6) AS pagerank
FROM it2 JOIN deg ON it2.node = deg.src
"""


@register("gr_pagerank", oracle=_PR_ORACLE)
def gr_pagerank(spark: SparkSession, sf_dir: str, iters: int = 2) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 200)
    co = li.select(F.col("l_orderkey").alias("o"),
                   F.col("l_partkey").alias("p")).distinct()
    edges = (co.join(co.withColumnRenamed("p", "q"), "o")
             .filter(F.col("p") != F.col("q"))
             .groupBy(F.col("p").alias("src"), F.col("q").alias("dst"))
             .agg(lcount("w")).filter(F.col("w") >= 3)
             .select("src", "dst").persist())
    deg = edges.groupBy("src").agg(lcount("d"))
    n = float(deg.count())  # bounded driver scalar (node count)

    fold = F.aggregate(F.array_sort(F.collect_list("contrib")),
                       F.lit(0.0), lambda a, x: a + x)
    pr = deg.select(F.col("src").alias("node"),
                    (F.lit(1.0) / F.lit(n)).alias("pr"))
    for _ in range(iters):
        contribs = (edges
                    .join(pr.withColumnRenamed("node", "src"), "src")
                    .join(deg, "src")
                    .select(F.col("dst").alias("node"),
                            (F.col("pr") / F.col("d")).alias("contrib")))
        pr = (contribs.groupBy("node")
              .agg((F.lit(0.15) / F.lit(n) + F.lit(0.85) * fold).alias("pr")))
    out = (pr.join(deg.withColumnRenamed("src", "node"), "node")
           .select("node", F.col("d").cast("bigint").alias("degree"),
                   F.round("pr", 6).alias("pagerank")))
    return out


# ---------------------------------------------------------------------------
# sim_mmr_diversify — Maximal Marginal Relevance re-ranking (Carbonell
# & Goldstein, SIGIR 1998): greedy top-k that trades relevance to the
# query against redundancy with already-selected results,
# score(v) = λ·cos(q, v) − (1−λ)·max_{s∈S} cos(v, s).
#
# Scale split: candidate generation is DISTRIBUTED (exact cosine top-M
# via TakeOrdered — the sim_topk_bruteforce path, or IVF at corpus
# scale); the greedy loop is inherently sequential and runs on the
# bounded M-row candidate set driver-side (M=50 here — same bounded-
# collect discipline as the top-V vocab). Rows-only: the greedy
# argmax chain is not SQL-expressible; pytest replays it in numpy.
# ---------------------------------------------------------------------------
@register("sim_mmr_diversify")
def sim_mmr_diversify(spark: SparkSession, sf_dir: str, k: int = 10,
                      m: int = 50, lam: float = 0.7) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q_row = (emb.filter(F.col("label") == 0).orderBy("vec_id").limit(1)
             .select(sim.as_double(F.col("embedding")).alias("qv")).collect())
    qv = list(q_row[0]["qv"])

    cand_df = (emb.filter(F.col("label") != 0)
               .select("vec_id", sim.as_double(F.col("embedding")).alias("v"))
               .withColumn("rel", sim.dot(F.col("v"), sim._centroid_lit(qv))
                           / (F.sqrt(sim.dot(F.col("v"), F.col("v")))
                              * F.lit(sum(x * x for x in qv) ** 0.5)))
               .orderBy(F.desc("rel"), F.asc("vec_id"))  # parallel TakeOrdered
               .limit(m))
    cand = [(r["vec_id"], list(r["v"]), float(r["rel"]))
            for r in cand_df.collect()]

    def cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return d / (na * nb) if na and nb else 0.0

    selected: list[tuple[int, list[float], float]] = []
    rows = []
    pool = list(cand)
    while pool and len(selected) < k:
        best = None
        for vid, v, rel in pool:
            red = max((cos(v, s[1]) for s in selected), default=0.0)
            score = lam * rel - (1.0 - lam) * red
            # deterministic tiebreak: higher score, then smaller id
            key = (score, -vid)
            if best is None or key > best[0]:
                best = (key, (vid, v, rel), score)
        selected.append(best[1])
        pool.remove(best[1])
        rows.append((len(selected), best[1][0], round(best[2], 6)))
    return spark.createDataFrame(rows, "rank int, vec_id bigint, mmr double")


# ---------------------------------------------------------------------------
# emb_kmeans_train — the k-means training surface itself (the engine
# piece behind sim_ann_ivf / emb_semantic_dedup), exposed as a query:
# deterministic spherical k-means (operators/similarity.kmeans_fit),
# then per-cell population + mean cosine-to-centroid via sorted fold.
# Rows-only (iterative trainer); pytest pins cells against a python
# replay of the same seeds.
#
# Scale: each Lloyd step is one map-side assign + one (cell, pos) agg
# whose output is n_centroids×d — the collect is model-sized, never
# corpus-sized.
# ---------------------------------------------------------------------------
@register("emb_kmeans_train")
def emb_kmeans_train(spark: SparkSession, sf_dir: str,
                     n_centroids: int = 8) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = sim.kmeans_fit(emb, n_centroids)
    base = emb.select("vec_id", sim.as_double(F.col("embedding")).alias("v"))
    celled = sim.assign_cells(base, cents)
    # centroids are unit vectors -> cos = dot / |v|
    cos_c = F.array(*[sim._centroid_lit(c) for c in cents])
    scored = celled.select(
        "cell",
        F.round(sim.dot(F.col("v"), F.element_at(cos_c, F.col("cell")))
                / F.sqrt(sim.dot(F.col("v"), F.col("v"))), 6).alias("cos"))
    fold = F.aggregate(F.array_sort(F.collect_list("cos")),
                       F.lit(0.0), lambda a, x: a + x)
    return (scored.groupBy("cell")
            .agg(lcount("n_members"),
                 F.round(fold / F.count(F.lit(1)), 6).alias("mean_cos")))

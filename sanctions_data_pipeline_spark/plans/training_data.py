"""Training-data-pipeline operator suite (SURVEY.md §2, block 3):
dedup, similarity search, text analysis over documents/embeddings.

Float discipline: all similarity math is sequential-fold double
arithmetic mirrored exactly in the DuckDB oracles (list_inner_product),
rounded to 6dp on both sides before thresholding/output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.operators import dedup as dd
from sanctions_data_pipeline_spark.operators import similarity as sim
from sanctions_data_pipeline_spark.operators import textstats as tx
from sanctions_data_pipeline_spark.plans.helpers import lcount
from sanctions_data_pipeline_spark.plans.registry import register

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"
_COS = ("round(list_inner_product({a}, {b}) / "
        "(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b}))), 6)")


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
@register("dd_exact", headline=True, oracle=f"""
SELECT md5({_NORM}) AS text_hash,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
""")
def dd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(docs)


# --------------------------------------------------------------------------
# n-gram (3-word shingle) Jaccard near-dup pairs, blocked by language
# --------------------------------------------------------------------------
@register("dd_ngram_jaccard", headline=True, oracle=f"""
WITH s AS (
  SELECT doc_id, lang,
         CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(
                range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
              ELSE [] END AS sh
  FROM (SELECT doc_id, lang, {_TOKS} AS t FROM documents)
), p AS (
  SELECT a.doc_id AS i, b.doc_id AS j,
         round(len(list_intersect(a.sh, b.sh)) * 1.0
               / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jac
  FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
)
SELECT i, j, jac FROM p WHERE jac >= 0.5
""")
def dd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(docs, ["lang"], threshold=0.5, k=3)


# --------------------------------------------------------------------------
# MinHash + LSH banding (rows-only: banding recall is probabilistic, the
# verified output is exact Jaccard but candidate coverage is not
# SQL-expressible) — unit tests pin recall on the planted near-dups
# --------------------------------------------------------------------------
@register("dd_minhash_lsh", headline=True)
def dd_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(docs, n_hashes=32, bands=8, threshold=0.5)


# --------------------------------------------------------------------------
# SimHash hamming pairs (rows-only: xxhash64 has no DuckDB twin)
# --------------------------------------------------------------------------
@register("dd_simhash", headline=True)
def dd_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash_pairs(docs, max_hamming=3)


# --------------------------------------------------------------------------
# embedding-cosine near-dup pairs, blocked by label
# --------------------------------------------------------------------------
@register("dd_embed_cosine", oracle=f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
p AS (
  SELECT a.vec_id AS i, b.vec_id AS j,
         {_COS.format(a="a.v", b="b.v")} AS cos
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT i, j, cos FROM p WHERE cos >= 0.4
""")
def dd_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    return sim.cosine_pairs(vecs, ["label"], threshold=0.4)


# --------------------------------------------------------------------------
# exact cosine top-k (brute force baseline)
# --------------------------------------------------------------------------
@register("sim_topk_bruteforce", headline=True, oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         {_COS.format(a="qv", b="v")} AS cos
  FROM q, e WHERE e.vec_id <> query_id
)
SELECT query_id, neighbor_id, cos, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rnk
  FROM scored
) WHERE rnk <= 5
""")
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 10)
    return (sim.brute_force_topk(queries, vecs, k=5)
            .withColumn("rnk", F.col("rnk").cast("bigint")))


# --------------------------------------------------------------------------
# sign-LSH bucketed approximate top-k
# --------------------------------------------------------------------------
def _sql_bucket(v: str, n_bits: int = 8) -> str:
    terms = " + ".join(
        f"(CASE WHEN {v}[{i+1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits))
    return f"({terms})"


@register("sim_ann_lsh", headline=True, oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v, {_sql_bucket("v")} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 10),
scored AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         {_COS.format(a="qv", b="b.v")} AS cos
  FROM q JOIN b USING (bucket) WHERE b.vec_id <> query_id
)
SELECT query_id, neighbor_id, cos, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rnk
  FROM scored
) WHERE rnk <= 3
""")
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 10)
    return (sim.lsh_topk(queries, vecs, k=3, n_bits=8)
            .withColumn("rnk", F.col("rnk").cast("bigint")))


# --------------------------------------------------------------------------
# language ID (stopword-profile heuristic)
# --------------------------------------------------------------------------
@register("tx_langid", headline=True, oracle=f"""
SELECT doc_id, lang, {tx.sql_predict_lang("text")} AS pred_lang
FROM documents
""")
def tx_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang",
                       tx.predict_lang(F.col("text")).alias("pred_lang"))


# --------------------------------------------------------------------------
# quality scoring
# --------------------------------------------------------------------------
@register("tx_quality", oracle=f"""
WITH m AS (
  SELECT doc_id,
         len({_TOKS}) AS n_tokens,
         length(text) AS n_chars_calc,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
         {tx.sql_stopword_hits("text", "en")} AS n_stop
  FROM documents)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars_calc AS BIGINT) AS n_chars_calc,
       round(n_punct * 1.0 / greatest(n_chars_calc, 1), 6) AS punct_ratio,
       round(n_stop * 1.0 / n_tokens, 6) AS stopword_ratio,
       round(0.4 * least(n_tokens / 100.0, 1.0)
             + 0.3 * (1.0 - n_punct * 1.0 / greatest(n_chars_calc, 1))
             + 0.3 * least(n_stop * 5.0 / n_tokens, 1.0), 6) AS quality_score
FROM m
""")
def tx_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = tx.ws_token_count(F.col("text"))
    n_chars = F.length("text")
    n_chars_safe = F.greatest(n_chars, F.lit(1))  # ANSI: 0-length text
    n_punct = tx.punct_count(F.col("text"))
    n_stop = tx.stopword_hits(F.col("text"), "en")
    return docs.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        n_chars.cast("bigint").alias("n_chars_calc"),
        F.round(n_punct * 1.0 / n_chars_safe, 6).alias("punct_ratio"),
        F.round(n_stop * 1.0 / n_tokens, 6).alias("stopword_ratio"),
        tx.quality_score(F.col("text")).alias("quality_score"),
    )


# --------------------------------------------------------------------------
# token counting (whitespace + BPE-ish regex)
# --------------------------------------------------------------------------
@register("tx_tokens", oracle=f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{tx.TOKEN_RE}')) AS BIGINT) AS n_regex_tokens,
       n_chars
FROM documents
""")
def tx_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.ws_token_count(F.col("text")).cast("bigint").alias("n_ws_tokens"),
        tx.regex_token_count(F.col("text")).cast("bigint").alias("n_regex_tokens"),
        "n_chars",
    )


# --------------------------------------------------------------------------
# fingerprinting
# --------------------------------------------------------------------------
@register("tx_fingerprint", oracle=f"""
SELECT doc_id, md5({_NORM}) AS fp, substr(md5({_NORM}), 1, 2) AS fp_bucket
FROM documents
""")
def tx_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = tx.fingerprint(F.col("text"))
    return docs.select("doc_id", fp.alias("fp"),
                       F.substring(fp, 1, 2).alias("fp_bucket"))


# --------------------------------------------------------------------------
# IVF ANN top-k (rows-only: the k-means coarse quantizer is iterative —
# no SQL twin; recall vs brute force pinned in tests/test_ivf.py)
# --------------------------------------------------------------------------
# Oracle contract (round 10, the tok_fertility invariant-lane
# pattern): the IVF cell structure is not SQL-expressible, so the
# registered output is one row per query (the fixed vec_id < 10 set —
# exact relational lane) carrying REAL invariants of a correct
# quantize+probe+scan pass, stated as literals:
#   n_returned            exactly k — the probed cells held enough
#                         candidates (a broken quantizer or probe
#                         rule starves the scan and flips this),
#   rankwise_dominated_ok at every rank r, IVF's r-th cosine <= the
#                         brute-force r-th cosine (IVF scans a SUBSET
#                         of the corpus; a scoring bug that inflates
#                         cosines flips this),
#   neighbors_valid_ok    neighbor != query and cos is a genuine
#                         cosine (|.| <= 1).
# The exact (query, neighbor, cos, rnk) lists stay pinned by pytest
# on sim_ann_ivf_full (the pre-round-10 registered surface).
_IVF_K = 5

_IVF_ORACLE = f"""
SELECT vec_id AS query_id, CAST({_IVF_K} AS BIGINT) AS n_returned,
       TRUE AS rankwise_dominated_ok, TRUE AS neighbors_valid_ok
FROM embeddings WHERE vec_id < 10
"""


@register("sim_ann_ivf", oracle=_IVF_ORACLE)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 10)
    bf = sim.brute_force_topk(queries, vecs, k=_IVF_K)
    return _ann_domination_lattice(sim_ann_ivf_full(spark, sf_dir), bf)


def sim_ann_ivf_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (query_id, neighbor_id, cos, rnk) IVF results — the
    pytest value-pin surface (the pre-round-10 registered output)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 10)
    return (sim.ivf_topk(queries, vecs, k=_IVF_K, n_centroids=16, n_iters=2,
                         n_probe=4)
            .withColumn("rnk", F.col("rnk").cast("bigint")))


# --------------------------------------------------------------------------
# tx_tfidf — TF-IDF term scoring over the corpus. Two hash
# aggregations (doc-term tf, term df) + a broadcast of the corpus size;
# the explode happens map-side so only (doc_id, term) pairs shuffle.
# At 100 TB the df table is still only O(vocabulary) rows and the join
# back to tf is on the term key both sides already shuffled on.
# Filter tf >= 3 bounds output; scores rounded to 6dp on both engines.
# --------------------------------------------------------------------------
@register("tx_tfidf", oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> ''
  GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (SELECT COUNT(*) AS nd FROM documents)
SELECT doc_id, term, tf, df,
       round(tf * ln(CAST(nd AS DOUBLE) / df), 6) AS tfidf
FROM tf JOIN df USING (term), n
WHERE tf >= 3
""")
def tx_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(tx.tokens(F.col("text"))).alias("term"),
    ).filter(F.col("term") != "")
    # tf feeds the doc-frequency census AND the final join: persist so
    # the tokenize + explode + per-doc agg runs once (round-12 lint)
    tf = (toks.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf"))).persist()
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    return (
        tf.filter(F.col("tf") >= 3)
        .join(df_, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id", "term", "tf", "df",
            F.round(F.col("tf") * F.log(F.col("nd").cast("double") / F.col("df")), 6)
             .alias("tfidf"),
        )
    )


# --------------------------------------------------------------------------
# dd_cluster — near-dup pairs -> duplicate GROUPS via distributed
# connected components (min-label propagation + pointer jumping), the
# step that turns pair detection into an actionable keep/drop list.
# Edges are the dd_ngram_jaccard pairs; cluster_id = min doc_id in the
# component. Oracle: DuckDB recursive CTE computing min reachable id.
# --------------------------------------------------------------------------
@register("dd_cluster", headline=True, oracle=f"""
WITH RECURSIVE s AS (
  SELECT doc_id, lang,
         CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(
                range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
              ELSE [] END AS sh
  FROM (SELECT doc_id, lang, {_TOKS} AS t FROM documents)
), p AS (
  SELECT a.doc_id AS i, b.doc_id AS j
  FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.sh, b.sh)) * 1.0
              / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.5
), e AS (
  SELECT i AS a, j AS b FROM p UNION ALL SELECT j, i FROM p
), n AS (SELECT DISTINCT a AS id FROM e),
reach AS (
  SELECT id, id AS r FROM n
  UNION
  SELECT e.a AS id, reach.r FROM e JOIN reach ON e.b = reach.id
)
SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
""")
def dd_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # collapsed-clique CC: identical shingle-sets merge before AllPairs,
    # so duplicate mass never enumerates intra-group pairs (see
    # operators/dedup.ngram_jaccard_components)
    return dd.ngram_jaccard_components(docs, ["lang"], threshold=0.5, k=3)


# --------------------------------------------------------------------------
# tx_pii_redact — regex PII/number scrubbing: count + mask email
# addresses and digit runs, fingerprint the redacted text. Pure
# JVM-side regex expressions (whole-stage codegen, no Python); the
# regexes stay in the RE2-compatible subset so the DuckDB oracle runs
# the byte-identical patterns.
# --------------------------------------------------------------------------
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_NUM_RE = "[0-9]+"


@register("tx_pii_redact", oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_NUM_RE}')) AS BIGINT) AS n_nums,
       md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_NUM_RE}', '<NUM>', 'g')) AS redacted_hash
FROM documents
""")
def tx_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _NUM_RE, "<NUM>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0))
         .cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_NUM_RE), 0))
         .cast("bigint").alias("n_nums"),
        F.md5(redacted).alias("redacted_hash"),
    )


# --------------------------------------------------------------------------
# tx_ngrams — corpus bigram counts (the n-gram LM / contamination-scan
# primitive). The bigram explode happens map-side off the scan; only
# (bigram, 1) pairs shuffle into a hash agg with map-side combine.
# Threshold bounds output size.
# --------------------------------------------------------------------------
@register("tx_ngrams", oracle=f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
idx AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
  FROM toks WHERE len(t) >= 2
), bg AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram FROM idx
)
SELECT bigram, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
FROM bg WHERE bigram <> ' ' GROUP BY bigram HAVING COUNT(*) >= 10
""")
def tx_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tx.tokens(F.col("text")).alias("t"))
    bg = (toks.filter(F.size("t") >= 2)
          .select("doc_id", F.explode(F.expr(
              "transform(sequence(1, size(t) - 1),"
              " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
              .alias("bigram"))
          .filter(F.col("bigram") != " "))
    return (bg.groupBy("bigram")
            .agg(lcount("n"), F.countDistinct("doc_id").alias("n_docs"))
            .filter(F.col("n") >= 10))


# --------------------------------------------------------------------------
# tt_split — deterministic train/valid/test split. The split is a pure
# function of the stable doc_id (first 8 hex digits of md5 -> bucket
# 0..99 -> 80/10/10), so it is reproducible across runs, engines and
# cluster sizes, needs no shuffle at all (map-only, codegen), and new
# documents never move existing ones between splits. This is the
# standard leakage-safe split for training corpora (vs. rand(), which
# is nondeterministic and partition-order-dependent).
# --------------------------------------------------------------------------
_BUCKET = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS INT)"


def split_bucket_col():
    """Spark twin of _BUCKET: the canonical doc_id -> 0..99 split
    bucket. Every op that must agree with tt_split's partition (e.g.
    tt_bloom_contamination) imports THIS, never re-derives it."""
    return (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                   16, 10).cast("bigint") % 100)


@register("tt_split", oracle=f"""
SELECT doc_id,
       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid'
            ELSE 'test' END AS split
FROM (SELECT doc_id, {_BUCKET} AS b FROM documents)
""")
def tt_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = split_bucket_col()
    return docs.select(
        "doc_id",
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
         .alias("split"))


# --------------------------------------------------------------------------
# mix_sample — weighted mixture sampling: each source gets a sampling
# rate from a (broadcast) weights dim, and a row survives iff its
# deterministic per-row uniform u = md5(salt||doc_id)/2^32 < rate.
# Map-only + broadcast hash join: no shuffle, reproducible sample,
# exact per-source rate control — the core of training-mixture
# construction (upsample rare sources, downsample dominant ones).
# --------------------------------------------------------------------------
_MIX_U = "(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0)"
_MIX_WEIGHTS = [(f"src{i}", (i % 4 + 1) / 4.0) for i in range(20)]


@register("mix_sample", oracle=f"""
WITH w(source, rate) AS (VALUES {", ".join(f"('{s}', {r})" for s, r in _MIX_WEIGHTS)})
SELECT d.doc_id, d.source
FROM documents d JOIN w ON d.source = w.source
WHERE {_MIX_U} < w.rate
""")
def mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    weights = spark.createDataFrame(_MIX_WEIGHTS, "source string, rate double")
    u = (F.conv(F.substring(F.md5(F.concat(F.lit("mix:"),
                                           F.col("doc_id").cast("string"))),
                            1, 8), 16, 10)
         .cast("bigint") / F.lit(4294967296.0))
    return (docs.join(F.broadcast(weights), "source")
            .filter(u < F.col("rate"))
            .select("doc_id", "source"))


# --------------------------------------------------------------------------
# dp_pack — sequence packing: assign documents to fixed token-budget
# training bins. Contiguous packing per language: docs ordered by
# doc_id, bin = floor(running_tokens_before / budget) — one window
# cumsum per lang partition (a single shuffle on lang), deterministic
# and restart-stable. (True first-fit-decreasing packing is
# order-dependent and inherently sequential; contiguous packing is the
# standard distributed approximation — each bin overflows by at most
# one document.)
# --------------------------------------------------------------------------
_PACK_BUDGET = 2048


@register("dp_pack", oracle=f"""
WITH t AS (SELECT lang, doc_id, len({_TOKS}) AS ntok FROM documents),
c AS (
  SELECT lang, ntok,
         SUM(ntok) OVER (PARTITION BY lang ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - ntok AS cumb
  FROM t
)
SELECT lang, CAST(FLOOR(cumb / {_PACK_BUDGET}.0) AS BIGINT) AS bin,
       COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS tokens
FROM c GROUP BY lang, bin
""")
def dp_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", "doc_id",
                    F.size(tx.tokens(F.col("text"))).alias("ntok"))
    w = Window.partitionBy("lang").orderBy("doc_id") \
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cumb = F.sum("ntok").over(w) - F.col("ntok")
    return (t.withColumn("bin", F.floor(cumb / _PACK_BUDGET))
            .groupBy("lang", "bin")
            .agg(lcount("n_docs"),
                 F.sum("ntok").cast("bigint").alias("tokens")))


# --------------------------------------------------------------------------
# emb_centroid — per-label embedding centroid (per-dimension mean).
# posexplode fans each vector into (label, dim, val) rows map-side;
# one hash agg with map-side combine computes every (label, dim) mean.
# The classic building block for cluster assignment / outlier scoring
# over an embedding corpus. dim is 1-based to match SQL subscripts.
# --------------------------------------------------------------------------
@register("emb_centroid", oracle="""
SELECT label, i AS dim, round(avg(embedding[i]), 6) AS c
FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
GROUP BY label, i
""")
def emb_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (emb.select("label", F.posexplode("embedding").alias("p", "val"))
            .groupBy("label", (F.col("p") + 1).alias("dim"))
            .agg(F.round(F.avg("val"), 6).alias("c")))


# --------------------------------------------------------------------------
# dd_keep_canonical — the corpus AFTER near-dup removal: every document
# except non-canonical members of near-dup clusters (canonical = min
# doc_id per connected component of the Jaccard pair graph). The
# "action" that turns clustering into a deliverable training corpus:
# a left-anti join of the corpus against the (tiny) drop list.
# --------------------------------------------------------------------------
@register("dd_keep_canonical", oracle=f"""
WITH RECURSIVE s AS (
  SELECT doc_id, lang,
         CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(
                range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
              ELSE [] END AS sh
  FROM (SELECT doc_id, lang, {_TOKS} AS t FROM documents)
), p AS (
  SELECT a.doc_id AS i, b.doc_id AS j
  FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.sh, b.sh)) * 1.0
              / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.5
), e AS (
  SELECT i AS a, j AS b FROM p UNION ALL SELECT j, i FROM p
), n AS (SELECT DISTINCT a AS id FROM e),
reach AS (
  SELECT id, id AS r FROM n
  UNION
  SELECT e.a AS id, reach.r FROM e JOIN reach ON e.b = reach.id
), comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
SELECT d.doc_id, d.lang
FROM documents d
WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster_id)
""")
def dd_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    labels = dd.ngram_jaccard_components(docs, ["lang"], threshold=0.5, k=3)
    drop = labels.filter(F.col("id") != F.col("cluster_id")) \
                 .select(F.col("id").alias("doc_id"))
    return (docs.join(F.broadcast(drop), "doc_id", "left_anti")
            .select("doc_id", "lang"))


# --------------------------------------------------------------------------
# tx_quality_filter — per-language quality gate: keep documents whose
# quality score clears that language's 10th percentile. The per-lang
# thresholds are a tiny agg broadcast back against the corpus — the
# standard "drop the worst decile per language" corpus-filtering step,
# with no second shuffle of the documents themselves. Scores and
# thresholds are rounded to 6dp on both sides so the >= boundary is
# engine-exact.
# --------------------------------------------------------------------------
_QSCORE = ("round(0.4 * least(len({toks}) / 100.0, 1.0)"
           " + 0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / greatest(length(text), 1))"
           " + 0.3 * least({stop} * 5.0 / len({toks}), 1.0), 6)")


@register("tx_quality_filter", oracle=f"""
WITH q AS (
  SELECT doc_id, lang,
         {_QSCORE.format(toks=_TOKS, stop=tx.sql_stopword_hits("text", "en"))} AS quality_score
  FROM documents
), thr AS (
  SELECT lang, round(quantile_cont(quality_score, 0.10), 6) AS p10
  FROM q GROUP BY lang
)
SELECT q.doc_id, q.lang, q.quality_score
FROM q JOIN thr ON q.lang = thr.lang
WHERE q.quality_score >= thr.p10
""")
def tx_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id", "lang",
        tx.quality_score(F.col("text")).alias("quality_score"))
    thr = q.groupBy("lang").agg(
        F.round(F.percentile("quality_score", F.lit(0.10)), 6).alias("p10"))
    return (q.join(F.broadcast(thr), "lang")
            .filter(F.col("quality_score") >= F.col("p10"))
            .select("doc_id", "lang", "quality_score"))


# --------------------------------------------------------------------------
# tx_contamination — benchmark decontamination scan: score every corpus
# document by how many distinct probe bigrams (from a deterministic
# "benchmark" doc subset, doc_id % 97 == 0) it contains. The probe set
# is tiny → broadcast; corpus bigrams explode map-side off the scan and
# hash-join against the broadcast probes with NO corpus shuffle except
# the per-doc count agg. This is the n-gram-overlap decontamination
# pass every training pipeline runs against eval sets.
# --------------------------------------------------------------------------
_BIGRAMS_SPARK = ("transform(sequence(1, size(t) - 1),"
                  " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")
_BIGRAMS_DUCK = ("list_transform(range(1, len(t)),"
                 " i -> t[i] || ' ' || t[i+1])")


@register("tx_contamination", oracle=f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
bg AS (
  SELECT doc_id, unnest(list_distinct({_BIGRAMS_DUCK})) AS bigram
  FROM toks WHERE len(t) >= 2
),
probes AS (
  SELECT DISTINCT bigram FROM bg WHERE doc_id % 97 = 0
)
SELECT bg.doc_id, COUNT(*) AS n_hits
FROM bg JOIN probes ON bg.bigram = probes.bigram
WHERE bg.doc_id % 97 <> 0
GROUP BY bg.doc_id
""")
def tx_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bg = (docs.select("doc_id", tx.tokens(F.col("text")).alias("t"))
          .filter(F.size("t") >= 2)
          .select("doc_id",
                  F.explode(F.array_distinct(F.expr(_BIGRAMS_SPARK)))
                   .alias("bigram")))
    probes = (bg.filter(F.col("doc_id") % 97 == 0)
              .select("bigram").distinct())
    return (bg.filter(F.col("doc_id") % 97 != 0)
            .join(F.broadcast(probes), "bigram")
            .groupBy("doc_id")
            .agg(lcount("n_hits")))


# --------------------------------------------------------------------------
# tx_repetition — Gopher-style repetition quality signals per document:
# the fraction of tokens taken by the single most frequent token, and
# the fraction of bigram occurrences that are repeats. High values on
# either flag boilerplate/spam for corpus filtering.
#
# Scale: token/bigram explodes happen map-side off the scan; both
# aggregations are keyed by (doc_id, gram) with map-side combine, so
# the shuffled rows are (doc_id, gram, count) — bounded by distinct
# grams per doc, not corpus size. Ratios are bigint/double single
# divisions (engine-identical, partition-order independent).
# --------------------------------------------------------------------------
@register("tx_repetition", oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
  WHERE len({_TOKS}) >= 2
),
uni AS (
  SELECT doc_id, unnest(t) AS tok FROM toks
),
uni_cnt AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM uni GROUP BY doc_id, tok
),
uni_doc AS (
  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_tok FROM uni_cnt GROUP BY doc_id
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM toks
),
bg_cnt AS (
  SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram
),
bg_doc AS (
  SELECT doc_id,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_c,
         SUM(c) AS n_bg
  FROM bg_cnt GROUP BY doc_id
)
SELECT u.doc_id,
       u.top_c / CAST(u.n_tok AS DOUBLE) AS top_token_frac,
       b.dup_c / CAST(b.n_bg AS DOUBLE) AS dup_bigram_frac
FROM uni_doc u JOIN bg_doc b ON u.doc_id = b.doc_id
""")
def tx_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select("doc_id", tx.tokens(F.col("text")).alias("t"))
            .filter(F.size("t") >= 2))
    uni_doc = (toks.select("doc_id", F.explode("t").alias("tok"))
               .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
               .groupBy("doc_id")
               .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_tok")))
    bg_expr = ("transform(sequence(1, size(t) - 1),"
               " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")
    bg_doc = (toks.select("doc_id", F.explode(F.expr(bg_expr)).alias("bigram"))
              .groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
              .groupBy("doc_id")
              .agg(F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
                    .alias("dup_c"),
                   F.sum("c").alias("n_bg")))
    return (uni_doc.join(bg_doc, "doc_id")
            .select("doc_id",
                    (F.col("top_c") / F.col("n_tok").cast("double"))
                    .alias("top_token_frac"),
                    (F.col("dup_c") / F.col("n_bg").cast("double"))
                    .alias("dup_bigram_frac")))


# --------------------------------------------------------------------------
# mix_temperature — temperature-based mixture reweighting: per-source
# sampling weights proportional to count^(1/T) with T=2 (sqrt scaling),
# the standard trick to up-weight small sources in a training mixture.
#
# Determinism: sqrt(count) is correctly rounded IEEE on both engines;
# it is scaled to a bigint (floor(sqrt(c)*1e6)) BEFORE the sum, so the
# normalizing total is an exact integer sum (partition-order
# independent) and the weight is one bigint/double division. The total
# is a 1-row aggregate broadcast-cross-joined back — no driver collect.
# Map-only except the tiny per-source count agg.
# --------------------------------------------------------------------------
@register("mix_temperature", oracle="""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(FLOOR(SQRT(COUNT(*)) * 1000000) AS BIGINT) AS scaled_w
  FROM documents GROUP BY source
),
total AS (SELECT SUM(scaled_w) AS tot FROM counts)
SELECT source, n_docs,
       scaled_w / CAST(tot AS DOUBLE) AS mix_weight
FROM counts, total
""")
def mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (docs.groupBy("source")
              .agg(F.count(F.lit(1)).alias("n_docs"))
              .withColumn("scaled_w",
                          F.floor(F.sqrt(F.col("n_docs")) * 1000000)
                           .cast("bigint")))
    total = counts.agg(F.sum("scaled_w").alias("tot"))
    return (counts.crossJoin(F.broadcast(total))
            .select("source", "n_docs",
                    (F.col("scaled_w") / F.col("tot").cast("double"))
                    .alias("mix_weight")))


# --------------------------------------------------------------------------
# emb_quantize — int8 scalar quantization of embedding vectors:
# per-vector symmetric scale 127/max|x|, elementwise floor(x*scale+0.5)
# (floor-form rounding is IEEE-identical across engines, unlike
# round-half banker's variance). Map-only — zero shuffles; the scale is
# let-bound so the HOF evaluates it once per row, not once per element.
# Outputs are integer-exact (q_sum/q_max/q_min) plus the scale at 6dp.
# --------------------------------------------------------------------------
@register("emb_quantize", oracle="""
WITH scaled AS (
  SELECT vec_id, label, embedding,
         127.0 / list_max(list_transform(embedding,
                                         x -> abs(CAST(x AS DOUBLE)))) AS scale
  FROM embeddings
  WHERE list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
), q AS (
  SELECT vec_id, label, scale,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT)) AS qv
  FROM scaled
)
SELECT vec_id, label, ROUND(scale, 6) AS scale_r,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       list_max(qv) AS q_max, list_min(qv) AS q_min
FROM q
""")
def emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctions_data_pipeline_spark.functions.hof import let

    emb = load_table(spark, sf_dir, "embeddings")
    absmax = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))

    def out(scale):
        qv = F.transform("embedding",
                         lambda x: F.floor(x.cast("double") * scale + F.lit(0.5))
                                    .cast("bigint"))
        return F.struct(
            F.round(scale, 6).alias("scale_r"),
            F.aggregate(qv, F.lit(0).cast("bigint"), lambda acc, v: acc + v)
             .alias("q_sum"),
            F.array_max(qv).alias("q_max"),
            F.array_min(qv).alias("q_min"))

    return (emb.filter(absmax > 0)
            .select("vec_id", "label",
                    let(F.lit(127.0) / absmax, out).alias("o"))
            .select("vec_id", "label", "o.scale_r", "o.q_sum", "o.q_max", "o.q_min"))


# --------------------------------------------------------------------------
# q_array_hof — array higher-order functions as first-class engine
# surface: filter/transform/aggregate/exists over the embedding column,
# entirely JVM-side (no Python). L2 norm and positive-mass are ordered
# left-to-right folds, identical on both engines; rounded to 6dp like
# every similarity score in this suite.
# --------------------------------------------------------------------------
@register("q_array_hof", oracle="""
SELECT vec_id, label,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             (acc, v) -> acc + v), 6) AS sq_norm,
       CASE WHEN len(list_filter(embedding, x -> abs(x) > 0.25)) > 0
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS has_large_dim
FROM embeddings
""")
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    return emb.select(
        "vec_id", "label",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.round(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v), 6)
         .alias("sq_norm"),
        F.when(F.exists("embedding", lambda x: F.abs(x) > F.lit(0.25)), 1)
         .otherwise(0).cast("bigint").alias("has_large_dim"))


# --------------------------------------------------------------------------
# emb_pca — distributed PCA spectrum of the embedding corpus: Gram
# matrix accumulated as vectorized numpy partials per partition
# (mapInPandas, Arrow batches), eigendecomposition of the tiny d×d
# covariance on the driver.
#
# Oracle contract (round 9, the q_approx_sketch pattern): the
# eigensolve has no SQL twin (and float partials sum in partition
# order, so its raw spectrum can't hash cross-engine), but the
# covariance TRACE is pure relational algebra once components are
# fixed-point quantized (the emb_whiten quantized-variance form:
# trace = Σ_d (n·Σxi² − (Σxi)²) / n² / 1e6 — one exact-integer
# numerator summed over dims, one identical IEEE tree). The driver
# hashes that exact trace_q per component row plus the REAL spectrum
# invariants a broken eigensolve flips: eigenvalues non-negative and
# non-increasing, explained ratios in [0,1], and Σ-eigenvalues
# (recovered as eig0/ratio0) matching trace_q within quantization +
# rounding tolerance. The exact spectrum stays pinned by
# tests/test_training_ext.py over emb_pca_full.
# --------------------------------------------------------------------------
_PCA_ORACLE = """
WITH x AS (
  SELECT CAST(u.i - 1 AS INT) AS dim,
         CAST(FLOOR(embedding[i]::DOUBLE * 1000 + 0.5) AS BIGINT) AS xi
  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)
),
m AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(xi) AS BIGINT) AS sx,
         CAST(SUM(xi * xi) AS BIGINT) AS sxx
  FROM x GROUP BY dim
),
t AS (
  SELECT CAST(SUM(n * sxx - sx * sx) AS BIGINT) AS num,
         MIN(n) AS n, CAST(count(*) AS BIGINT) AS d
  FROM m
)
SELECT CAST(u.c AS BIGINT) AS component,
       TRUE AS nonneg, TRUE AS nonincreasing, TRUE AS ratio_ok,
       CAST(FLOOR(CAST(num AS DOUBLE) / n / n / 1000000.0 * 1000000 + 0.5)
            AS BIGINT) / 1000000.0 AS trace_q,
       TRUE AS trace_ok
FROM t, unnest(range(0, least(8, d))) u(c)
"""


@register("emb_pca", oracle=_PCA_ORACLE)
def emb_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _math

    from sanctions_data_pipeline_spark.operators.pca import pca_components

    emb = load_table(spark, sf_dir, "embeddings")
    pdf = pca_components(emb, k=8)
    schema = ("component bigint, nonneg boolean, nonincreasing boolean,"
              " ratio_ok boolean, trace_q double, trace_ok boolean")
    if not len(pdf):
        return spark.createDataFrame([], schema)
    # exact cross-engine trace of the quantized covariance: one global
    # integer numerator over (dim)-keyed moments, one identical IEEE
    # division tree (see oracle note)
    q = (emb.select(F.posexplode("embedding").alias("dim", "x"))
         .select("dim", F.floor(F.col("x").cast("double") * F.lit(1000.0)
                                + F.lit(0.5)).cast("bigint").alias("xi"))
         .groupBy("dim")
         .agg(F.count(F.lit(1)).alias("n"), F.sum("xi").alias("sx"),
              F.sum(F.col("xi") * F.col("xi")).alias("sxx"))
         .agg((F.sum(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
              .cast("bigint").alias("num"), F.min("n").alias("n"))
         .first())
    trace_q = _math.floor(float(q["num"]) / q["n"] / q["n"] / 1e6
                          * 1e6 + 0.5) / 1e6
    evs = [float(v) for v in pdf["eigenvalue"]]
    ratios = [float(v) for v in pdf["explained_var"]]
    total = evs[0] / ratios[0] if ratios and ratios[0] > 0 else 0.0
    rows = []
    for i, (ev, ra) in enumerate(zip(evs, ratios)):
        rows.append((
            i,
            ev >= -1e-9,
            i == 0 or ev <= evs[i - 1] + 1e-9,
            -1e-9 <= ra <= 1.0 + 1e-9,
            trace_q,
            (abs(total - trace_q) <= 1e-2 * max(1.0, trace_q)
             if ratios[0] > 0 else trace_q <= 1e-9),
        ))
    return spark.createDataFrame(rows, schema)


def emb_pca_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw spectrum (component, eigenvalue, explained_var) — the pytest
    value-pin surface."""
    from sanctions_data_pipeline_spark.operators.pca import pca_components

    emb = load_table(spark, sf_dir, "embeddings")
    return spark.createDataFrame(pca_components(emb, k=8))


# --------------------------------------------------------------------------
# dp_cap_per_source — per-source document cap (the "max N pages per
# domain" corpus rule): keep a deterministic pseudo-random N per source
# via md5-hash ranking, so the kept subset is stable across runs and
# engines — no seed, no sampling variance. Scale: the window partitions
# by source; a pathologically hot source is the known skew case and
# would take the two-stage top-N (per-partition heap, then merge) —
# noted rather than built because Spark's TakeOrderedAndProject covers
# the global variant and the per-key heap falls out of groupBy+slice.
# --------------------------------------------------------------------------
@register("dp_cap_per_source", oracle="""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 20
""")
def dp_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")),
                                        "doc_id")
    return (docs.select("doc_id", "source",
                        F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 20)
            .select("doc_id", "source"))


# --------------------------------------------------------------------------
# pr_copurchase — damped PageRank over the part co-purchase graph
# (parts linked when bought in the same order): the "importance in a
# similarity graph" primitive for curriculum/centrality-weighted
# sampling. The 8 power iterations run as SORTED per-node folds
# (operators/graph.fold_pagerank — bit-identical doubles on both
# engines), so the oracle unrolls the same 8 iterations as chained
# CTEs (the gr_pagerank discipline at 4x the depth); the numpy
# power-iteration pytest pin stays as a third independent check.
# --------------------------------------------------------------------------
_PR_CP_ITERS = 8


def _pr_copurchase_oracle(iters: int = _PR_CP_ITERS) -> str:
    head = """
co AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
       FROM lineitem WHERE l_partkey < 200),
edges AS (SELECT DISTINCT a.p AS src, b.p AS dst
          FROM co a JOIN co b ON a.o = b.o WHERE a.p <> b.p),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
it0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS pr FROM deg)"""
    its = "".join(f"""
,it{i} AS (
  SELECT e.dst AS node,
         0.15 / (SELECT n FROM nn) + 0.85 * list_aggregate(
           list_sort(list(p.pr / d.d)), 'sum') AS pr
  FROM edges e JOIN it{i - 1} p ON e.src = p.node
               JOIN deg d ON e.src = d.src
  GROUP BY e.dst
)""" for i in range(1, iters + 1))
    return (f"WITH {head}{its}\n"
            f"SELECT node AS id, round(pr, 8) AS rank FROM it{iters}")


@register("pr_copurchase", oracle=_pr_copurchase_oracle())
def pr_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctions_data_pipeline_spark.operators.graph import (
        copurchase_edges, fold_pagerank)

    li = load_table(spark, sf_dir, "lineitem")
    # bound the graph so the demo is wieldy at any sf: parts < 200
    li = li.filter(F.col("l_partkey") < 200)
    return (fold_pagerank(copurchase_edges(li), iters=_PR_CP_ITERS)
            .select(F.col("node").alias("id"),
                    F.round("pr", 8).alias("rank")))


# --------------------------------------------------------------------------
# tx_keywords — per-document keyword extraction: top-3 terms by TF-IDF
# with a deterministic (rounded score DESC, term) ranking. The ranking
# window partitions by doc_id — the same key the tf aggregation
# shuffled on, so Spark reuses the partitioning and the window adds
# only a per-partition sort of tiny per-doc term lists.
# --------------------------------------------------------------------------
@register("tx_keywords", oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> ''
  GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (SELECT COUNT(*) AS nd FROM documents),
scored AS (
  SELECT doc_id, term,
         round(tf * ln(CAST(nd AS DOUBLE) / df), 6) AS tfidf
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, term, tfidf, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rnk
  FROM scored
) WHERE rnk <= 3
""")
def tx_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("term"))
            .filter(F.col("term") != ""))
    # same shape as tx_tfidf: tf feeds the df census AND the scored
    # join — persist so tokenization runs once (round-12 lint)
    tf = (toks.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf"))).persist()
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    scored = (tf.join(df_, "term")
              .crossJoin(F.broadcast(nd))
              .select("doc_id", "term",
                      F.round(F.col("tf")
                              * F.log(F.col("nd").cast("double") / F.col("df")), 6)
                       .alias("tfidf")))
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rnk") <= 3))


# --------------------------------------------------------------------------
# tx_compress_ratio — zlib compressibility per document, the
# repetition/boilerplate signal used alongside the Gopher rules.
# Deterministic (fixed level, no timestamps in the deflate stream).
#
# Oracle contract (round 8, the q_approx_sketch pattern): deflate has
# no SQL twin, so the driver-hashed output carries the exact char
# count plus two REAL deflate invariants computed in-query —
# decompress(compress(text)) == text (round-trip identity) and
# comp_len <= compressBound(utf8_len) = utf8_len + (utf8_len>>12)
# + (utf8_len>>14) + (utf8_len>>25) + 13 (zlib's own published
# worst case, zlib/compress.c:compressBound). The naive 5-bytes-per-
# 64KiB-stored-block bound is NOT safe at level 6 / memLevel 8: the
# deflate symbol buffer (lit_bufsize ≈ 16 KiB) flushes a stored
# block roughly every 16 KiB of incompressible input, so overhead
# accrues ~4× faster than the 65535-byte block framing suggests —
# an incompressible doc of ~20 KiB already exceeds the naive bound.
# compressBound covers that regime for ANY input size; the oracle
# states the invariants as literals.
# A codec regression (corruption, truncation, runaway expansion)
# flips a boolean and fails the hash; the exact per-doc RATIOS stay
# pinned by tests/test_training_ext.py over tx_compress_ratio_full.
# --------------------------------------------------------------------------
def tx_compress_ratio_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-bearing variant — the pytest value-pin surface."""
    docs = load_table(spark, sf_dir, "documents")
    audit = tx.compression_audit_udf()(F.col("text"))
    return docs.select("doc_id", F.length("text").alias("n_chars_calc"),
                       F.octet_length("text").alias("n_bytes"),
                       audit.alias("a")).select(
        "doc_id", "n_chars_calc", "n_bytes", "a.compress_ratio",
        "a.comp_len", "a.roundtrip_ok")


@register("tx_compress_ratio", oracle="""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_calc,
       TRUE AS roundtrip_ok, TRUE AS within_deflate_bound
FROM documents
""")
def tx_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    full = tx_compress_ratio_full(spark, sf_dir)
    return full.select(
        "doc_id", F.col("n_chars_calc").cast("bigint").alias("n_chars_calc"),
        "roundtrip_ok",
        (F.col("comp_len") <= F.col("n_bytes")
         + F.shiftright(F.col("n_bytes"), 12)
         + F.shiftright(F.col("n_bytes"), 14)
         + F.shiftright(F.col("n_bytes"), 25) + F.lit(13))
        .alias("within_deflate_bound"))


# --------------------------------------------------------------------------
# ml_group_fit — per-group model fitting via groupBy().applyInPandas:
# one OLS fit (token count ~ char count) per language, each group
# handled by one vectorized numpy call. This is the grouped-training
# primitive (per-segment calibration, per-language thresholds, ...);
# state never leaves the executor and only (group, coefficients) rows
# come back. The fit is the CLOSED-FORM simple regression from exact
# integer moments (n, Σx, Σy, Σxy, Σx² in arbitrary-precision python
# ints), so slope = (nΣxy − ΣxΣy)/(nΣx² − Σx²) is ONE double division
# of exact integers and intercept one further identical IEEE tree —
# the same values DuckDB computes from the same moments (exact while
# the moment products stay under 2^53 — the fixture regime by orders
# of magnitude). The lstsq pytest pin stays as the numerical check
# that the closed form IS the least-squares solution.
# --------------------------------------------------------------------------
_GROUP_FIT_ORACLE = f"""
WITH f AS (
  SELECT lang, CAST(length(text) AS BIGINT) AS x,
         CAST(len({_TOKS}) AS BIGINT) AS y
  FROM documents
),
m AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM f GROUP BY lang
),
s AS (
  SELECT lang, n, sx, sy,
         CASE WHEN n * sxx - sx * sx > 0
              THEN CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope
  FROM m
)
SELECT lang, round(slope, 6) AS slope,
       round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept,
       n AS n_docs
FROM s
"""


@register("ml_group_fit", oracle=_GROUP_FIT_ORACLE)
def ml_group_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        "lang",
        F.length("text").cast("long").alias("x"),
        F.size(tx.tokens(F.col("text"))).cast("long").alias("y"))

    def fit(pdf):
        xs = [int(v) for v in pdf["x"]]
        ys = [int(v) for v in pdf["y"]]
        n, sx, sy = len(xs), sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        den = n * sxx - sx * sx            # exact python int
        if den > 0:
            slope = float(n * sxy - sx * sy) / float(den)
            intercept = (float(sy) - slope * float(sx)) / float(n)
            slope_r, icept_r = round(slope, 6), round(intercept, 6)
        else:
            slope_r = icept_r = None
        return pd.DataFrame({
            "lang": [pdf["lang"].iloc[0]],
            "slope": [slope_r],
            "intercept": [icept_r],
            "n_docs": [n],
        })

    fit.__annotations__ = {"pdf": pd.DataFrame, "return": pd.DataFrame}
    return (feats.groupBy("lang")
            .applyInPandas(fit,
                           "lang string, slope double, intercept double, "
                           "n_docs long"))


# --------------------------------------------------------------------------
# dd_span_dedup — cross-document duplicated-SPAN fraction (RefinedWeb /
# "exact substring dedup" at 8-gram granularity): for every document,
# the fraction of its 8-word span occurrences that also appear in at
# least one OTHER document, plus a keep/drop verdict (drop when a
# majority of spans are corpus-duplicated). Distinct from
# tx_repetition, which measures WITHIN-doc repetition only.
#
# Scale: span hashes are 8-byte longs chained from per-token hashes in
# one codegen'd projection (never span strings); the span-frequency agg
# is the only corpus-wide shuffle and carries (hash, doc_id) pairs; the
# per-doc rollup reuses the hash-partitioned exchange for the join
# probe. This is exactly the shuffle profile of suffix-array-free exact
# substring dedup at corpus scale.
# --------------------------------------------------------------------------
@register("dd_span_dedup", headline=True, oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - 6),
                i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
                               toks[i+4], toks[i+5], toks[i+6], toks[i+7])))
           AS span
  FROM t WHERE len(toks) >= 8
), sdf AS (
  SELECT span, COUNT(DISTINCT doc_id) AS df FROM s GROUP BY span
)
SELECT s.doc_id, COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       round(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS dup_frac,
       CAST(CASE WHEN 2 * SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) < COUNT(*)
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM s JOIN sdf USING (span)
GROUP BY s.doc_id
""")
def dd_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctions_data_pipeline_spark.catalog import widen_small_scan

    docs = widen_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    # ex feeds the span-df agg AND the scoring join: persist so the
    # span-hash explode runs once, not twice
    ex = docs.select(
        "doc_id",
        F.explode(dd.span_hashes(F.col("text"), 8)).alias("h")).persist()
    sdf = ex.groupBy("h").agg(F.count_distinct("doc_id").alias("df"))
    dup = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).cast("bigint")
    return (ex.join(sdf, "h")
            .groupBy("doc_id")
            .agg(lcount("n_spans"), dup.alias("n_dup_spans"))
            .select("doc_id", "n_spans", "n_dup_spans",
                    F.round(F.col("n_dup_spans") / F.col("n_spans"), 6)
                     .alias("dup_frac"),
                    (2 * F.col("n_dup_spans") < F.col("n_spans"))
                     .cast("bigint").alias("keep")))


# --------------------------------------------------------------------------
# dp_shuffle — deterministic global training-order shuffle + sharding:
# every document gets a (shard, pos) address from portable md5 hashes,
# so the training order is reproducible across runs, engines, and
# cluster sizes (no rand(), no partition-order dependence). Two-hex-char
# shards give 256 output streams; a real deployment widens the prefix
# (3 chars -> 4096) so each shard's window sort stays executor-sized.
# The only shuffle is the per-shard ROW_NUMBER sort — map-only shard
# assignment, then one bounded-partition window.
# --------------------------------------------------------------------------
@register("dp_shuffle", oracle="""
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
            AS BIGINT) AS pos
FROM (SELECT doc_id,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS shard,
             md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents)
""")
def dp_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    addressed = docs.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("shard"),
        F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
         .alias("h"))
    w = W.partitionBy("shard").orderBy("h", "doc_id")
    return (addressed
            .select("doc_id", "shard",
                    F.row_number().over(w).cast("bigint").alias("pos")))


# --------------------------------------------------------------------------
# corpus_e2e — the END-TO-END corpus build, composed from the pieces
# above and verified cross-engine as ONE query: exact dedup (min doc_id
# per normalized-text hash) -> near-dup removal (ngram-Jaccard pairs ->
# connected components -> keep cluster canonical) -> leakage-safe
# deterministic split -> per-(split, lang) document and token counts.
# This is the deliverable shape of a training-data pipeline: every
# stage is shuffle-minimal (hash agg, prefix-filtered candidate join,
# O(log d) label propagation, map-only split) and the final summary is
# the only row-reducing aggregation.
# --------------------------------------------------------------------------
@register("corpus_e2e", oracle=f"""
WITH RECURSIVE k AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5({_NORM})
), d1 AS (
  SELECT d.* FROM documents d JOIN k USING (doc_id)
), s AS (
  SELECT doc_id, lang,
         CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(
                range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
              ELSE [] END AS sh
  FROM (SELECT doc_id, lang, {_TOKS} AS t FROM d1)
), p AS (
  SELECT a.doc_id AS i, b.doc_id AS j
  FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.sh, b.sh)) * 1.0
              / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.5
), e AS (
  SELECT i AS a, j AS b FROM p UNION ALL SELECT j, i FROM p
), n AS (SELECT DISTINCT a AS id FROM e),
reach AS (
  SELECT id, id AS r FROM n
  UNION
  SELECT e.a AS id, reach.r FROM e JOIN reach ON e.b = reach.id
), comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
d2 AS (
  SELECT * FROM d1
  WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster_id)
)
SELECT CASE WHEN {_BUCKET} < 80 THEN 'train'
            WHEN {_BUCKET} < 90 THEN 'valid' ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs,
       CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
FROM d2
GROUP BY 1, lang
""")
def corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # stage 1: exact dedup — survivors are min-doc_id per text hash
    keepers = dd.exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    d1 = docs.join(keepers, "doc_id", "left_semi")
    # stage 2: near-dup removal on the survivors
    pairs = dd.ngram_jaccard_pairs(d1, ["lang"], threshold=0.5, k=3)
    comp = dd.connected_components(pairs)
    drop = comp.filter(F.col("id") != F.col("cluster_id")) \
               .select(F.col("id").alias("doc_id"))
    d2 = d1.join(drop, "doc_id", "left_anti")
    # stage 3: leakage-safe deterministic split + summary
    b = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
         .cast("bigint") % 100)
    return (d2.select(
                F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
                 .alias("split"),
                "lang",
                F.size(tx.tokens(F.col("text"))).alias("n_toks"))
            .groupBy("split", "lang")
            .agg(lcount("n_docs"),
                 F.sum("n_toks").cast("bigint").alias("n_tokens")))


# --------------------------------------------------------------------------
# sim_ann_pq — product-quantization ANN: vectors compressed to m uint8
# codes (32x at d=64/m=8), ADC-scored against broadcast per-query
# lookup tables, exactly re-ranked on true cosines. The PQ codebooks
# come from a driver-trained bounded sample (FAISS-style), which no
# SQL engine mirrors — registered (round 10) as the same brute-force
# rank-domination invariant lattice as sim_ann_ivf: one row per
# query, n_returned exactly k, PQ's r-th cosine <= brute force's at
# every rank (PQ re-ranks a candidate SUBSET on true cosines), and
# validity bounds. Exact result lists + the recall pin stay on
# sim_ann_pq_full (tests/test_ivf.py).
# --------------------------------------------------------------------------
def _ann_domination_lattice(ivf: DataFrame, bf: DataFrame) -> DataFrame:
    """(query_id, n_returned, rankwise_dominated_ok, neighbors_valid_ok)
    — the shared invariant-lane shape for subset-scanning ANN ops
    vs the brute-force baseline (see sim_ann_ivf)."""
    eps = F.lit(2e-6)
    joined = ivf.join(
        bf.select("query_id", "rnk", F.col("cos").alias("bf_cos")),
        ["query_id", "rnk"], "left")
    # A missing brute-force rank (null bf_cos from the left join) must
    # FAIL the invariant, not be skipped: bool_and ignores nulls, so a
    # starved baseline would silently weaken the check without the
    # coalesce-to-False.
    return (joined.groupBy("query_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_returned"),
                 F.bool_and(F.coalesce(
                     F.col("cos") <= F.col("bf_cos") + eps, F.lit(False)))
                  .alias("rankwise_dominated_ok"),
                 F.bool_and(F.coalesce(
                     (F.col("neighbor_id") != F.col("query_id"))
                     & (F.abs("cos") <= F.lit(1.0) + eps), F.lit(False)))
                  .alias("neighbors_valid_ok")))


_PQ_ORACLE = """
SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_returned,
       TRUE AS rankwise_dominated_ok, TRUE AS neighbors_valid_ok
FROM embeddings WHERE vec_id < 10
"""


@register("sim_ann_pq", oracle=_PQ_ORACLE)
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 10)
    bf = sim.brute_force_topk(queries, vecs, k=5)
    return _ann_domination_lattice(sim_ann_pq_full(spark, sf_dir), bf)


def sim_ann_pq_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (query_id, neighbor_id, cos, rnk) PQ results — the pytest
    value-pin surface (the pre-round-10 registered output)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.filter(F.col("vec_id") < 10)
    return (sim.pq_topk(queries, vecs, k=5, m=8, ksub=16, rerank=8)
            .withColumn("rnk", F.col("rnk").cast("bigint")))


# --------------------------------------------------------------------------
# tt_leakage_check — cross-split contamination audit: near-dup pairs
# whose members landed in DIFFERENT splits (the leakage that inflates
# eval scores, and the reason corpus_e2e dedups BEFORE splitting).
# Counts pairs per (split_i, split_j) bucket; a clean pipeline shows
# zero off-diagonal mass after near-dup removal. Reuses the exact
# AllPairs Jaccard pair producer and the deterministic split. The
# split map is CORPUS-sized, so it is never broadcast — the near-dup
# PAIR list is the small side, and AQE broadcasts it into both probe
# joins at runtime (the map-only split assignment never shuffles).
# --------------------------------------------------------------------------
@register("tt_leakage_check", oracle=f"""
WITH s AS (
  SELECT doc_id, lang,
         CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(
                range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
              ELSE [] END AS sh
  FROM (SELECT doc_id, lang, {_TOKS} AS t FROM documents)
), p AS (
  SELECT a.doc_id AS i, b.doc_id AS j
  FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.sh, b.sh)) * 1.0
              / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.5
), sp AS (
  SELECT doc_id,
         CASE WHEN {_BUCKET} < 80 THEN 'train'
              WHEN {_BUCKET} < 90 THEN 'valid' ELSE 'test' END AS split
  FROM documents
)
SELECT si.split AS split_i, sj.split AS split_j,
       COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN si.split <> sj.split THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leaks
FROM p JOIN sp si ON p.i = si.doc_id
       JOIN sp sj ON p.j = sj.doc_id
GROUP BY si.split, sj.split
""")
def tt_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, ["lang"], threshold=0.5, k=3)
    b = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
         .cast("bigint") % 100)
    splits = docs.select(
        "doc_id",
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
         .alias("split"))
    si = splits.select(F.col("doc_id").alias("i"),
                       F.col("split").alias("split_i"))
    sj = splits.select(F.col("doc_id").alias("j"),
                       F.col("split").alias("split_j"))
    return (pairs.join(si, "i").join(sj, "j")
            .groupBy("split_i", "split_j")
            .agg(lcount("n_pairs"),
                 F.sum(F.when(F.col("split_i") != F.col("split_j"), 1)
                        .otherwise(0)).cast("bigint").alias("n_leaks")))


# --------------------------------------------------------------------------
# ml_logreg — distributed full-batch logistic regression (is the doc
# English?) on length/token features: per-partition numpy gradient
# partials via mapInPandas, driver update loop — the treeAggregate
# shape MLlib's optimizers use, with per-iteration traffic of d+1
# doubles per partition and the corpus never leaving executors.
#
# Oracle contract (round 10, the tok_fertility invariant-lane
# pattern): the trained weights are float sums whose last ulp depends
# on partition combine order, so the registered output is the dense
# (bias, w1, w2) position lattice carrying the exact corpus-count
# lane plus two REAL training invariants stated as literals:
#   weight_finite_ok   every coefficient is finite (a diverged lr or
#                      NaN feature flips this),
#   loss_below_null_ok the fitted model's mean log-loss is below the
#                      null model's exact ln 2 by a 1e-3 margin (the
#                      did-it-learn check — an optimizer that stops
#                      updating, flips its gradient sign, or breaks
#                      standardization fails it; the fixture's
#                      weak-signal margin is ~8.3e-3 at sf0.01, and
#                      loss is deterministic to ~1e-12).
# Exact weights stay pinned (driver-recompute + learning assertions)
# on ml_logreg_full in tests/test_training_ext.py.
# --------------------------------------------------------------------------
_LOGREG_ORACLE = """
SELECT CAST(u.p AS INT) AS pos,
       (SELECT count(*) FROM documents) AS n_obs,
       TRUE AS weight_finite_ok, TRUE AS loss_below_null_ok
FROM range(0, 3) u(p)
"""


@register("ml_logreg", oracle=_LOGREG_ORACLE)
def ml_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from sanctions_data_pipeline_spark.operators.optim import logreg_loss

    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        (F.col("lang") == "en").cast("int").alias("is_en"),
        F.col("n_chars").cast("double").alias("f_chars"),
        F.size(tx.tokens(F.col("text"))).cast("double").alias("f_tokens"))
    w = [r.weight for r in
         ml_logreg_full(spark, sf_dir).orderBy("pos").collect()]
    loss = logreg_loss(feats, "is_en", ["f_chars", "f_tokens"], w)
    finite = all(math.isfinite(x) for x in w)
    learned = loss < math.log(2.0) - 1e-3
    n_obs = docs.count()
    return spark.createDataFrame(
        [(i, n_obs, finite, learned) for i in range(len(w))],
        "pos int, n_obs bigint, weight_finite_ok boolean, "
        "loss_below_null_ok boolean")


def ml_logreg_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (pos, weight) rows — the pytest value-pin surface (the
    pre-round-10 registered output)."""
    from sanctions_data_pipeline_spark.operators.optim import logreg_fit

    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        (F.col("lang") == "en").cast("int").alias("is_en"),
        F.col("n_chars").cast("double").alias("f_chars"),
        F.size(tx.tokens(F.col("text"))).cast("double").alias("f_tokens"))
    w = logreg_fit(feats, "is_en", ["f_chars", "f_tokens"],
                   n_iters=25, lr=0.5)
    return spark.createDataFrame(
        [(i, round(float(x), 6)) for i, x in enumerate(w)],
        "pos int, weight double")


# --------------------------------------------------------------------------
# dp_pack_sequences — materialized training sequences: token ids per
# doc (hash-vocab), docs concatenated WITH an EOD separator in a
# deterministic md5 order, the concatenation sliced into fixed
# 512-token windows. Packing happens within (lang, bucket-of-16-docs)
# shards — the scale-correct form: per-shard arrays stay bounded
# (~16 docs), so no task ever holds a language's whole corpus, exactly
# how production packers shard before concatenating. JVM-side
# throughout: transform/flatten/slice on arrays, one window rank +
# one groupBy shuffle.
#
# The registered query emits the full shard accounting — every
# (lang, bucket, win_idx) window with its token count — which the SQL
# oracle reproduces end-to-end (same md5 doc order, same 16-doc
# bucketing, same 512-slice arithmetic), so window layout is
# hash-verified cross-engine. The window CONTENT (hash-vocab ids via
# xxhash64, which has no DuckDB twin) stays pinned by the
# determinism/conservation pytest over `dp_pack_sequences_full`.
# --------------------------------------------------------------------------
_EOD = 50_000  # one past the hash-vocab max id
_SEQ_LEN = 512

_PACK_SEQ_ORACLE = f"""
WITH d AS (
  SELECT lang, doc_id, CAST(len({_TOKS}) + 1 AS BIGINT) AS n
  FROM documents
),
r AS (
  SELECT lang, n,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           - 1 AS rnk
  FROM d
),
b AS (
  SELECT lang, CAST(rnk // 16 AS INT) AS bucket,
         CAST(SUM(n) AS BIGINT) AS flat
  FROM r GROUP BY 1, 2
)
SELECT lang, bucket, CAST(u.i AS INT) AS win_idx,
       CAST(LEAST({_SEQ_LEN}, flat - u.i * {_SEQ_LEN}) AS INT) AS n_tokens
FROM b, unnest(range(0, (flat + {_SEQ_LEN - 1}) // {_SEQ_LEN})) u(i)
"""


def dp_pack_sequences_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing with window content (ids_md5) — the pytest surface."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    ids = F.transform(tx.tokens(F.col("text")),
                      lambda t: F.pmod(F.xxhash64(t), F.lit(_EOD)))
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")),
                                      "doc_id")
    ranked = docs.select(
        "lang",
        F.concat(ids, F.array(F.lit(_EOD).cast("bigint"))).alias("ids"),
        ((F.row_number().over(w) - 1) / 16).cast("int").alias("bucket"),
        (F.row_number().over(w) - 1).alias("rnk"))
    packed = (ranked.groupBy("lang", "bucket")
              .agg(F.flatten(F.expr(
                  "transform(array_sort(collect_list(struct(rnk, ids))),"
                  " x -> x.ids)")).alias("flat")))
    n_win = F.ceil(F.size("flat") / F.lit(_SEQ_LEN)).cast("int")
    wins = packed.select(
        "lang", "bucket",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), n_win - 1),
            lambda i: F.slice("flat", i * _SEQ_LEN + 1, _SEQ_LEN)))
         .alias("win_idx", "input_ids"))
    return wins.select(
        "lang", "bucket", "win_idx",
        F.size("input_ids").alias("n_tokens"),
        F.md5(F.cast("string", F.to_json("input_ids"))).alias("ids_md5"))


@register("dp_pack_sequences", oracle=_PACK_SEQ_ORACLE)
def dp_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dp_pack_sequences_full(spark, sf_dir).select(
        "lang", "bucket", "win_idx", "n_tokens")


# --------------------------------------------------------------------------
# gr_bfs_layers — multi-hop reachability over the part co-purchase
# graph from the 3 lowest part ids: layer = min hops from any seed.
# The "expand a seed set through a similarity graph" primitive
# (active-learning / contamination-spread analyses). The oracle
# unrolls the bounded hop count as chained min-union CTEs (layer =
# min round a node first appears — exactly BFS); the driver-side BFS
# replay in tests stays as a third independent check.
# --------------------------------------------------------------------------
_BFS_HOPS = 4

_BFS_ORACLE = (
    """
WITH co AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem WHERE l_partkey < 200),
edges AS (SELECT DISTINCT a.p AS src, b.p AS dst
          FROM co a JOIN co b ON a.o = b.o WHERE a.p <> b.p),
l0 AS (SELECT CAST(unnest([0, 1, 2]) AS BIGINT) AS id,
              CAST(0 AS BIGINT) AS layer)"""
    + "".join(
        f"""
,l{k} AS (SELECT id, min(layer) AS layer FROM (
    SELECT id, layer FROM l{k - 1}
    UNION ALL
    SELECT e.dst AS id, CAST({k} AS BIGINT) AS layer
    FROM edges e JOIN l{k - 1} p ON p.id = e.src
  ) GROUP BY id)"""
        for k in range(1, _BFS_HOPS + 1))
    + f"""
SELECT id, CAST(layer AS BIGINT) AS layer FROM l{_BFS_HOPS}"""
)


@register("gr_bfs_layers", oracle=_BFS_ORACLE)
def gr_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctions_data_pipeline_spark.operators.graph import (
        bfs_layers, copurchase_edges)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 200)
    edges = copurchase_edges(li)
    seeds = spark.range(3).select(F.col("id"))
    return (bfs_layers(edges, seeds, max_hops=_BFS_HOPS, id_col="id")
            .select("id", F.col("layer").cast("bigint").alias("layer")))


# --------------------------------------------------------------------------
# emb_outliers — per-label embedding outliers: the 5 vectors farthest
# (lowest cosine) from their OWN label's centroid. Composes
# emb_centroid: per-dim means are rounded to 6dp FIRST on both engines
# (making the joined centroid bit-identical cross-engine), then the
# sequential-fold cosine is exact, so the ranking needs no tolerance.
# The data-cleaning primitive for mislabeled/corrupt embedding rows.
# Scale: centroids are |labels| x d rows (broadcast); scoring is
# map-side; the only shuffles are the centroid agg and the per-label
# top-k window over bounded label cardinality.
# --------------------------------------------------------------------------
@register("emb_outliers", oracle=f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
cm AS (
  SELECT label, i AS pos, round(avg(embedding[i]), 6) AS m
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
  GROUP BY label, i
), c AS (
  SELECT label, list(m ORDER BY pos) AS cent FROM cm GROUP BY label
), scored AS (
  SELECT e.vec_id, e.label,
         {_COS.format(a="e.v", b="c.cent")} AS cos
  FROM e JOIN c USING (label)
)
SELECT label, vec_id, cos, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                               ORDER BY cos, vec_id) AS rnk
  FROM scored)
WHERE rnk <= 5
""")
def emb_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    cent = (emb.select("label", F.posexplode("embedding").alias("p", "val"))
            .groupBy("label", (F.col("p") + 1).alias("dim"))
            .agg(F.round(F.avg("val"), 6).alias("m"))
            .groupBy("label")
            .agg(F.expr("transform(array_sort(collect_list(struct(dim, m))),"
                        " x -> x.m)").alias("cent")))
    v = F.transform("embedding", lambda x: x.cast("double"))
    scored = (emb.join(F.broadcast(cent), "label")
              .select("label", "vec_id",
                      F.round(sim.dot(v, F.col("cent"))
                              / (F.sqrt(sim.dot(v, v))
                                 * F.sqrt(sim.dot(F.col("cent"), F.col("cent")))),
                              6).alias("cos")))
    w = W.partitionBy("label").orderBy("cos", "vec_id")
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("label", "vec_id", "cos",
                    F.col("rnk").cast("bigint").alias("rnk")))


# --------------------------------------------------------------------------
# mix_dedup_priority — cross-SOURCE dedup with source priority: when
# the same normalized content appears in several sources, keep the
# copy from the most-trusted source (lower priority rank wins; doc_id
# breaks ties), the curated-beats-crawl rule every corpus merge needs.
# One min_by hash agg — single shuffle on the content hash, map-side
# combine; the priority map is a tiny broadcast dim.
# --------------------------------------------------------------------------
_SRC_PRIO = [(f"src{i}", (7 * i + 3) % 20) for i in range(20)]


@register("mix_dedup_priority", oracle=f"""
WITH prio(source, prio) AS (VALUES {", ".join(f"('{s}', {p})" for s, p in _SRC_PRIO)}),
h AS (
  SELECT d.doc_id, d.source, p.prio,
         md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))) AS text_hash
  FROM documents d JOIN prio p ON d.source = p.source
)
SELECT text_hash,
       MIN(lpad(CAST(prio AS VARCHAR), 2, '0') || ':'
           || lpad(CAST(doc_id AS VARCHAR), 12, '0')) AS win_key,
       COUNT(*) AS n_copies
FROM h GROUP BY text_hash
""")
def mix_dedup_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    prio = F.broadcast(docs.sparkSession.createDataFrame(
        _SRC_PRIO, "source string, prio int"))
    h = docs.join(prio, "source").select(
        F.md5(dd.normalized_text(F.col("text"))).alias("text_hash"),
        F.concat(F.lpad(F.col("prio").cast("string"), 2, "0"), F.lit(":"),
                 F.lpad(F.col("doc_id").cast("string"), 12, "0"))
         .alias("win_key"))
    return (h.groupBy("text_hash")
            .agg(F.min("win_key").alias("win_key"), lcount("n_copies")))


# --------------------------------------------------------------------------
# mix_epochs — epoch planning for a token budget: each source's target
# share is weight/50 of a 1M-token budget; epochs = ceil(target /
# source_tokens) says how many passes over the source the mixture
# needs (the up-sampling repeat count small curated sources get).
# Integer-exact ceiling division on both engines — no float budget
# math. Map-side token count + one agg; weights broadcast.
# --------------------------------------------------------------------------
_EPOCH_BUDGET = 1_000_000
_EPOCH_W = [(f"src{i}", i % 4 + 1) for i in range(20)]  # sum of weights = 50


@register("mix_epochs", oracle=f"""
WITH w(source, weight) AS (VALUES {", ".join(f"('{s}', {p})" for s, p in _EPOCH_W)}),
tok AS (
  SELECT d.source, CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents d GROUP BY d.source
)
SELECT t.source, t.n_tokens, w.weight,
       (w.weight * {_EPOCH_BUDGET} + 50 * t.n_tokens - 1)
         // (50 * t.n_tokens) AS epochs
FROM tok t JOIN w ON t.source = w.source
""")
def mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    weights = F.broadcast(docs.sparkSession.createDataFrame(
        _EPOCH_W, "source string, weight int"))
    tok = (docs.groupBy("source")
           .agg(F.sum(F.size(tx.tokens(F.col("text")))).cast("bigint")
                 .alias("n_tokens")))
    epochs = F.expr(f"(weight * {_EPOCH_BUDGET}L + 50L * n_tokens - 1)"
                    " div (50L * n_tokens)")
    return (tok.join(weights, "source")
            .select("source", "n_tokens", "weight", epochs.alias("epochs")))


# --------------------------------------------------------------------------
# sim_range_search — radius query: ALL corpus neighbors with
# cosine >= t per (broadcast) query. The retrieval shape contamination
# sweeps and RAG-dedup want; zero shuffles — one map-side corpus scan.
# --------------------------------------------------------------------------
@register("sim_range_search", oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10)
SELECT query_id, e.vec_id AS neighbor_id, {_COS.format(a="qv", b="v")} AS cos
FROM q, e
WHERE e.vec_id <> query_id AND {_COS.format(a="qv", b="v")} >= 0.35
""")
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    return sim.range_search(vecs.filter(F.col("vec_id") < 10), vecs, 0.35)


# --------------------------------------------------------------------------
# emb_knn_graph — k-NN graph over the whole embedding set (substrate
# for graph clustering / SemDeDup pruning). Exact quadratic baseline
# here; at corpus scale pass an IVF cell / LSH bucket as the block key
# (see operators.similarity.knn_graph docstring).
# --------------------------------------------------------------------------
@register("emb_knn_graph", oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
         {_COS.format(a="a.v", b="b.v")} AS cos
  FROM e a, e b WHERE a.vec_id <> b.vec_id
)
SELECT src_id, dst_id, cos, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
                               ORDER BY cos DESC, dst_id) AS rnk
  FROM scored
) WHERE rnk <= 3
""")
def emb_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    return (sim.knn_graph(vecs, k=3)
            .withColumn("rnk", F.col("rnk").cast("bigint")))


# --------------------------------------------------------------------------
# emb_semantic_dedup — SemDeDup (Abbas et al., arXiv:2303.09540):
# k-means cluster -> within-cluster cosine pairs -> keep the most
# prototypical member of each over-threshold pair.
#
# Oracle contract (round 10, the tok_fertility invariant-lane
# pattern): the k-means cells are not SQL-expressible, so the
# registered output is one row per embedding (vec_id — the exact
# relational lane) carrying the FIXED-POINT of the SemDeDup keep rule
# as booleans, stated as literals:
#   keep_flag_valid_ok  keep ∈ {0, 1};
#   drop_rule_ok        dropped  ⇔  SOME over-threshold within-cell
#                       partner is strictly more prototypical (higher
#                       centroid cosine, ties to the smaller id) —
#                       recomputed from the emitted pairs + scores,
#                       so a broken keep join, tie rule or pair
#                       filter flips it.
# The exact (vec_id, cell, keep) rows stay pinned by pytest on
# emb_semantic_dedup_full (the pre-round-10 registered output).
# --------------------------------------------------------------------------
_SEMDEDUP_ORACLE = """
SELECT vec_id, TRUE AS keep_flag_valid_ok, TRUE AS drop_rule_ok
FROM embeddings
"""


@register("emb_semantic_dedup", oracle=_SEMDEDUP_ORACLE)
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    # Fit ONCE and thread the centroids into both the checker lanes and
    # semantic_dedup below: drop_rule_ok must compare keep flags against
    # the SAME cells, not a second independent fit (and the single fit
    # halves the op's trainer cost).
    cents = sim.kmeans_fit(vecs, 8)
    base = sim.assign_cells(
        vecs.select("vec_id", sim.as_double(F.col("embedding")).alias("v")),
        cents)
    cent_arr = F.array(*[sim._centroid_lit(c) for c in cents])
    # the checker's own lattice consumes scored four ways too (pairs +
    # both di/dj probes): persist, mirroring the semantic_dedup fix
    scored = base.withColumn(
        "cdot",
        F.round(sim.dot(F.col("v"), F.element_at(cent_arr, F.col("cell")))
                / F.sqrt(sim.dot(F.col("v"), F.col("v"))), 6)).persist()
    pairs = sim.cosine_pairs(
        scored.select("cell", "vec_id", "v"), ["cell"], 0.85,
        id_col="vec_id", vec_col="v")
    sc = scored.select(F.col("vec_id").alias("__sid"), "cdot")
    both = (pairs
            .join(sc.withColumnRenamed("__sid", "i")
                    .withColumnRenamed("cdot", "di"), "i")
            .join(sc.withColumnRenamed("__sid", "j")
                    .withColumnRenamed("cdot", "dj"), "j"))
    # each pair names its loser exactly once (the semantic_dedup rule)
    losers = (both.select(
        F.when((F.col("di") < F.col("dj"))
               | ((F.col("di") == F.col("dj")) & (F.col("i") > F.col("j"))),
               F.col("i")).otherwise(F.col("j")).alias("vec_id"))
        .distinct().withColumn("__is_loser", F.lit(1)))
    keep = sim.semantic_dedup(vecs, threshold=0.85, n_centroids=8,
                              cents=cents).select("vec_id", "keep")
    return (keep.join(losers, "vec_id", "left")
            .select("vec_id",
                    F.col("keep").isin(0, 1).alias("keep_flag_valid_ok"),
                    ((F.col("keep") == 0)
                     == F.col("__is_loser").isNotNull())
                    .alias("drop_rule_ok")))


def emb_semantic_dedup_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (vec_id, cell, keep) rows — the pytest value-pin surface
    (the pre-round-10 registered output)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup(vecs, threshold=0.85, n_centroids=8)


# --------------------------------------------------------------------------
# tx_entropy — unigram token entropy + vocab size per document (the
# classic low-entropy filter: SEO keyword stuffing and boilerplate
# score near 0; natural prose near log2(vocab)). The entropy fold runs
# over the SORTED per-token count list on both engines, so the double
# accumulation order is identical and the value hash-compares exactly.
# --------------------------------------------------------------------------
@register("tx_entropy", oracle=f"""
WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM t GROUP BY doc_id, tok),
a AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_vocab,
             list_sort(list(CAST(cnt AS DOUBLE))) AS cl
      FROM c GROUP BY doc_id)
SELECT doc_id, n_tokens, n_vocab,
       round(log2(n_tokens) - list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                            list_transform(cl, x -> x * log2(x))),
               (acc, x) -> acc + x) / n_tokens, 6) AS entropy
FROM a
""")
def tx_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (docs.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok"))
              .groupBy("doc_id", "tok").agg(lcount("cnt")))
    ent_fold = F.aggregate(
        F.array_sort(F.collect_list(F.col("cnt").cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x * F.log2(x))
    return (counts.groupBy("doc_id")
            .agg(F.sum("cnt").cast("bigint").alias("n_tokens"),
                 lcount("n_vocab"),
                 ent_fold.alias("__s"))
            .select("doc_id", "n_tokens", "n_vocab",
                    F.round(F.log2("n_tokens") - F.col("__s") / F.col("n_tokens"), 6)
                     .alias("entropy")))


# --------------------------------------------------------------------------
# corpus_report — corpus-composition report per (source, lang): doc
# counts, token totals, average length, and corpus share. The mixture
# dashboard every data curation loop starts from; one partial-agg
# shuffle, share via a broadcast scalar join.
# --------------------------------------------------------------------------
@register("corpus_report", oracle=f"""
WITH g AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY source, lang
)
SELECT source, lang, n_docs, n_tokens,
       round(sum_chars * 1.0 / n_docs, 6) AS avg_chars,
       round(n_docs * 1.0 / (SELECT SUM(n_docs) FROM g), 6) AS doc_share
FROM g
""")
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = (docs.groupBy("source", "lang")
         .agg(lcount("n_docs"),
              F.sum(F.size(tx.tokens(F.col("text")))).cast("bigint")
               .alias("n_tokens"),
              F.sum("n_chars").cast("bigint").alias("sum_chars")))
    total = g.agg(F.sum("n_docs").alias("__total"))
    return (g.crossJoin(F.broadcast(total))
            .select("source", "lang", "n_docs", "n_tokens",
                    F.round(F.col("sum_chars") / F.col("n_docs"), 6)
                     .alias("avg_chars"),
                    F.round(F.col("n_docs") / F.col("__total"), 6)
                     .alias("doc_share")))


# --------------------------------------------------------------------------
# dp_curriculum — curriculum phases by quality proxy: NTILE(4) over
# (avg word length, doc_id). The global sort is a range-partitioned
# exchange (Spark samples split points) — the standard distributed
# total-order, no single reducer.
# --------------------------------------------------------------------------
@register("dp_curriculum", oracle=f"""
SELECT doc_id,
       round(n_chars * 1.0 / len({_TOKS}), 6) AS score,
       CAST(NTILE(4) OVER (ORDER BY n_chars * 1.0 / len({_TOKS}), doc_id)
            AS BIGINT) AS phase
FROM documents
""")
def dp_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from sanctions_data_pipeline_spark.plans.helpers import sharded_ntile

    docs = load_table(spark, sf_dir, "documents")
    score = F.col("n_chars") / F.size(tx.tokens(F.col("text")))
    # persist the narrow (doc_id, score) projection (round-12): the
    # ntile's bounds job and its window/carry branches each re-ran the
    # tokenize over the full text otherwise — the same discipline as
    # q_lorenz_deciles' spend persist, 2 tokenize passes -> 1
    scored = docs.select("doc_id", score.alias("__raw")).persist()
    # sharded NTILE(4): range-shard on the raw score, per-shard rank,
    # broadcast count carry-in — no single-partition corpus sort
    t = sharded_ntile(scored,
                      F.col("__raw"), [F.asc("__raw"), F.asc("doc_id")],
                      4, "phase")
    return t.select("doc_id", F.round("__raw", 6).alias("score"), "phase")


# --------------------------------------------------------------------------
# dd_dup_regions — MAXIMAL duplicated substring regions per document
# (the actionable form of exact-substring dedup, Lee et al. 2022
# "Deduplicating Training Data Makes Language Models Better": cut the
# duplicated REGIONS, keep the rest). Duplicated 8-token spans chain
# into maximal runs via gaps-and-islands on span positions; a region
# of consecutive dup spans [s, e] covers tokens [s, e+7]. Only regions
# >= 10 tokens survive (>= 3 chained spans). Shuffles carry (128-bit
# fingerprint, doc, pos) rows — never text.
# --------------------------------------------------------------------------
@register("dd_dup_regions", oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id, i - 1 AS pos,
         concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
                   toks[i+4], toks[i+5], toks[i+6], toks[i+7]) AS span
  FROM t, LATERAL unnest(range(1, len(toks) - 6)) AS u(i)
  WHERE len(toks) >= 8
), sdf AS (
  SELECT span FROM s GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
), dup AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM s JOIN sdf USING (span)
)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS start_tok,
       CAST(MAX(pos) + 7 AS BIGINT) AS end_tok,
       CAST(MAX(pos) - MIN(pos) + 8 AS BIGINT) AS n_tokens
FROM dup GROUP BY doc_id, grp
HAVING MAX(pos) - MIN(pos) + 8 >= 10
""")
def dd_dup_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.dup_regions(docs)


# --------------------------------------------------------------------------
# dd_containment — ASYMMETRIC near-dup: |Si ∩ Sj| / |Si| >= t finds
# documents wholly contained in a larger one (quote-lift / concat
# duplication that symmetric Jaccard misses: a 100-token doc pasted
# into a 10k-token doc has tiny Jaccard but containment 1.0).
# Candidates come from the shared-shingle inverted index within a
# lang block — the pair shuffle carries (shingle-hash, doc) rows, the
# match count is one agg, and set sizes broadcast back; no n² join.
# --------------------------------------------------------------------------
@register("dd_containment", oracle=f"""
WITH s AS (
  SELECT doc_id, lang,
         CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(
                range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
              ELSE [] END AS sh
  FROM (SELECT doc_id, lang, {_TOKS} AS t FROM documents)
)
SELECT a.doc_id AS i, b.doc_id AS j,
       round(len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh), 6)
         AS containment
FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id <> b.doc_id
WHERE len(a.sh) > 0
  AND round(len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh), 6) >= 0.9
""")
def dd_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collapse-first under duplicate mass (round 11): K copies of a
    # text put K entries in every posting list -> K² intersection rows
    # per shingle; the CBO probe routes duplicate-heavy corpora
    # through one-representative-per-group (operators/dedup.py)
    docs = load_table(spark, sf_dir, "documents")
    return dd.containment_pairs(docs, ["lang"], 0.9, 3)


# --------------------------------------------------------------------------
# emb_knn_graph_ivf — the SCALE path of the kNN graph: block the
# self-join by IVF cell (deterministic k-means), exact within each
# cell.
#
# Oracle contract (round 10, the tok_fertility invariant-lane
# pattern): the cell structure is not SQL-expressible, so the
# registered output is the RECALL LATTICE — one row per source vector
# (vec_id, the exact relational lane) with invariants of a correct
# cell-blocked scan vs the exact quadratic graph, stated as literals:
#   n_neighbors           exactly k (probed cells held >= k
#                         candidates — a starved probe flips this),
#   rankwise_dominated_ok IVF's r-th cosine <= the exact graph's r-th
#                         cosine at every rank (IVF scans a subset;
#                         eps 2e-6 absorbs the numpy-vs-fold last-ulp
#                         rounding the knn_graph_ivf docstring notes),
#   neighbors_valid_ok    dst != src and |cos| <= 1.
# Exact edges + the 0.95 recall floor stay pinned by pytest on
# emb_knn_graph_ivf_full (the pre-round-10 registered output).
# --------------------------------------------------------------------------
_KNN_IVF_ORACLE = """
SELECT vec_id, CAST(3 AS BIGINT) AS n_neighbors,
       TRUE AS rankwise_dominated_ok, TRUE AS neighbors_valid_ok
FROM embeddings
"""


@register("emb_knn_graph_ivf", oracle=_KNN_IVF_ORACLE)
def emb_knn_graph_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    ivf = emb_knn_graph_ivf_full(spark, sf_dir)
    exact = (sim.knn_graph(vecs, k=3)
             .select(F.col("src_id"), F.col("rnk"),
                     F.col("cos").alias("exact_cos")))
    eps = F.lit(2e-6)
    joined = ivf.join(exact, ["src_id", "rnk"], "left")
    # coalesce-to-False: a rank missing from the exact baseline (null
    # exact_cos) must fail the invariant — bool_and skips nulls.
    return (joined.groupBy(F.col("src_id").alias("vec_id"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_neighbors"),
                 F.bool_and(F.coalesce(
                     F.col("cos") <= F.col("exact_cos") + eps, F.lit(False)))
                  .alias("rankwise_dominated_ok"),
                 F.bool_and(F.coalesce(
                     (F.col("dst_id") != F.col("src_id"))
                     & (F.abs("cos") <= F.lit(1.0) + eps), F.lit(False)))
                  .alias("neighbors_valid_ok")))


def emb_knn_graph_ivf_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (src_id, dst_id, cos, rnk) IVF-celled edges — the pytest
    value-pin surface (the pre-round-10 registered output)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    return (sim.knn_graph_ivf(vecs, k=3, n_centroids=8, n_probe=3)
            .withColumn("rnk", F.col("rnk").cast("bigint")))


# --------------------------------------------------------------------------
# dp_balanced_shards — token-balanced shard assignment: rank docs by
# token count desc, place round-robin in SNAKE order (shard sequence
# 0..S-1, S-1..0, ...) so each pass pairs a heavy doc with a light
# slot — the deterministic distributed stand-in for first-fit-
# decreasing (within ~1 max-doc of perfect balance). One global sort
# (range-partitioned), map-only placement.
# --------------------------------------------------------------------------
_N_SHARDS = 8


@register("dp_balanced_shards", oracle=f"""
WITH ranked AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         ROW_NUMBER() OVER (ORDER BY len({_TOKS}) DESC, doc_id) - 1 AS rk
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(CASE WHEN (rk // {_N_SHARDS}) % 2 = 0
                 THEN rk % {_N_SHARDS}
                 ELSE {_N_SHARDS} - 1 - (rk % {_N_SHARDS}) END AS BIGINT)
         AS shard
FROM ranked
""")
def dp_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from sanctions_data_pipeline_spark.plans.helpers import (
        sharded_global_window)

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tx.tokens(F.col("text"))).cast("bigint")
    # sharded global rank (range-shard on -n_tokens + broadcast count
    # carry-in) — no single-partition corpus sort
    ranked = sharded_global_window(
        docs.select("doc_id", n_tok.alias("n_tokens")),
        -F.col("n_tokens"), [F.desc("n_tokens"), F.asc("doc_id")],
        rn="__rn", nulls="last").withColumn("__rk", F.col("__rn") - 1)
    fwd = F.col("__rk") % _N_SHARDS
    shard = F.when((F.col("__rk") / _N_SHARDS).cast("long") % 2 == 0, fwd) \
             .otherwise(_N_SHARDS - 1 - fwd)
    return ranked.select("doc_id", "n_tokens",
                         shard.cast("bigint").alias("shard"))


# --------------------------------------------------------------------------
# gr_triangle_count — triangles per node over the co-purchase graph
# (community-density signal). Edge-iterator algorithm: orient each
# edge low->high, join wedges on the middle vertex, close them against
# the oriented edge list — the shuffle carries (long, long) edges
# only, never adjacency lists, and each triangle counts exactly once.
# --------------------------------------------------------------------------
@register("gr_triangle_count", oracle="""
WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_orderkey < 2000
), e0 AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e0 e1 JOIN e0 e2 ON e1.v = e2.u
  JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (SELECT a AS node FROM tri UNION ALL
      SELECT b FROM tri UNION ALL SELECT c FROM tri)
GROUP BY node
""")
def gr_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") < 2000)
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p")).distinct())
    a = li.select("o", F.col("p").alias("u"))
    b = li.select("o", F.col("p").alias("v"))
    # e0 feeds THREE join sides (e1/e2/e3) and tri fed three unionAll
    # branches — unpersisted, the distinct + wedge pipeline re-ran up
    # to 9x (round-12 subtree lint). Persist the narrow (long, long)
    # edge list once and emit the three triangle corners with one
    # map-side explode instead of a tripled union subtree (the
    # pr_user_recs symmetrize idiom; same rows, order-free pre-groupBy).
    e0 = (a.join(b, "o").filter(F.col("u") < F.col("v"))
          .select("u", "v").distinct().persist())
    e1 = e0.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e0.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e0.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = (e1.join(e2, "b").join(e3, ["a", "c"]))
    nodes = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node"))
    return nodes.groupBy("node").agg(lcount("n_triangles"))


# --------------------------------------------------------------------------
# dd_cut_regions — APPLY the dd_dup_regions cut list: re-emit each
# document's text with duplicated regions excised (the Lee et al. 2022
# action step). Regions collect per doc (few per doc by construction),
# the token filter is a higher-order expression over the split token
# array — no Python, no shuffle beyond the region agg + one broadcast-
# able join. Oracle (round 8): the dd_dup_regions oracle extended with
# the same token-index surgery in DuckDB lambdas — regions collect to
# a struct list per doc, kept indices are the 0-based positions no
# region covers, clean_text re-joins the kept tokens. The planted-
# duplicate pin in tests/test_training_ext.py remains as the
# independent-semantics check.
# --------------------------------------------------------------------------
_CUT_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id, i - 1 AS pos,
         concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
                   toks[i+4], toks[i+5], toks[i+6], toks[i+7]) AS span
  FROM t, LATERAL unnest(range(1, len(toks) - 6)) AS u(i)
  WHERE len(toks) >= 8
), sdf AS (
  SELECT span FROM s GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
), dup AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM s JOIN sdf USING (span)
), regs AS (
  SELECT doc_id, MIN(pos) AS st, MAX(pos) + 7 AS en
  FROM dup GROUP BY doc_id, grp
  HAVING MAX(pos) - MIN(pos) + 8 >= 10
), rl AS (
  SELECT doc_id, list({{'s': st, 'e': en}}) AS rs FROM regs GROUP BY doc_id
), m AS (
  SELECT t.doc_id, t.toks,
         coalesce(rl.rs, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])) AS rs
  FROM t LEFT JOIN rl USING (doc_id)
), kept AS (
  SELECT doc_id, toks,
         list_filter(range(1, len(toks) + 1),
                     i -> len(list_filter(rs,
                              r -> i - 1 >= r.s AND i - 1 <= r.e)) = 0)
           AS ki
  FROM m
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens_before,
       coalesce(array_to_string(list_transform(ki, i -> toks[i]), ' '), '')
         AS clean_text,
       CAST(len(ki) AS BIGINT) AS n_tokens_after
FROM kept
"""


@register("dd_cut_regions", oracle=_CUT_ORACLE)
def dd_cut_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.cut_regions(docs)


# --------------------------------------------------------------------------
# tok_vocab — corpus vocabulary for tokenizer training: term + doc
# frequency per token, rank by frequency, and the cumulative coverage
# share each rank adds (the curve that picks vocab size: rank r's
# cum_share says what fraction of all token OCCURRENCES the top-r
# vocabulary covers — 1 - cum_share is the OOV mass). One explode +
# two aggs; the rank/cumsum window runs over the (small) vocabulary,
# not the corpus. Integer-exact: shares are bigint/bigint divisions.
# --------------------------------------------------------------------------
@register("tok_vocab", oracle=f"""
WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
v AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM t GROUP BY tok
), tot AS (SELECT SUM(tf) AS total FROM v)
SELECT tok, tf, df,
       CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, tok) AS BIGINT) AS rank,
       round(SUM(tf) OVER (ORDER BY tf DESC, tok
                           ROWS UNBOUNDED PRECEDING)
             * 1.0 / (SELECT total FROM tot), 6) AS cum_share
FROM v
QUALIFY rank <= 100
""")
def tok_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    v = (docs.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok"))
         .groupBy("tok")
         .agg(F.count(F.lit(1)).cast("bigint").alias("tf"),
              F.count_distinct("doc_id").cast("bigint").alias("df")))
    total = v.agg(F.sum("tf").alias("__total"))
    w = W.orderBy(F.desc("tf"), F.asc("tok"))
    return (v.crossJoin(F.broadcast(total))
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .withColumn("cum_share",
                        F.round(F.sum("tf").over(
                            w.rowsBetween(W.unboundedPreceding, 0))
                            / F.col("__total"), 6))
            .filter(F.col("rank") <= 100)
            .select("tok", "tf", "df", "rank", "cum_share"))


# --------------------------------------------------------------------------
# sim_recall_eval — ANN quality as a QUERY: recall@3 of the sign-LSH
# index against exact brute force, per query vector. The evaluation
# loop every ANN deployment runs before trusting an index, expressed
# as two subplans + one anti-joined count — no driver-side eval code.
# --------------------------------------------------------------------------
@register("sim_recall_eval", oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v, {_sql_bucket("v")} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 20),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY {_COS.format(a="qv", b="v")} DESC,
                                       e.vec_id) AS rnk
    FROM q, e WHERE e.vec_id <> query_id
  ) WHERE rnk <= 3
), approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, b.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY {_COS.format(a="qv", b="b.v")} DESC,
                                       b.vec_id) AS rnk
    FROM q JOIN b USING (bucket) WHERE b.vec_id <> query_id
  ) WHERE rnk <= 3
)
SELECT x.query_id,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
       CAST(COUNT(*) AS BIGINT) AS n_true,
       round(COUNT(a.neighbor_id) * 1.0 / COUNT(*), 6) AS recall
FROM exact x LEFT JOIN approx a
  ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
GROUP BY x.query_id
""")
def sim_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    q = vecs.filter(F.col("vec_id") < 20)
    exact = sim.brute_force_topk(q, vecs, k=3).select("query_id", "neighbor_id")
    approx = (sim.lsh_topk(q, vecs, k=3, n_bits=8)
              .select("query_id", F.col("neighbor_id").alias("__an")))
    joined = exact.join(
        approx, (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.__an), "left") \
        .select(exact.query_id, "neighbor_id", "__an")
    return (joined.groupBy("query_id")
            .agg(F.count("__an").cast("bigint").alias("n_hit"),
                 lcount("n_true"))
            .select("query_id", "n_hit", "n_true",
                    F.round(F.col("n_hit") / F.col("n_true"), 6)
                     .alias("recall")))


# --------------------------------------------------------------------------
# tx_js_divergence — corpus drift monitor: Jensen-Shannon divergence
# between the token distributions of two corpus slices (en vs rest)
# over the top-50 global vocabulary + an OOV bucket. The number a
# curation loop watches to catch mixture drift between snapshots.
# Portability: per-term contributions fold in SORTED term order on
# both engines, so the double accumulation is bit-identical.
# --------------------------------------------------------------------------
@register("tx_js_divergence", oracle=f"""
WITH t AS (
  SELECT CASE WHEN lang = 'en' THEN 'p' ELSE 'q' END AS side,
         unnest({_TOKS}) AS tok
  FROM documents
), vocab AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
    FROM t GROUP BY tok
  ) WHERE rk <= 50
), bucketed AS (
  SELECT side,
         CASE WHEN tok IN (SELECT tok FROM vocab) THEN tok
              ELSE CHR(1) || 'OOV' END AS term,
         COUNT(*) AS c
  FROM t GROUP BY 1, 2
), tot AS (
  SELECT side, SUM(c) AS n FROM bucketed GROUP BY side
), dist AS (
  SELECT term,
         MAX(CASE WHEN side = 'p' THEN c * 1.0 /
             (SELECT n FROM tot WHERE side = 'p') ELSE 0 END) AS p,
         MAX(CASE WHEN side = 'q' THEN c * 1.0 /
             (SELECT n FROM tot WHERE side = 'q') ELSE 0 END) AS q
  FROM bucketed GROUP BY term
), contrib AS (
  SELECT term,
         0.5 * (CASE WHEN p > 0 THEN p * log2(2 * p / (p + q)) ELSE 0 END)
       + 0.5 * (CASE WHEN q > 0 THEN q * log2(2 * q / (p + q)) ELSE 0 END)
           AS c
  FROM dist
)
SELECT round(list_reduce(
         list_prepend(CAST(0 AS DOUBLE),
           list_transform(list_sort(list({{'t': term, 'c': c}})),
                          x -> x.c)),
         (a, b) -> a + b), 6) AS jsd
FROM contrib
""")
def tx_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    # the tokenized corpus feeds the vocab census AND the bucketing
    # probe, and the bounded bucketed census feeds tot AND dist:
    # persist both so tokenize runs once and the census twice-consumed
    # subtree once (round-12 subtree lint; the tx_bigram_pmi r11
    # tokenized-corpus persist class / a <= 2x(V+1)-row census)
    t = docs.select(
        F.when(F.col("lang") == "en", "p").otherwise("q").alias("side"),
        F.explode(tx.tokens(F.col("text"))).alias("tok")).persist()
    vocab = (t.groupBy("tok").agg(lcount("__c"))
             .withColumn("__rk", F.row_number().over(
                 W.orderBy(F.desc("__c"), F.asc("tok"))))
             .filter(F.col("__rk") <= 50).select("tok"))
    bucketed = (t.join(F.broadcast(vocab.withColumn("__inv", F.lit(1))),
                       "tok", "left")
                .select("side",
                        F.when(F.col("__inv").isNotNull(), F.col("tok"))
                         .otherwise(F.concat(F.lit("\x01"), F.lit("OOV")))
                         .alias("term"))
                .groupBy("side", "term").agg(lcount("c")).persist())
    tot = bucketed.groupBy("side").agg(F.sum("c").alias("n"))
    dist = (bucketed.join(tot, "side")
            .groupBy("term")
            .agg(F.max(F.when(F.col("side") == "p",
                              F.col("c") / F.col("n")).otherwise(0.0)).alias("p"),
                 F.max(F.when(F.col("side") == "q",
                              F.col("c") / F.col("n")).otherwise(0.0)).alias("q")))
    m = F.col("p") + F.col("q")
    contrib = dist.select(
        "term",
        (0.5 * F.when(F.col("p") > 0,
                      F.col("p") * F.log2(2 * F.col("p") / m)).otherwise(0.0)
         + 0.5 * F.when(F.col("q") > 0,
                        F.col("q") * F.log2(2 * F.col("q") / m)).otherwise(0.0)
         ).alias("c"))
    fold = F.aggregate(
        F.expr("transform(array_sort(collect_list(struct(term, c))), x -> x.c)"),
        F.lit(0.0), lambda a, b: a + b)
    return contrib.agg(F.round(fold, 6).alias("jsd"))


# --------------------------------------------------------------------------
# tt_stratified_split — EXACT stratified holdout: within each lang
# stratum, rank docs by a deterministic md5 and hold out the first
# 20% (floor) — per-stratum proportions are exact by construction,
# unlike hash-threshold splits whose proportions only converge. One
# rank window per stratum (shuffle on lang), map-only assignment.
# --------------------------------------------------------------------------
@register("tt_stratified_split", oracle="""
WITH ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN rk <= n // 5 THEN 'test' ELSE 'train' END AS split
FROM ranked
""")
def tt_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")),
                                      "doc_id")
    return (docs.select(
        "doc_id", "lang",
        F.row_number().over(w).alias("__rk"),
        F.count(F.lit(1)).over(W.partitionBy("lang")).alias("__n"))
        .select("doc_id", "lang",
                F.when(F.col("__rk") <= (F.col("__n") / 5).cast("long"),
                       "test").otherwise("train").alias("split")))


# --------------------------------------------------------------------------
# ml_naive_bayes — multinomial Naive Bayes lang classifier as PURE
# relational algebra: train (class priors + Laplace-smoothed token
# likelihoods) and predict (argmax of summed log-likelihoods) are all
# joins/aggs — no driver-side model object, no Python math. The
# log-prob sum per (doc, class) folds in sorted token order and scores
# round to 6dp before the argmax, so Spark and DuckDB pick identical
# classes. Resubstitution accuracy rides along as is_correct.
# --------------------------------------------------------------------------
@register("ml_naive_bayes", oracle=f"""
WITH t AS (
  SELECT doc_id, lang, tok, COUNT(*) AS m
  FROM (SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents)
  GROUP BY doc_id, lang, tok
), classes AS (SELECT DISTINCT lang AS c FROM documents),
ct AS (SELECT lang AS c, tok, CAST(SUM(m) AS BIGINT) AS cnt
       FROM t GROUP BY lang, tok),
tot AS (SELECT c, CAST(SUM(cnt) AS BIGINT) AS n_c FROM ct GROUP BY c),
vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM t),
prior AS (SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS nd
          FROM documents GROUP BY lang),
ndocs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
contrib AS (
  SELECT t.doc_id, t.lang AS true_lang, cl.c, t.tok,
         t.m * (ln(COALESCE(ct.cnt, 0) + 1)
                - ln(tot.n_c + (SELECT v FROM vocab))) AS w
  FROM t CROSS JOIN classes cl
  LEFT JOIN ct ON ct.c = cl.c AND ct.tok = t.tok
  JOIN tot ON tot.c = cl.c
), score AS (
  SELECT doc_id, true_lang, contrib.c AS c,
         round(list_reduce(
                 list_prepend(CAST(0 AS DOUBLE),
                   list_transform(list_sort(list({{'t': tok, 'w': w}})),
                                  x -> x.w)),
                 (a, b) -> a + b)
               + ln(prior.nd * 1.0 / (SELECT n FROM ndocs)), 6) AS s
  FROM contrib JOIN prior ON prior.c = contrib.c
  GROUP BY doc_id, true_lang, contrib.c, prior.nd
)
SELECT doc_id, true_lang, c AS pred_lang,
       CAST(CASE WHEN c = true_lang THEN 1 ELSE 0 END AS BIGINT) AS is_correct
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY s DESC, c) AS rk FROM score)
WHERE rk = 1
""")
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    # t feeds the class-count census, the vocab count AND the contrib
    # join (3 consumers): persist so the tokenize + per-doc-token agg
    # runs once (round-12 subtree lint)
    t = (docs.select("doc_id", "lang",
                     F.explode(tx.tokens(F.col("text"))).alias("tok"))
         .groupBy("doc_id", "lang", "tok").agg(lcount("m"))).persist()
    classes = docs.select(F.col("lang").alias("c")).distinct()
    ct = (t.groupBy(F.col("lang").alias("c"), "tok")
          .agg(F.sum("m").cast("bigint").alias("cnt")))
    tot = ct.groupBy("c").agg(F.sum("cnt").cast("bigint").alias("n_c"))
    vocab = t.select("tok").distinct().agg(lcount("__v"))
    prior = docs.groupBy(F.col("lang").alias("c")).agg(lcount("nd"))
    ndocs = docs.agg(lcount("__n"))
    contrib = (t.crossJoin(F.broadcast(classes))
               .join(ct, ["c", "tok"], "left")
               .join(F.broadcast(tot), "c")
               .crossJoin(F.broadcast(vocab))
               .select("doc_id", F.col("lang").alias("true_lang"), "c", "tok",
                       (F.col("m") * (F.log(F.coalesce(F.col("cnt"), F.lit(0)) + 1)
                                      - F.log(F.col("n_c") + F.col("__v"))))
                        .alias("w")))
    fold = F.aggregate(
        F.expr("transform(array_sort(collect_list(struct(tok, w))), x -> x.w)"),
        F.lit(0.0), lambda a, b: a + b)
    score = (contrib.groupBy("doc_id", "true_lang", "c")
             .agg(fold.alias("__s"))
             .join(F.broadcast(prior), "c")
             .crossJoin(F.broadcast(ndocs))
             .select("doc_id", "true_lang", "c",
                     F.round(F.col("__s")
                             + F.log(F.col("nd") / F.col("__n")), 6)
                      .alias("s")))
    w = W.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("c"))
    return (score.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select("doc_id", "true_lang", F.col("c").alias("pred_lang"),
                    F.when(F.col("c") == F.col("true_lang"), 1).otherwise(0)
                     .cast("bigint").alias("is_correct")))


# --------------------------------------------------------------------------
# dp_doc_chunks — split long documents into fixed-size token chunks
# with overlap (context-window prep): chunk starts stride by
# (size - overlap), the tail chunk keeps its full span by clamping,
# text is re-materialized per chunk via slice — map-only fan-out, no
# shuffle at all until a downstream op needs one.
# --------------------------------------------------------------------------
_CHUNK, _OVERLAP = 40, 8


@register("dp_doc_chunks", oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
starts AS (
  SELECT doc_id, toks,
         CAST(unnest(range(0, GREATEST(len(toks) - {_OVERLAP}, 1),
                           {_CHUNK} - {_OVERLAP})) AS BIGINT) AS s
  FROM t
)
SELECT doc_id, CAST(s / ({_CHUNK} - {_OVERLAP}) AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(toks, s + 1, s + {_CHUNK}), ' ') AS chunk_text,
       CAST(LEAST(len(toks) - s, {_CHUNK}) AS BIGINT) AS n_tokens
FROM starts WHERE s < len(toks)
""")
def dp_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stride = _CHUNK - _OVERLAP
    toks = tx.tokens(F.col("text"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - _OVERLAP - 1, F.lit(0)),
        F.lit(stride))
    ex = docs.select("doc_id", toks.alias("__toks"),
                     F.explode(starts).alias("s")).filter(
        F.col("s") < F.size("__toks"))
    return ex.select(
        "doc_id",
        (F.col("s") / stride).cast("bigint").alias("chunk_idx"),
        F.concat_ws(" ", F.slice("__toks", F.col("s") + 1, _CHUNK))
         .alias("chunk_text"),
        F.least(F.size("__toks") - F.col("s"), F.lit(_CHUNK))
         .cast("bigint").alias("n_tokens"))


# --------------------------------------------------------------------------
# emb_matryoshka_eval — Matryoshka-style dimension truncation: slice
# embeddings to a prefix (64 -> 16 dims), re-rank neighbors in the
# truncated space, and measure recall@3 against full-dimension exact
# top-k — the storage/accuracy dial modern embedding stacks tune,
# fully SQL-oracled like sim_recall_eval.
# --------------------------------------------------------------------------
@register("emb_matryoshka_eval", oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT vec_id, v, list_slice(v, 1, 16) AS sv FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, sv AS qsv FROM s WHERE vec_id < 20),
full_k AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, s.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY {_COS.format(a="qv", b="s.v")} DESC,
                                       s.vec_id) AS rnk
    FROM q, s WHERE s.vec_id <> query_id
  ) WHERE rnk <= 3
), trunc_k AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, s.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY {_COS.format(a="qsv", b="s.sv")} DESC,
                                       s.vec_id) AS rnk
    FROM q, s WHERE s.vec_id <> query_id
  ) WHERE rnk <= 3
)
SELECT f.query_id,
       CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_hit,
       CAST(COUNT(*) AS BIGINT) AS n_true,
       round(COUNT(t.neighbor_id) * 1.0 / COUNT(*), 6) AS recall
FROM full_k f LEFT JOIN trunc_k t
  ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
GROUP BY f.query_id
""")
def emb_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings")
    sliced = vecs.select(
        "vec_id", "embedding",
        F.slice(sim.as_double(F.col("embedding")), 1, 16).alias("__sv"))
    q = sliced.filter(F.col("vec_id") < 20)
    full_k = (sim.brute_force_topk(q, sliced, k=3)
              .select("query_id", "neighbor_id"))
    trunc_k = (sim.brute_force_topk(
        q.select("vec_id", F.col("__sv").alias("embedding")),
        sliced.select("vec_id", F.col("__sv").alias("embedding")), k=3)
        .select("query_id", F.col("neighbor_id").alias("__tn")))
    joined = full_k.join(
        trunc_k, (full_k.query_id == trunc_k.query_id)
        & (full_k.neighbor_id == trunc_k.__tn), "left") \
        .select(full_k.query_id, "neighbor_id", "__tn")
    return (joined.groupBy("query_id")
            .agg(F.count("__tn").cast("bigint").alias("n_hit"),
                 lcount("n_true"))
            .select("query_id", "n_hit", "n_true",
                    F.round(F.col("n_hit") / F.col("n_true"), 6)
                     .alias("recall")))


# --------------------------------------------------------------------------
# mix_weighted_sample — weighted sampling without replacement
# (Efraimidis-Spirakis A-Res): key = u^(1/w) with u a DETERMINISTIC
# md5-derived uniform — reproducible across runs/engines/partitions,
# no rand(). Top-100 keys win. The standard quality-weighted corpus
# subsampling primitive; one map-side key computation + one top-k.
# Weight = n_chars (longer docs proportionally likelier).
# --------------------------------------------------------------------------
@register("mix_weighted_sample", oracle="""
WITH keyed AS (
  SELECT doc_id,
         (CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 13))
               AS BIGINT) + 1.0) / 4503599627370497.0 AS u,
         CAST(n_chars AS DOUBLE) AS w
  FROM documents
)
SELECT doc_id, round(pow(u, 1.0 / w), 6) AS sample_key FROM (
  SELECT doc_id, u, w,
         ROW_NUMBER() OVER (ORDER BY pow(u, 1.0 / w) DESC, doc_id) AS rk
  FROM keyed
) WHERE rk <= 100
""")
def mix_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    # 13 hex chars -> [0, 2^52); +1 over 2^52+1 keeps u in (0, 1)
    u = ((F.conv(F.substring(F.md5(F.concat(F.lit("ws:"),
                                            F.col("doc_id").cast("string"))),
                             1, 13), 16, 10).cast("double") + 1.0)
         / F.lit(4503599627370497.0))
    key = F.pow(u, 1.0 / F.col("n_chars").cast("double"))
    w = W.orderBy(F.desc("__key"), F.asc("doc_id"))
    return (docs.select("doc_id", key.alias("__key"))
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= 100)
            .select("doc_id", F.round("__key", 6).alias("sample_key")))


# --------------------------------------------------------------------------
# pr_item_cosine — item-item association strength over the co-purchase
# graph: Salton cosine cooc(i,j) / sqrt(deg(i) * deg(j)) — the
# first-line "customers also bought" scorer. Co-occurrence counts and
# degrees come from two aggs over the same order-item projection; the
# normalization join broadcasts the (small) degree table.
# --------------------------------------------------------------------------
@register("pr_item_cosine", oracle="""
WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_orderkey < 4000
), cooc AS (
  SELECT a.p AS i, b.p AS j, CAST(COUNT(*) AS BIGINT) AS c
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING COUNT(*) >= 2
), deg AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM li GROUP BY p
)
SELECT i, j, c, round(c / sqrt(di.d * dj.d), 6) AS cosine
FROM (SELECT cooc.i, cooc.j, cooc.c FROM cooc) cooc
JOIN deg di ON di.p = cooc.i JOIN deg dj ON dj.p = cooc.j
""")
def pr_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # li feeds both self-join sides AND the degree census (3
    # consumers); deg feeds both broadcast sides — persist the bounded
    # distinct slice and the degree table (round-12 subtree lint)
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") < 4000)
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p")).distinct()).persist()
    a = li.select("o", F.col("p").alias("i"))
    b = li.select("o", F.col("p").alias("j"))
    cooc = (a.join(b, "o").filter(F.col("i") < F.col("j"))
            .groupBy("i", "j").agg(lcount("c"))
            .filter(F.col("c") >= 2))
    deg = li.groupBy(F.col("p")).agg(lcount("d")).persist()
    di = deg.select(F.col("p").alias("i"), F.col("d").alias("__di"))
    dj = deg.select(F.col("p").alias("j"), F.col("d").alias("__dj"))
    return (cooc.join(F.broadcast(di), "i").join(F.broadcast(dj), "j")
            .select("i", "j", F.col("c").cast("bigint").alias("c"),
                    F.round(F.col("c")
                            / F.sqrt(F.col("__di") * F.col("__dj")), 6)
                     .alias("cosine")))


# --------------------------------------------------------------------------
# dd_lsh_tuning — the MinHash banding S-curve as a TABLE: for each
# (bands b, rows r) split of a 32-hash signature and each similarity
# s, the candidate probability 1 - (1 - s^r)^b. The principled way to
# pick banding for a target threshold (MMDS ch.3) — pure expression
# lattice, no data scan at all.
# --------------------------------------------------------------------------
@register("dd_lsh_tuning", oracle="""
WITH params(b, r) AS (VALUES (4, 8), (8, 4), (16, 2), (32, 1)),
sims AS (SELECT unnest(range(1, 20)) * 0.05 AS s)
SELECT b, r, round(s, 2) AS s,
       round(1 - pow(1 - pow(s, r), b), 6) AS p_candidate
FROM params, sims
""")
def dd_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    params = spark.createDataFrame([(4, 8), (8, 4), (16, 2), (32, 1)],
                                   "b int, r int")
    sims = spark.range(1, 20).select((F.col("id") * 0.05).alias("s"))
    return (params.crossJoin(sims)
            .select("b", "r", F.round("s", 2).alias("s"),
                    F.round(1 - F.pow(1 - F.pow("s", "r"), "b"), 6)
                     .alias("p_candidate")))


# --------------------------------------------------------------------------
# tx_filter_verdict — the ASSEMBLED corpus gate: every doc gets one
# keep/drop verdict with the first failing rule named, combining the
# C4-ish length band, Gopher repetition caps, and the per-lang p10
# quality floor (each rule also exists as its own audited query). One
# pass over tokens feeds all token-derived rules; the per-lang
# thresholds broadcast.
# --------------------------------------------------------------------------
@register("tx_filter_verdict", oracle=f"""
WITH base AS (
  SELECT doc_id, lang, {_TOKS} AS t,
         {_QSCORE.format(toks=_TOKS, stop=tx.sql_stopword_hits("text", "en"))}
           AS q
  FROM documents
), rep AS (
  SELECT doc_id,
         MAX(c) * 1.0 / SUM(c) AS top_frac
  FROM (SELECT doc_id, tok, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(t) AS tok FROM base) GROUP BY doc_id, tok)
  GROUP BY doc_id
), thr AS (
  SELECT lang, round(quantile_cont(q, 0.10), 6) AS p10 FROM base GROUP BY lang
)
SELECT b.doc_id,
       CASE WHEN len(b.t) < 10 THEN 'too_short'
            WHEN len(b.t) > 1000 THEN 'too_long'
            WHEN r.top_frac > 0.2 THEN 'repetitive'
            WHEN b.q < t.p10 THEN 'low_quality'
            ELSE 'keep' END AS verdict,
       CAST(CASE WHEN len(b.t) BETWEEN 10 AND 1000 AND r.top_frac <= 0.2
                  AND b.q >= t.p10 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM base b JOIN rep r ON b.doc_id = r.doc_id
JOIN thr t ON b.lang = t.lang
""")
def tx_filter_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    qscore = tx.quality_score(F.col("text"))
    base = docs.select(
        "doc_id", "lang", tx.tokens(F.col("text")).alias("t"),
        qscore.alias("q"))
    rep = (base.select("doc_id", F.explode("t").alias("tok"))
           .groupBy("doc_id", "tok").agg(lcount("c"))
           .groupBy("doc_id")
           .agg((F.max("c") / F.sum("c")).alias("top_frac")))
    thr = (base.groupBy("lang")
           .agg(F.round(F.expr("percentile_cont(0.10) WITHIN GROUP"
                               " (ORDER BY q)"), 6).alias("p10")))
    n = F.size("t")
    verdict = (F.when(n < 10, "too_short")
               .when(n > 1000, "too_long")
               .when(F.col("top_frac") > 0.2, "repetitive")
               .when(F.col("q") < F.col("p10"), "low_quality")
               .otherwise("keep"))
    keep = (n.between(10, 1000) & (F.col("top_frac") <= 0.2)
            & (F.col("q") >= F.col("p10")))
    return (base.join(rep, "doc_id").join(F.broadcast(thr), "lang")
            .select("doc_id", verdict.alias("verdict"),
                    keep.cast("bigint").alias("keep")))


# --------------------------------------------------------------------------
# mix_epoch_materialize — turn the mix_epochs plan into the actual
# training stream: each source's docs repeat epoch-many times with an
# epoch_no column (explode over sequence — map-side fan-out; the
# per-source epoch table broadcasts).
# --------------------------------------------------------------------------
@register("mix_epoch_materialize", oracle=f"""
WITH w(source, weight) AS (VALUES {", ".join(f"('{s}', {p})" for s, p in _EPOCH_W)}),
tok AS (
  SELECT d.source, CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents d GROUP BY d.source
), ep AS (
  SELECT t.source,
         (w.weight * {_EPOCH_BUDGET} + 50 * t.n_tokens - 1)
           // (50 * t.n_tokens) AS epochs
  FROM tok t JOIN w ON t.source = w.source
)
SELECT d.doc_id, CAST(e.i AS BIGINT) AS epoch_no
FROM documents d JOIN ep ON d.source = ep.source,
LATERAL unnest(range(1, epochs + 1)) AS e(i)
""")
def mix_epoch_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    weights = F.broadcast(docs.sparkSession.createDataFrame(
        _EPOCH_W, "source string, weight int"))
    tok = (docs.groupBy("source")
           .agg(F.sum(F.size(tx.tokens(F.col("text")))).cast("bigint")
                 .alias("n_tokens")))
    epochs = F.expr(f"(weight * {_EPOCH_BUDGET}L + 50L * n_tokens - 1)"
                    " div (50L * n_tokens)")
    ep = tok.join(weights, "source").select("source", epochs.alias("epochs"))
    return (docs.join(F.broadcast(ep), "source")
            .select("doc_id",
                    F.explode(F.sequence(F.lit(1), F.col("epochs")))
                     .alias("epoch_no"))
            .select("doc_id", F.col("epoch_no").cast("bigint")
                    .alias("epoch_no")))


# --------------------------------------------------------------------------
# dd_threshold_sweep — dedup operating-point curve: embedding pair
# cosines (blocked by label) bucketed against candidate thresholds in
# one pass — how many pairs each threshold would flag, the number you
# look at before committing a dedup run. Pairs compute ONCE; the sweep
# is a literal-lattice rollup.
# --------------------------------------------------------------------------
@register("dd_threshold_sweep", oracle=f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
p AS (
  SELECT {_COS.format(a="a.v", b="b.v")} AS cos
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
), t AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS thr)
SELECT round(thr, 2) AS threshold,
       CAST(SUM(CASE WHEN cos >= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
FROM t, p GROUP BY thr
""")
def dd_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weighted pair counts (round 11): the sweep only AGGREGATES over
    # pairs, so duplicate-mass cliques contribute arithmetic weights
    # (k(k-1)/2 / |mi|*|mj|) instead of enumerated rows — the ×100
    # duplicate-mass tier spent 59.5 s expanding pairs into a count
    vecs = load_table(spark, sf_dir, "embeddings")
    pairs = sim.cosine_pair_counts(vecs, ["label"], threshold=-1.0)
    thr = spark.createDataFrame([(t,) for t in (0.5, 0.6, 0.7, 0.8, 0.9)],
                                "thr double")
    return (pairs.crossJoin(F.broadcast(thr))
            .groupBy(F.round("thr", 2).alias("threshold"))
            .agg(F.sum(F.when(F.col("cos") >= F.col("thr"), F.col("w"))
                       .otherwise(F.lit(0)))
                  .cast("bigint").alias("n_pairs")))


# --------------------------------------------------------------------------
# tx_langid_eval — langid quality as a confusion MATRIX query: the
# stopword-profile classifier's predictions against the corpus labels,
# (true_lang, pred_lang, n) cells. Same evaluate-inside-the-engine
# pattern as sim_recall_eval.
# --------------------------------------------------------------------------
@register("tx_langid_eval", oracle=f"""
WITH scored AS (
  SELECT doc_id, lang AS true_lang,
         {tx.sql_predict_lang("text")} AS pred_lang
  FROM documents
)
SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM scored GROUP BY true_lang, pred_lang
""")
def tx_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (docs.select(F.col("lang").alias("true_lang"),
                        tx.predict_lang(F.col("text")).alias("pred_lang"))
            .groupBy("true_lang", "pred_lang")
            .agg(lcount("n")))

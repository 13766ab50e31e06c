"""Round-5 additions (SURVEY.md §2): PORTABLE-HASH near-dup pipelines.

The production near-dup headliners (dd_minhash_lsh, dd_simhash in
plans/training_data.py) hash with xxhash64 — the fast JVM path, but
one with no DuckDB twin, so they are rows-only entries: the banding /
pigeonhole CANDIDATE GENERATION itself has never earned a driver
hash-green row (VERDICT r04 "Next round" item 7). The two ops here
run the same mechanisms end to end on the portable md5 idiom
(``('0x' || substr(md5(x), 1, 8))::BIGINT`` == Spark
``conv(substring(md5(x), 1, 8), 16, 10)``, the q_cms_topk /
mix_dsir_weights pattern), so DuckDB replicates the ENTIRE pipeline —
signatures, band buckets, candidate join, verification — and the
driver can hash-compare the final pair lists.

They are mechanism proofs, not the scale path: md5 costs ~10x
xxhash64 per call, so production dedup stays on the xxhash headliners
(identical plan shape — banded equi-join buckets, never an all-pairs
join); these portable twins pin that the shared mechanism is right.

Scale notes (same as the headliners): the only shuffles are the
(band/bucket key) equi-joins over 8-byte-key rows and the final
distinct over true near-pairs; signatures aggregate map-side off one
scan of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.data import sanctions_fixture as fx
from sanctions_data_pipeline_spark.operators import textstats as tx
from sanctions_data_pipeline_spark.plans.helpers import (
    SQL_REVENUE, drate, dsum, dval, lcount, pround6, sql_dsum, sql_pround6,
)
from sanctions_data_pipeline_spark.plans.registry import register

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"


def _md5_32(col) -> F.Column:
    """First 32 bits of md5 as a bigint — bit-identical to DuckDB's
    ('0x' || substr(md5(x), 1, 8))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


# ---------------------------------------------------------------------------
# dd_minhash_lsh_portable — MinHash + LSH banding with md5 hashing so
# the whole pipeline (shingle sets -> 8 minhashes -> 4 two-row band
# signatures -> bucket equi-join -> exact-Jaccard verify) is replayed
# verbatim by DuckDB. Same banding mechanism as dd_minhash_lsh
# (reference: standard MinHash-LSH; Leskovec et al., MMDS ch.3), jac
# computed over the 32-bit-hashed 3-shingle SETS (set Jaccard is
# invariant under injective-in-practice hashing, and both engines
# hash identically so even a collision cannot diverge them).
# ---------------------------------------------------------------------------
_MH_N, _MH_BANDS, _MH_R, _MH_K, _MH_T = 8, 4, 2, 3, 0.5

_MINHASH_PORTABLE_ORACLE = f"""
WITH arr AS (
  SELECT doc_id, {_TOKS} AS t FROM documents WHERE length(text) > 0
),
sh AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 8))::BIGINT AS hs
  FROM arr, unnest(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= {_MH_K}
),
sig AS (
  SELECT doc_id,
         {", ".join(
             f"min(('0x' || substr(md5('{h}:' || hs), 1, 8))::BIGINT) AS m{h}"
             for h in range(_MH_N))}
  FROM sh GROUP BY doc_id
),
banded AS (
  SELECT doc_id, b,
         CASE b {" ".join(
             f"WHEN {b} THEN m{2 * b} || ':' || m{2 * b + 1}"
             for b in range(_MH_BANDS))} END AS bsig
  FROM sig, unnest(range(0, {_MH_BANDS})) AS u(b)
),
cand AS (
  SELECT DISTINCT l.doc_id AS i, r.doc_id AS j
  FROM banded l JOIN banded r ON l.b = r.b AND l.bsig = r.bsig
  WHERE l.doc_id < r.doc_id
),
sets AS (
  SELECT doc_id, list(hs) AS ls FROM sh GROUP BY doc_id
)
SELECT c.i, c.j,
       round(CAST(len(list_intersect(a.ls, b.ls)) AS DOUBLE)
             / CAST(len(list_distinct(a.ls || b.ls)) AS DOUBLE), 6) AS jac
FROM cand c JOIN sets a ON a.doc_id = c.i JOIN sets b ON b.doc_id = c.j
WHERE CAST(len(list_intersect(a.ls, b.ls)) AS DOUBLE)
      / CAST(len(list_distinct(a.ls || b.ls)) AS DOUBLE) >= {_MH_T}
"""


@register("dd_minhash_lsh_portable", oracle=_MINHASH_PORTABLE_ORACLE)
def dd_minhash_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    arr = docs.select("doc_id", tx.tokens(F.col("text")).alias("t")) \
              .filter(F.size("t") >= _MH_K)
    # 3-shingles as strings, hashed to portable 32-bit ids; the
    # shingle SET (distinct) feeds both the signatures and the verify
    sh = arr.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(0, size(t) - 3),"
            " i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).alias("s"),
    ).select("doc_id", _md5_32(F.col("s")).alias("hs")).distinct()
    sig = sh.groupBy("doc_id").agg(*[
        F.min(_md5_32(F.concat_ws(":", F.lit(h), F.col("hs")))).alias(f"m{h}")
        for h in range(_MH_N)
    ])
    banded = sig.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.concat_ws(":", F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}"))
            for b in range(_MH_BANDS)
        ])).alias("b", "bsig"),
    )
    left = banded.select(F.col("doc_id").alias("i"), "b", "bsig")
    right = banded.select(F.col("doc_id").alias("j"), "b", "bsig")
    cand = (left.join(right, ["b", "bsig"])
            .filter(F.col("i") < F.col("j"))
            .select("i", "j").distinct())
    sets = sh.groupBy("doc_id").agg(F.collect_set("hs").alias("ls"))
    jac = (F.size(F.array_intersect("ls_i", "ls_j")).cast("double")
           / F.size(F.array_union("ls_i", "ls_j")).cast("double"))
    return (
        cand.join(sets.select(F.col("doc_id").alias("i"),
                              F.col("ls").alias("ls_i")), "i")
        .join(sets.select(F.col("doc_id").alias("j"),
                          F.col("ls").alias("ls_j")), "j")
        .filter(jac >= _MH_T)
        .select("i", "j", F.round(jac, 6).alias("jac"))
    )


# ---------------------------------------------------------------------------
# dd_simhash_portable — 32-bit SimHash with md5 token hashing +
# exact hamming<=3 retrieval via the same composite two-chunk
# pigeonhole as dd_simhash (c = h+2 = 5 disjoint chunks of the
# fingerprint; <=h flips leave >=2 chunks untouched, so every true
# pair shares at least one of the C(5,2)=10 (chunk_i, chunk_j)
# composites — exact recall, bucket-bounded join). DuckDB replays
# fingerprints, buckets and bit_count(xor) verification verbatim.
# ---------------------------------------------------------------------------
_SH_BITS, _SH_H = 32, 3
_SH_C = _SH_H + 2                                 # 5 chunks
_SH_WIDTHS = [7, 7, 6, 6, 6]                      # disjoint partition of 32
_SH_OFFSETS = [0, 7, 14, 20, 26]
_SH_SHIFT = 7                                     # max width -> injective pack
_SH_COMBOS = [(a, b) for a in range(_SH_C) for b in range(a + 1, _SH_C)]


def _sql_chunk(k: int, col: str = "fp") -> str:
    mask = (1 << _SH_WIDTHS[k]) - 1
    return f"(({col} >> {_SH_OFFSETS[k]}) & {mask})"


_SIMHASH_PORTABLE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents WHERE length(text) > 0
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS th FROM toks
),
fps AS (
  SELECT doc_id,
         {" + ".join(
             f"(CASE WHEN 2 * sum((th >> {b}) & 1) > count(*)"
             f" THEN {1 << b}::BIGINT ELSE 0 END)"
             for b in range(_SH_BITS))} AS fp
  FROM hashed GROUP BY doc_id
),
chunked AS (
  SELECT doc_id, fp, c,
         CASE c {" ".join(
             f"WHEN {ci} THEN {_sql_chunk(a)} * {1 << _SH_SHIFT} + {_sql_chunk(b)}"
             for ci, (a, b) in enumerate(_SH_COMBOS))} END AS cval
  FROM fps, unnest(range(0, {len(_SH_COMBOS)})) AS u(c)
)
SELECT DISTINCT l.doc_id AS i, r.doc_id AS j,
       CAST(bit_count(xor(l.fp, r.fp)) AS BIGINT) AS hamming
FROM chunked l JOIN chunked r ON l.c = r.c AND l.cval = r.cval
WHERE l.doc_id < r.doc_id AND bit_count(xor(l.fp, r.fp)) <= {_SH_H}
"""


@register("dd_simhash_portable", oracle=_SIMHASH_PORTABLE_ORACLE)
def dd_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    th = docs.select(
        "doc_id",
        F.explode(tx.tokens(F.col("text"))).alias("tok"),
    ).select("doc_id", _md5_32(F.col("tok")).alias("th"))
    # 32 majority bits; counts aggregate map-side, the shuffle carries
    # (doc_id, 32 longs) per doc — same shape as simhash_fingerprints
    counts = th.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1).cast("long")))
          .alias(f"c{b}") for b in range(_SH_BITS)]
    )
    fp = None
    for b in range(_SH_BITS):
        bit = F.when(F.col(f"c{b}") * 2 > F.col("n"),
                     F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp + bit
    fps = counts.select("doc_id", fp.alias("fp"))

    def chunk(k: int):
        mask = (1 << _SH_WIDTHS[k]) - 1
        return F.shiftright(F.col("fp"), _SH_OFFSETS[k]) \
                .bitwiseAND(F.lit(mask).cast("long"))

    chunked = fps.select(
        "doc_id", "fp",
        F.posexplode(F.array(*[
            chunk(a) * F.lit(1 << _SH_SHIFT) + chunk(b)
            for a, b in _SH_COMBOS
        ])).alias("c", "cval"),
    )
    left = chunked.select(F.col("doc_id").alias("i"),
                          F.col("fp").alias("fp_i"), "c", "cval")
    right = chunked.select(F.col("doc_id").alias("j"),
                           F.col("fp").alias("fp_j"), "c", "cval")
    return (
        left.join(right, ["c", "cval"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j",
                F.bit_count(F.col("fp_i").bitwiseXOR(F.col("fp_j")))
                 .cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= _SH_H)
        .distinct()
    )


# ---------------------------------------------------------------------------
# q_cohens_kappa — inter-rater agreement between the stopword-profile
# language classifier and the corpus labels, as Cohen's kappa. The
# entire statistic reduces to ONE division of exact integers:
# kappa = (po - pe) / (1 - pe) = (diag*N - Σ row_k*col_k) /
# (N² - Σ row_k*col_k), so both engines divide the same two bigints
# (exact while N < ~3e9 — int64 N² headroom). Confusion cells are a
# handful of rows (|langs|² ≤ 25); everything after the one corpus
# scan is broadcast-sized.
# ---------------------------------------------------------------------------
_KAPPA_ORACLE = f"""
WITH scored AS (
  SELECT lang AS t, {tx.sql_predict_lang("text")} AS p
  FROM documents
),
cells AS (SELECT t, p, CAST(count(*) AS BIGINT) AS n FROM scored GROUP BY t, p),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n,
               CAST(sum(CASE WHEN t = p THEN n ELSE 0 END) AS BIGINT) AS diag
        FROM cells),
marg AS (
  SELECT CAST(sum(r.rn * c.cn) AS BIGINT) AS pe_num
  FROM (SELECT t, CAST(sum(n) AS BIGINT) AS rn FROM cells GROUP BY t) r
  JOIN (SELECT p, CAST(sum(n) AS BIGINT) AS cn FROM cells GROUP BY p) c
    ON r.t = c.p
)
SELECT big_n AS n, diag AS n_agree,
       {sql_pround6("CAST(diag * big_n - pe_num AS DOUBLE)"
                    " / CAST(big_n * big_n - pe_num AS DOUBLE)")} AS kappa
FROM tot, marg
"""


@register("q_cohens_kappa", oracle=_KAPPA_ORACLE)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(F.col("lang").alias("t"),
                         tx.predict_lang(F.col("text")).alias("p"))
    cells = scored.groupBy("t", "p").agg(lcount("n"))
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("big_n"),
        F.sum(F.when(F.col("t") == F.col("p"), F.col("n")).otherwise(0))
         .cast("bigint").alias("diag"))
    rows_m = cells.groupBy("t").agg(F.sum("n").cast("bigint").alias("rn"))
    cols_m = cells.groupBy("p").agg(F.sum("n").cast("bigint").alias("cn"))
    pe = (rows_m.join(cols_m, rows_m.t == cols_m.p)
          .agg(F.sum(F.col("rn") * F.col("cn")).cast("bigint").alias("pe_num")))
    return (tot.crossJoin(F.broadcast(pe))
            .select(F.col("big_n").alias("n"), F.col("diag").alias("n_agree"),
                    pround6((F.col("diag") * F.col("big_n") - F.col("pe_num"))
                            .cast("double")
                            / (F.col("big_n") * F.col("big_n") - F.col("pe_num"))
                            .cast("double")).alias("kappa")))


# ---------------------------------------------------------------------------
# tx_dedup_impact — the report a data engineer reads BEFORE committing
# an exact-dedup run: per source, how many docs are non-canonical
# copies (same md5(text), higher doc_id than the keeper) and what
# share of the tokens dedup would drop. Canonicalization is global
# (copies across sources count against the source holding the copy,
# matching dd_exact / dd_keep_canonical semantics). One scan; the
# min-per-hash window shuffles (16-byte md5, doc_id, token count)
# only; the report is |sources| rows.
# ---------------------------------------------------------------------------
_DEDUP_IMPACT_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, md5(text) AS h, len({_TOKS}) AS nt
  FROM documents
),
flagged AS (
  SELECT source, nt,
         CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY h)
              THEN 1 ELSE 0 END AS is_dup
  FROM d
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(is_dup) AS BIGINT) AS n_dups,
       CAST(sum(nt) AS BIGINT) AS tok_total,
       CAST(sum(is_dup * nt) AS BIGINT) AS tok_dropped,
       {sql_pround6("CAST(sum(is_dup * nt) AS DOUBLE) / CAST(sum(nt) AS DOUBLE)")}
         AS savings
FROM flagged GROUP BY source
"""


@register("tx_dedup_impact", oracle=_DEDUP_IMPACT_ORACLE)
def tx_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", F.md5("text").alias("h"),
        F.size(tx.tokens(F.col("text"))).cast("bigint").alias("nt"))
    keep = F.min("doc_id").over(W.partitionBy("h"))
    flagged = d.select(
        "source", "nt",
        F.when(F.col("doc_id") != keep, 1).otherwise(0).alias("is_dup"))
    return (flagged.groupBy("source").agg(
        lcount("n_docs"),
        F.sum("is_dup").cast("bigint").alias("n_dups"),
        F.sum("nt").cast("bigint").alias("tok_total"),
        F.sum(F.col("is_dup") * F.col("nt")).cast("bigint").alias("tok_dropped"))
        .withColumn("savings", pround6(
            F.col("tok_dropped").cast("double")
            / F.col("tok_total").cast("double"))))


# ---------------------------------------------------------------------------
# tt_group_kfold — leakage-aware cross-validation folds: every SOURCE
# lands wholly in one fold (fold = md5(source) mod k, the portable
# deterministic sampler), so near-identical docs from one provenance
# can never straddle train/validation. Output is the fold manifest;
# the no-straddle property is structural (a pure function of source)
# and pinned by the replay test. Map-only + one k-row agg at any scale.
# ---------------------------------------------------------------------------
_GROUP_KFOLD_K = 5

_GROUP_KFOLD_ORACLE = f"""
WITH d AS (
  SELECT source, len({_TOKS}) AS nt,
         ('0x' || substr(md5(source), 1, 8))::BIGINT % {_GROUP_KFOLD_K} AS fold
  FROM documents
)
SELECT fold, CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens
FROM d GROUP BY fold
"""


@register("tt_group_kfold", oracle=_GROUP_KFOLD_ORACLE)
def tt_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        F.size(tx.tokens(F.col("text"))).cast("bigint").alias("nt"),
        (_md5_32(F.col("source")) % _GROUP_KFOLD_K).alias("fold"))
    return d.groupBy("fold").agg(
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        lcount("n_docs"),
        F.sum("nt").cast("bigint").alias("n_tokens"))


# ---------------------------------------------------------------------------
# s_name_idf_score — rare-name-token weighting for watchlist match
# scoring: a hit on "Ishakzai" should outweigh a hit on "Mohammed", so
# each alias gets Σ idf(token) over its DISTINCT name tokens, with
# idf = ln((N+1)/(df+1)) over the alias corpus (the standard
# TF-IDF-name-screening technique). The idf table is vocabulary-sized
# (broadcast); per-alias sums fold in sorted token order so the double
# accumulation is bit-identical cross-engine.
# ---------------------------------------------------------------------------
_NAME_IDF_ORACLE = f"""
WITH {fx.sql_cte("aliases")},
toks AS (
  SELECT DISTINCT entity_id, alias_idx,
         unnest(string_split(trim(regexp_replace(lower(whole_name),
                                                 '\\s+', ' ', 'g')), ' ')) AS tok
  FROM aliases
),
n_al AS (SELECT CAST(count(*) AS BIGINT) AS n FROM aliases),
dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY tok),
scored AS (
  SELECT t.entity_id, t.alias_idx,
         ln((CAST((SELECT n FROM n_al) AS DOUBLE) + 1.0)
            / (CAST(d.df AS DOUBLE) + 1.0)) AS idf
  FROM toks t JOIN dfq d ON t.tok = d.tok
)
SELECT entity_id, alias_idx, CAST(count(*) AS BIGINT) AS n_tokens,
       round(list_aggregate(list_sort(list(idf)), 'sum'), 6) AS idf_score
FROM scored GROUP BY entity_id, alias_idx
"""


@register("s_name_idf_score", oracle=_NAME_IDF_ORACLE)
def s_name_idf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    al = fx.spark_df(spark, "aliases")
    toks = al.select(
        "entity_id", "alias_idx",
        F.explode(F.split(F.trim(F.regexp_replace(
            F.lower("whole_name"), r"\s+", " ")), " ")).alias("tok"),
    ).distinct()
    n_al = al.count()  # bounded driver scalar: fixture corpus size
    dfq = toks.groupBy("tok").agg(lcount("df"))
    scored = toks.join(F.broadcast(dfq), "tok").select(
        "entity_id", "alias_idx",
        F.log((F.lit(float(n_al)) + 1.0)
              / (F.col("df").cast("double") + 1.0)).alias("idf"))
    fold = F.aggregate(
        F.array_sort(F.collect_list("idf")), F.lit(0.0),
        lambda acc, v: acc + v)
    return (scored.groupBy("entity_id", "alias_idx")
            .agg(lcount("n_tokens"), F.round(fold, 6).alias("idf_score")))


# ---------------------------------------------------------------------------
# q_cagr — compound annual growth rate of per-nation revenue between
# each nation's first and last order year: (rev1/rev0)^(1/(y1-y0)) - 1
# computed as exp(ln(rev1/rev0)/(y1-y0)) on both engines. Yearly
# revenue is decimal-exact (dsum) so the doubles entering ln are
# bit-identical; the join tree is the standard TPC-H shape (lineitem
# ⋈ orders ⋈ customer with nation broadcast).
# ---------------------------------------------------------------------------
_CAGR_ORACLE = f"""
WITH yearly AS (
  SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
         {sql_dsum(SQL_REVENUE, "rev")}
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, year(o.o_orderdate)
),
span AS (
  SELECT nation, min(yr) AS y0, max(yr) AS y1 FROM yearly GROUP BY nation
)
SELECT s.nation, s.y0, s.y1, a.rev AS rev0, b.rev AS rev1,
       {sql_pround6("exp(ln(b.rev / a.rev) / CAST(s.y1 - s.y0 AS DOUBLE)) - 1.0")}
         AS cagr
FROM span s
JOIN yearly a ON a.nation = s.nation AND a.yr = s.y0
JOIN yearly b ON b.nation = s.nation AND b.yr = s.y1
WHERE s.y1 > s.y0 AND a.rev > 0
"""


@register("q_cagr", oracle=_CAGR_ORACLE)
def q_cagr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = dval("l_extendedprice") * (F.lit(1).cast("decimal(8,4)")
                                     - drate("l_discount"))
    yearly = (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .join(cust, orders.o_custkey == cust.c_custkey)
              .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
              .groupBy(F.col("n_name").alias("nation"),
                       F.year("o_orderdate").cast("bigint").alias("yr"))
              .agg(dsum(rev, "rev")))
    span = yearly.groupBy("nation").agg(F.min("yr").alias("y0"),
                                        F.max("yr").alias("y1"))
    a = yearly.select(F.col("nation").alias("nat_a"), F.col("yr").alias("ya"),
                      F.col("rev").alias("rev0"))
    b = yearly.select(F.col("nation").alias("nat_b"), F.col("yr").alias("yb"),
                      F.col("rev").alias("rev1"))
    return (span
            .join(a, (F.col("nation") == F.col("nat_a"))
                  & (F.col("y0") == F.col("ya")))
            .join(b, (F.col("nation") == F.col("nat_b"))
                  & (F.col("y1") == F.col("yb")))
            .filter((F.col("y1") > F.col("y0")) & (F.col("rev0") > 0))
            .select("nation", "y0", "y1", "rev0", "rev1",
                    pround6(F.exp(F.log(F.col("rev1") / F.col("rev0"))
                                  / (F.col("y1") - F.col("y0")).cast("double"))
                            - 1.0).alias("cagr")))

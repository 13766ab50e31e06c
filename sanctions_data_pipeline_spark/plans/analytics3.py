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

from pyspark.sql import DataFrame, SparkSession, functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.operators import textstats as tx
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

"""Deduplication operators for large-scale text corpora.

All shuffle-conscious: signatures (md5 / minhash / simhash) are computed
map-side in one projection so the shuffle moves ~16-byte keys, never
document text; candidate generation joins only within buckets.

At 100 TB: exact dedup shuffles |docs| hash keys; MinHash-LSH shuffles
|docs|x bands band-signatures; verification joins fetch text for the
candidate pairs only (a tiny fraction of the corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def normalized_text(col: Column) -> Column:
    """Canonical form for exact dedup: lower + ws-collapse."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text
    with the minimum id as keeper and the duplicate count."""
    return (
        docs.select(F.col(id_col),
                    F.md5(normalized_text(F.col(text_col))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )


def word_shingles(text_col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a whitespace-tokenized text.
    Guarded for texts shorter than k words (Spark's sequence(0, n)
    DESCENDS when n < 0, it does not return empty)."""
    toks = F.split(normalized_text(text_col), " ")
    return F.when(F.size(toks) >= k, F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    ))).otherwise(F.array().cast("array<string>"))


def jaccard(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over distinct-element arrays (exact, int/int
    division in double — deterministic across engines)."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def ngram_jaccard_pairs(docs: DataFrame, block_cols: list[str],
                        threshold: float, k: int = 3,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Exact all-pairs shingle-Jaccard within blocking groups.

    The blocking key bounds the quadratic term; at scale callers pass a
    cheap high-selectivity block (language + length bucket + LSH band).
    Output: (i, j, jac) with i < j and jac >= threshold.
    """
    s = docs.select(
        *block_cols,
        F.col(id_col).alias("i"),
        word_shingles(F.col(text_col), k).alias("sh"),
    )
    t = s.select(*block_cols, F.col("i").alias("j"), F.col("sh").alias("sh2"))
    pairs = s.join(t, on=block_cols).filter(F.col("i") < F.col("j"))
    jac = jaccard(F.col("sh"), F.col("sh2"))
    return (
        pairs.withColumn("jac", F.round(jac, 6))
        .filter(F.col("jac") >= threshold)
        .select("i", "j", "jac")
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = 32, k: int = 3,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """MinHash signatures computed entirely in JVM expressions:
    sig[h] = min over shingles of xxhash64(shingle, h)."""
    sh = word_shingles(F.col(text_col), k)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda h: F.array_min(F.transform(
            sh, lambda s: F.xxhash64(F.concat(s, F.lit("#"), h.cast("string"))))),
    )
    return docs.select(F.col(id_col), sig.alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, n_hashes: int = 32, bands: int = 8,
                      threshold: float = 0.5, k: int = 3,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """MinHash + LSH banding + exact-Jaccard verification.

    rows-per-band r = n_hashes/bands; a pair becomes a candidate when
    any band signature matches, then is verified with exact Jaccard.
    Output: (i, j, jac) — high recall (not guaranteed total) at ~0 cost
    compared to all-pairs.
    """
    r = n_hashes // bands
    sigs = minhash_signatures(docs, n_hashes, k, id_col, text_col)
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(F.concat_ws(
                ",", F.transform(F.slice(F.col("sig"), b * r + 1, r),
                                 lambda x: x.cast("string")))),
        )).alias("band_id", "band_sig"),
    )
    left = banded.select(F.col(id_col).alias("i"), "band_id", "band_sig")
    right = banded.select(F.col(id_col).alias("j"), "band_id", "band_sig")
    cand = (
        left.join(right, ["band_id", "band_sig"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j").distinct()
    )
    sh = docs.select(F.col(id_col), word_shingles(F.col(text_col), k).alias("sh"))
    verified = (
        cand.join(sh.withColumnRenamed(id_col, "i").withColumnRenamed("sh", "sh_i"), "i")
        .join(sh.withColumnRenamed(id_col, "j").withColumnRenamed("sh", "sh_j"), "j")
        .withColumn("jac", F.round(jaccard(F.col("sh_i"), F.col("sh_j")), 6))
        .filter(F.col("jac") >= threshold)
        .select("i", "j", "jac")
    )
    return verified


def _pow2_array(n_bits: int = 64) -> Column:
    """[2^0, 2^1, ..., 2^63] as a long-array literal (bit 63 is the
    sign bit, stored as long min). Shift amounts must be Python ints in
    Spark, so bit tests go through element_at + bitwiseAND instead."""
    vals = [1 << b for b in range(min(n_bits, 63))]
    if n_bits == 64:
        vals.append(-(2 ** 63))
    return F.array(*[F.lit(v).cast("long") for v in vals])


def simhash(text_col: Column, n_bits: int = 64) -> Column:
    """64-bit SimHash: per-token xxhash64; bit j of the fingerprint is
    the sign of the sum over tokens of ±1 on that bit. One aggregate
    expression — no UDF, no shuffle."""
    toks = F.split(normalized_text(text_col), " ")
    pow2 = _pow2_array(n_bits)
    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), n_bits),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(1), F.lit(n_bits)),
                lambda j: F.when(
                    F.xxhash64(t).bitwiseAND(F.element_at(pow2, j)) != 0,
                    F.lit(1)).otherwise(F.lit(-1)).cast("long")),
            lambda a, b: a + b),
    )
    return F.aggregate(
        F.zip_with(
            counts,
            F.sequence(F.lit(1), F.lit(n_bits)),
            lambda c, j: F.when(c > 0, F.element_at(pow2, j))
                          .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, bucketed by 16-bit
    chunks (a pair within hamming<=3 of a 64-bit hash shares at least
    one of 4 chunks exactly — pigeonhole), verified with bit_count."""
    sh = docs.select(F.col(id_col), simhash(F.col(text_col)).alias("sh"))
    chunked = sh.select(
        id_col, "sh",
        F.posexplode(F.array(*[
            F.shiftright(F.col("sh"), c * 16).bitwiseAND(F.lit(0xFFFF))
            for c in range(4)
        ])).alias("chunk_id", "chunk_val"),
    )
    left = chunked.select(F.col(id_col).alias("i"), F.col("sh").alias("sh_i"),
                          "chunk_id", "chunk_val")
    right = chunked.select(F.col(id_col).alias("j"), F.col("sh").alias("sh_j"),
                           "chunk_id", "chunk_val")
    return (
        left.join(right, ["chunk_id", "chunk_val"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j", F.bit_count(F.col("sh_i").bitwiseXOR(F.col("sh_j"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )

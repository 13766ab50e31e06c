"""Round-4 analytics (continued): pure-python replays of the daily
event-value series screens against the same parquet inputs."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import Decimal

from sanctions_data_pipeline_spark.catalog import load_table
from sanctions_data_pipeline_spark.plans import registry


def _run(spark, sf_dir, name):
    return registry.queries()[name](spark, sf_dir)


def _daily_x4(spark, sf_dir):
    """day -> exact x4 fixed-point sum of events.value (UTC days)."""
    ev = load_table(spark, sf_dir, "events").select("ts", "value").collect()
    acc = defaultdict(Decimal)
    for r in ev:
        if r.value is not None:
            acc[r.ts.date()] += Decimal(str(r.value)).quantize(
                Decimal("0.0001"))
    return {d: int(v.quantize(Decimal("0.0001")) * 10000)
            for d, v in acc.items()}


def test_bollinger_replay(spark, sf_dir):
    got = {r.day: r for r in
           _run(spark, sf_dir, "q_bollinger_bands").collect()}
    x4 = _daily_x4(spark, sf_dir)
    days = sorted(x4)
    assert len(got) == len(days)
    for i, d in enumerate(days):
        win = [x4[w] for w in days[max(0, i - 19):i + 1]]
        n = len(win)
        mean4 = sum(win) / n
        sd4 = math.sqrt(sum((v - mean4) ** 2 for v in win) / n)
        r = got[d.isoformat()]
        assert r.n == n
        assert r.x == x4[d] / 10000.0
        assert abs(r.mean - mean4 / 10000.0) < 1e-3
        assert abs(r.sd - sd4 / 10000.0) < 1e-3
        assert abs(r.upper - (mean4 + 2 * sd4) / 10000.0) < 1e-3
        assert abs(r.lower - (mean4 - 2 * sd4) / 10000.0) < 1e-3
        if sd4 > 0:
            want = (x4[d] - (mean4 - 2 * sd4)) / (4 * sd4)
            assert abs(r.pct_b - want) < 1e-4
            # |z| ≤ √(n−1) bounds %B: within [1/2 − √(n−1)/4, 1/2 + √(n−1)/4]
            assert abs(r.pct_b - 0.5) <= math.sqrt(n - 1) / 4 + 1e-9


def test_drawdown_replay(spark, sf_dir):
    got = {r.day: r for r in _run(spark, sf_dir, "q_drawdown").collect()}
    x4 = _daily_x4(spark, sf_dir)
    cum, peak = 0, 0
    for d in sorted(x4):
        cum += x4[d]
        peak = max(peak, cum)
        r = got[d.isoformat()]
        assert r.cum_value == cum / 10000.0
        assert r.peak_value == peak / 10000.0
        assert r.drawdown == (peak - cum) / 10000.0
        if peak > 0:
            assert abs(r.drawdown_pct - (peak - cum) / peak) < 1e-6
            assert 0.0 <= r.drawdown_pct <= 1.0


def test_rsi_replay(spark, sf_dir):
    got = {r.day: r for r in _run(spark, sf_dir, "q_rsi").collect()}
    x4 = _daily_x4(spark, sf_dir)
    days = sorted(x4)
    diffs = [(days[i], x4[days[i]] - x4[days[i - 1]])
             for i in range(1, len(days))]
    assert len(got) == len(diffs)
    for i, (d, _) in enumerate(diffs):
        win = diffs[max(0, i - 13):i + 1]
        gains = sum(max(dv, 0) for _, dv in win)
        losses = sum(max(-dv, 0) for _, dv in win)
        r = got[d.isoformat()]
        assert r.n_diffs == len(win)
        assert r.gain_sum == gains / 10000.0
        assert r.loss_sum == losses / 10000.0
        if gains + losses > 0:
            assert abs(r.rsi - 100.0 * gains / (gains + losses)) < 1e-4
            assert 0.0 <= r.rsi <= 100.0


def test_spearman_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_spearman_corr").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("ts", "value").collect()
    n_by, x4 = defaultdict(int), _daily_x4(spark, sf_dir)
    for r in ev:
        n_by[r.ts.date()] += 1
    days = sorted(n_by)
    m = len(days)
    rn = {d: i + 1 for i, d in
          enumerate(sorted(days, key=lambda d: (n_by[d], d)))}
    rv = {d: i + 1 for i, d in
          enumerate(sorted(days, key=lambda d: (x4[d], d)))}
    sum_d2 = sum((rn[d] - rv[d]) ** 2 for d in days)
    assert (got.m, got.sum_d2) == (m, sum_d2)
    rho = 1.0 - 6.0 * sum_d2 / (m * (m * m - 1.0))
    assert abs(got.spearman_rho - rho) < 1e-6
    assert -1.0 <= got.spearman_rho <= 1.0


def test_reservoir_sample_replay(spark, sf_dir):
    import hashlib
    rows = _run(spark, sf_dir, "tt_reservoir_sample").collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    by_src = defaultdict(list)
    for d in docs:
        key = hashlib.md5(str(d.doc_id).encode()).hexdigest()
        by_src[d.source].append((key, d.doc_id))
    want = {}
    for src, items in by_src.items():
        items.sort()
        for rk, (key, doc_id) in enumerate(items[:50], start=1):
            want[(src, rk)] = (doc_id, key)
    assert len(rows) == len(want)
    for r in rows:
        doc_id, key = want[(r.source, r.rk)]
        assert (r.doc_id, r.sample_key) == (doc_id, key)


def test_interevent_stats_replay(spark, sf_dir):
    got = {r.user_id: r for r in
           _run(spark, sf_dir, "q_interevent_stats").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id").collect()
    by_user = defaultdict(list)
    for r in ev:
        # µs since epoch; ts is tz-naive UTC in the test data
        from datetime import timezone
        us = int(r.ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        by_user[r.user_id].append((r.ts, r.event_id, us))
    for u, items in by_user.items():
        items.sort()
        gaps = [b[2] - a[2] for a, b in zip(items, items[1:])]
        if not gaps:
            assert u not in got
            continue
        r = got[u]
        assert r.n_events == len(items)
        assert r.n_gaps == len(gaps)
        assert (r.min_gap_us, r.max_gap_us) == (min(gaps), max(gaps))
        assert abs(r.mean_gap_s - sum(gaps) / len(gaps) / 1e6) < 1e-5


def test_user_entropy_replay(spark, sf_dir):
    got = {r.user_id: r for r in
           _run(spark, sf_dir, "q_user_entropy").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type").collect()
    cnt = defaultdict(lambda: defaultdict(int))
    for r in ev:
        cnt[r.user_id][r.event_type] += 1
    for u, types in cnt.items():
        n = sum(types.values())
        h = -sum(c / n * math.log(c / n) for _, c in sorted(types.items()))
        r = got[u]
        assert (r.n, r.k) == (n, len(types))
        assert abs(r.entropy - h) < 1e-5
        if len(types) > 1:
            assert abs(r.norm_entropy - h / math.log(len(types))) < 1e-5
            assert -1e-9 <= r.norm_entropy <= 1.0 + 1e-9
        else:
            assert r.norm_entropy is None
            assert abs(r.entropy) < 1e-12


def test_bigram_pmi_replay(spark, sf_dir):
    import re
    rows = _run(spark, sf_dir, "tx_bigram_pmi").collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    uni, bi = defaultdict(int), defaultdict(int)
    for d in docs:
        if not d.text:
            continue
        toks = re.sub(r"\s+", " ", d.text.lower()).strip().split(" ")
        for w in toks:
            uni[w] += 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] += 1
    n, nb = sum(uni.values()), sum(bi.values())
    pmi = {}
    for (a, b), c in bi.items():
        if c >= 5:
            pmi[(a, b)] = (math.log(c) - math.log(nb)
                           - (math.log(uni[a]) - math.log(n))
                           - (math.log(uni[b]) - math.log(n)))
    ranked = sorted(pmi.items(), key=lambda kv: (-round(kv[1], 6),
                                                 kv[0][0], kv[0][1]))[:100]
    assert len(rows) == min(100, len(ranked))
    for r, ((a, b), p) in zip(rows, ranked):
        assert (r.w1, r.w2) == (a, b)
        assert (r.c_xy, r.c_x, r.c_y) == (bi[(a, b)], uni[a], uni[b])
        assert abs(r.pmi - p) < 1e-5


def test_orc_roundtrip_is_identity(spark, sf_dir):
    import hashlib
    got = {r.doc_id: r for r in
           _run(spark, sf_dir, "io_orc_roundtrip").collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    assert len(got) == len(docs)
    for doc in docs:
        assert got[doc.doc_id].text_md5 == \
            hashlib.md5(doc.text.encode()).hexdigest()
        assert got[doc.doc_id].n_chars_rt == len(doc.text)


def test_pettitt_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_pettitt_test").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    days = sorted(daily)
    xs = [daily[d] for d in days]
    n = len(xs)

    def sgn(a):
        return (a > 0) - (a < 0)

    best = None
    u = 0
    for t in range(n - 1):  # U_t for t = 1..n-1 (0-indexed prefix end t)
        u += sum(sgn(xs[t] - xs[j]) for j in range(n) if j != t)
        if best is None or abs(u) > abs(best[1]):
            best = (t, u)
    t_star, u_t = best
    k = abs(u_t)
    assert got.n == n
    assert got.t_star == days[t_star].isoformat()
    assert (got.u_t, got.k_stat) == (u_t, k)
    p = 2.0 * math.exp(-6.0 * k * k / (n ** 3 + n ** 2))
    assert abs(got.p_value - min(p, p)) < 1e-6


def test_round_amount_bias_replay(spark, sf_dir):
    got = {r.user_id: r for r in
           _run(spark, sf_dir, "s_round_amount_bias").collect()}
    ev = load_table(spark, sf_dir, "events").filter(
        "event_type = 'purchase' AND value IS NOT NULL").select(
        "user_id", "value").collect()
    n_by, r_by = defaultdict(int), defaultdict(int)
    for r in ev:
        n_by[r.user_id] += 1
        x4 = int(Decimal(str(r.value)).quantize(Decimal("0.0001")) * 10000)
        if x4 % 1000000 == 0:
            r_by[r.user_id] += 1
    tot, tot_r = sum(n_by.values()), sum(r_by.values())
    p0 = tot_r / tot
    assert len(got) == len(n_by)
    for u, n in n_by.items():
        r = got[u]
        assert (r.n, r.n_round) == (n, r_by[u])
        assert abs(r.round_share - r_by[u] / n) < 1e-6
        if 0.0 < p0 < 1.0:
            z = (r_by[u] - n * p0) / math.sqrt(n * p0 * (1 - p0))
            assert abs(r.z_score - z) < 1e-4


def test_business_days_replay(spark, sf_dir):
    from datetime import timedelta
    rows = _run(spark, sf_dir, "q_business_days").collect()
    orders = {r.o_orderkey: r.o_orderdate.date() for r in
              load_table(spark, sf_dir, "orders").collect()}
    li = load_table(spark, sf_dir, "lineitem").collect()
    want = Counter()
    for r in li:
        od, sd = orders[r.l_orderkey], r.l_shipdate.date()
        nd = (sd - od).days
        if nd < 0:
            continue
        # weekdays in [order_day, ship_day); (orderkey, linenumber) is
        # NOT unique in the synthetic lineitem -> multiset compare
        bd = sum(1 for k in range(nd)
                 if (od + timedelta(days=k)).isoweekday() <= 5)
        want[(r.l_orderkey, r.l_linenumber, nd, bd)] += 1
    got = Counter((r.l_orderkey, r.l_linenumber,
                   r.calendar_days, r.business_days) for r in rows)
    assert got == want


def test_emb_norm_stats_replay(spark, sf_dir):
    got = {r.label: r for r in _run(spark, sf_dir, "emb_norm_stats").collect()}
    emb = load_table(spark, sf_dir, "embeddings").collect()
    by_label = defaultdict(list)
    for r in emb:
        # sequential fold, same order as the zip_with/aggregate dot
        acc = 0.0
        for x in r.embedding:
            acc += float(x) * float(x)
        by_label[r.label].append((r.vec_id, math.sqrt(acc)))
    for lab, items in by_label.items():
        r = got[lab]
        norms = [v for _, v in sorted(items)]
        assert r.n == len(norms)
        assert abs(r.min_norm - min(norms)) < 1e-6
        assert abs(r.max_norm - max(norms)) < 1e-6
        assert abs(r.mean_norm - sum(norms) / len(norms)) < 1e-5


def test_cosine_histogram_replay(spark, sf_dir):
    rows = {r.bucket: r for r in
            _run(spark, sf_dir, "sim_cosine_histogram").collect()}
    emb = {r.vec_id: [float(x) for x in r.embedding] for r in
           load_table(spark, sf_dir, "embeddings").collect()}
    buckets = defaultdict(int)
    for i, v in emb.items():
        w = emb.get(i + 1)
        if w is None:
            continue
        dot = sum(a * b for a, b in zip(v, w))
        na = math.sqrt(sum(a * a for a in v))
        nb = math.sqrt(sum(b * b for b in w))
        c = round(dot / (na * nb), 6)
        buckets[min(max(int(math.floor((c + 1.0) * 10.0)), 0), 19)] += 1
    assert {b: r.n_pairs for b, r in rows.items()} == dict(buckets)
    for b, r in rows.items():
        assert abs(r.lo - (-1.0 + b * 0.1)) < 1e-9
        assert abs(r.hi - (-1.0 + (b + 1) * 0.1)) < 1e-9


def test_quantile_bins_replay(spark, sf_dir):
    got = {r.bin: r for r in _run(spark, sf_dir, "q_quantile_bins").collect()}
    orders = load_table(spark, sf_dir, "orders").collect()
    vals = sorted((int(Decimal(str(r.o_totalprice)).quantize(
        Decimal("0.0001")) * 10000), r.o_orderkey) for r in orders)
    n = len(vals)
    base, extra = divmod(n, 10)
    i = 0
    for b in range(1, 11):
        size = base + (1 if b <= extra else 0)
        chunk = [v for v, _ in vals[i:i + size]]
        i += size
        r = got[b]
        assert r.n == size
        assert r.lo == min(chunk) / 10000.0
        assert r.hi == max(chunk) / 10000.0
        assert r.bin_sum == sum(chunk) / 10000.0
    # bins tile the value range in order
    for b in range(1, 10):
        assert got[b].hi <= got[b + 1].lo


def test_poisson_dispersion_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_poisson_dispersion").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    xs = list(daily.values())
    m, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
    mean = sx / m
    var = (sxx - sx * sx / m) / m
    assert (got.m, got.n_events) == (m, sx)
    assert abs(got.mean - mean) < 1e-6
    assert abs(got.variance - var) < 1e-4
    assert abs(got.dispersion - var / mean) < 1e-5
    assert abs(got.chi2_stat - (m - 1) * var / mean) < 1e-2


def test_transitivity_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "gr_transitivity").collect()[0]
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_orderkey < 2000").select("l_orderkey", "l_partkey").collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for ii in range(len(ps)):
            for jj in range(ii + 1, len(ps)):
                edges.add((ps[ii], ps[jj]))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = sum(1 for u, v in edges for w in adj[u] & adj[v] if w > v)
    wedges = sum(len(nb) * (len(nb) - 1) // 2 for nb in adj.values())
    assert (got.n_nodes, got.n_edges) == (len(adj), len(edges))
    assert (got.n_triangles, got.n_wedges) == (tri, wedges)
    if wedges:
        assert abs(got.transitivity - 3.0 * tri / wedges) < 1e-6
        assert 0.0 <= got.transitivity <= 1.0


def test_oov_rate_replay(spark, sf_dir):
    import re
    got = {r.doc_id: r for r in _run(spark, sf_dir, "tok_oov_rate").collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    uni = defaultdict(int)
    toks_by = {}
    for d in docs:
        if not d.text:
            continue
        toks = re.sub(r"\s+", " ", d.text.lower()).strip().split(" ")
        toks_by[d.doc_id] = toks
        for w in toks:
            uni[w] += 1
    vocab = {w for w, _ in sorted(uni.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:1000]}
    assert len(got) == len(toks_by)
    for doc_id, toks in toks_by.items():
        oov = sum(1 for w in toks if w not in vocab)
        r = got[doc_id]
        assert (r.n_tokens, r.n_oov) == (len(toks), oov)
        assert abs(r.oov_rate - oov / len(toks)) < 1e-6


def test_user_recs_replay(spark, sf_dir):
    rows = _run(spark, sf_dir, "pr_user_recs").collect()
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_orderkey < 4000").select("l_orderkey", "l_partkey").collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    cooc = defaultdict(int)
    deg = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for p in ps:
            deg[p] += 1
        for ii in range(len(ps)):
            for jj in range(ii + 1, len(ps)):
                cooc[(ps[ii], ps[jj])] += 1
    edge = defaultdict(dict)  # i -> j -> cos
    for (i, j), c in cooc.items():
        if c >= 2:
            cos = c / math.sqrt(deg[i] * deg[j])
            edge[i][j] = cos
            edge[j][i] = cos
    want = {}
    for o, parts in by_order.items():
        scores = defaultdict(list)
        for p in sorted(parts):
            for j, cos in edge.get(p, {}).items():
                if j not in parts:
                    scores[j].append((p, cos))
        cand = []
        for j, contribs in scores.items():
            s = 0.0
            for _, cos in sorted(contribs):
                s += cos
            cand.append((round(s, 6), j, len(contribs)))
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rk, (s, j, np_) in enumerate(cand[:3], start=1):
            want[(o, rk)] = (j, np_, s)
    got = {(r.orderkey, r.rk): (r.item, r.n_paths, r.score) for r in rows}
    assert got == want


def test_schema_evolution_replay(spark, sf_dir):
    got = {r.doc_id: r for r in
           _run(spark, sf_dir, "io_schema_evolution").collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    assert len(got) == len(docs)
    for d in docs:
        r = got[d.doc_id]
        if d.doc_id % 2 == 0:
            assert (r.source_filled, r.generation) == ("legacy", "v1")
        else:
            assert (r.source_filled, r.generation) == (d.source, "v2")
        assert r.n_chars_rt == len(d.text)
        assert r.lang == d.lang


def test_grubbs_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_grubbs_test").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    days = sorted(daily)
    xs = [daily[d] for d in days]
    m = len(xs)
    mean = sum(xs) / m
    sd = math.sqrt((sum(x * x for x in xs) - sum(xs) ** 2 / m) / (m - 1))
    devs = [abs(x - mean) for x in xs]
    worst = max(range(m), key=lambda i: (devs[i], -i))
    assert got.m == m
    assert got.worst_day == days[worst].isoformat()
    assert got.worst_count == xs[worst]
    assert abs(got.max_dev - devs[worst]) < 1e-5
    assert abs(got.g_stat - devs[worst] / sd) < 1e-5


def test_hourly_heatmap_replay(spark, sf_dir):
    got = {(r.dow, r.hr): r for r in
           _run(spark, sf_dir, "q_hourly_heatmap").collect()}
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    cnt = defaultdict(int)
    for r in ev:
        cnt[(r.ts.isoweekday(), r.ts.hour)] += 1
    tot = sum(cnt.values())
    dow_tot = defaultdict(int)
    for (dw, _), n in cnt.items():
        dow_tot[dw] += n
    assert len(got) == len(cnt)
    for (dw, hr), n in cnt.items():
        r = got[(dw, hr)]
        assert r.n == n
        assert abs(r.share - n / tot) < 1e-6
        assert abs(r.dow_share - n / dow_tot[dw]) < 1e-6


def test_asof_nearest_replay(spark, sf_dir):
    got = {r.event_id: r for r in
           _run(spark, sf_dir, "q_asof_nearest").collect()}
    from datetime import timezone

    def us(ts):
        return int(ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type").collect()
    clicks = [r for r in ev if r.event_type == "click"]
    purch = defaultdict(list)
    for r in ev:
        if r.event_type == "purchase":
            purch[r.user_id].append((us(r.ts), r.event_id))
    for p in purch.values():
        p.sort()
    assert len(got) == len(clicks)
    for c in clicks:
        cu = us(c.ts)
        ps = purch.get(c.user_id, [])
        back = max(((u, e) for u, e in ps if u <= cu), default=None)
        fwd = min(((u, e) for u, e in ps if u > cu), default=None)
        r = got[c.event_id]
        if back is None and fwd is None:
            assert r.near_p_event_id is None and r.delta_us is None
        elif back is not None and (fwd is None
                                   or cu - back[0] <= fwd[0] - cu):
            assert (r.near_p_event_id, r.delta_us) == (back[1],
                                                       -(cu - back[0]))
        else:
            assert (r.near_p_event_id, r.delta_us) == (fwd[1], fwd[0] - cu)


def test_concurrency_profile_replay(spark, sf_dir):
    from datetime import datetime, timezone
    got = {r.day: r for r in
           _run(spark, sf_dir, "q_concurrency_profile").collect()}
    ev = load_table(spark, sf_dir, "events").select("ts").collect()

    def us(ts):
        return int(ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)

    pts = []
    for r in ev:
        pts.append((us(r.ts), 1))
        pts.append((us(r.ts) + 30 * 60 * 1_000_000, -1))
    pts.sort()
    conc = 0
    per_day = defaultdict(lambda: [0, 0])  # day -> [n_changes, max_conc]
    for u, d in pts:
        conc += d
        day = datetime.fromtimestamp(u / 1e6, tz=timezone.utc) \
            .strftime("%Y-%m-%d")
        per_day[day][0] += 1
        per_day[day][1] = max(per_day[day][1], conc)
    assert len(got) == len(per_day)
    for day, (nc, mx) in per_day.items():
        assert (got[day].n_changes, got[day].max_concurrency) == (nc, mx)
    # sanity: concurrency returns to zero at the end
    assert conc == 0


def test_temporal_split_replay(spark, sf_dir):
    got = {r.user_id: r for r in
           _run(spark, sf_dir, "tt_temporal_split").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts").collect()
    days = [r.ts.date().toordinal() for r in ev]
    lo, hi = min(days), max(days)
    cutoff = lo + int((hi - lo) * 0.8)
    agg = defaultdict(lambda: [0, 0])
    for r in ev:
        d = r.ts.date().toordinal()
        agg[r.user_id][0 if d < cutoff else 1] += 1
    assert len(got) == len(agg)
    for u, (tr, te) in agg.items():
        r = got[u]
        assert (r.n_train, r.n_test) == (tr, te)
        want = "spans" if tr and te else ("train_only" if tr else "test_only")
        assert r.bucket == want


def test_alias_graph_replay(spark, sf_dir):
    got = {r.entity_id: r for r in
           _run(spark, sf_dir, "s_alias_graph").collect()}
    from sanctions_data_pipeline_spark.plans.registry import REGISTRY
    variants = REGISTRY["s_name_variants"].build(spark, sf_dir) \
        .select("entity_id", "variant_key").distinct().collect()
    by_key = defaultdict(set)
    ids = set()
    for r in variants:
        by_key[r.variant_key].add(r.entity_id)
        ids.add(r.entity_id)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in by_key.values():
        ms = sorted(members)
        for m in ms[1:]:
            ra, rb = find(ms[0]), find(m)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    clusters = defaultdict(set)
    for i in ids:
        clusters[find(i)].add(i)
    assert len(got) == len(ids)
    for root, members in clusters.items():
        canon = min(members)
        for m in members:
            assert got[m].cluster_id == canon
            assert got[m].cluster_size == len(members)


def test_boilerplate_replay(spark, sf_dir):
    import re
    rows = _run(spark, sf_dir, "tx_boilerplate").collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    by_shingle = defaultdict(set)
    src_by_shingle = defaultdict(set)
    for d in docs:
        if not d.text:
            continue
        toks = re.sub(r"\s+", " ", d.text.lower()).strip().split(" ")
        for i in range(len(toks) - 7):
            sh = " ".join(toks[i:i + 8])
            by_shingle[sh].add(d.doc_id)
            src_by_shingle[sh].add(d.source)
    cand = [(sh, len(ds), len(src_by_shingle[sh]))
            for sh, ds in by_shingle.items()
            if len(ds) >= 10 and len(src_by_shingle[sh]) >= 2]
    cand.sort(key=lambda t: (-t[1], t[0]))
    want = cand[:100]
    got = [(r.shingle, r.n_docs, r.n_sources) for r in rows]
    assert got == want


def test_durbin_watson_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_durbin_watson").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    xs = [daily[d] for d in sorted(daily)]
    m = len(xs)
    num = sum((b - a) ** 2 for a, b in zip(xs, xs[1:]))
    den = sum(x * x for x in xs) - sum(xs) ** 2 / m
    assert (got.m, got.num_x1) == (m, num)
    assert abs(got.denom - den) < 1e-4
    assert abs(got.dw_stat - num / den) < 1e-5
    assert 0.0 <= got.dw_stat <= 4.0


def test_rolling_mad_replay(spark, sf_dir):
    got = {r.day: r for r in _run(spark, sf_dir, "q_rolling_mad").collect()}
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    days = sorted(daily)
    xs = [daily[d] for d in days]
    for i, d in enumerate(days):
        win = xs[max(0, i - 10):i + 11]
        med = sorted(win)[math.ceil(len(win) / 2.0) - 1]
        mad = sorted(abs(v - med) for v in win)[math.ceil(len(win) / 2.0) - 1]
        r = got[d.isoformat()]
        assert (r.x, r.median, r.mad) == (xs[i], med, mad)
        assert r.is_outlier == (1 if abs(xs[i] - med) > 3 * 1.4826 * mad
                                else 0)


def test_theil_sen_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_theil_sen").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    days = sorted(daily)
    pts = [(d.toordinal(), daily[d]) for d in days]
    slopes = []
    for a in range(len(pts)):
        for b in range(a + 1, len(pts)):
            slopes.append(round((pts[b][1] - pts[a][1])
                                / (pts[b][0] - pts[a][0]), 6))
    slopes.sort()
    n = len(slopes)
    lo = slopes[math.ceil(n / 2.0) - 1]
    hi = slopes[math.ceil((n + 1) / 2.0) - 1]
    assert got.n_pairs == n
    assert abs(got.theil_sen_slope - (lo + hi) / 2.0) < 1e-6


def test_threshold_eval_replay(spark, sf_dir):
    got = {round(r.threshold, 2): r for r in
           _run(spark, sf_dir, "sim_threshold_eval").collect()}
    emb = {r.vec_id: (r.label, [float(x) for x in r.embedding]) for r in
           load_table(spark, sf_dir, "embeddings").collect()}
    pairs = []
    for i, (la, va) in emb.items():
        nxt = emb.get(i + 1)
        if nxt is None:
            continue
        lb, vb = nxt
        dot = sum(a * b for a, b in zip(va, vb))
        na = math.sqrt(sum(a * a for a in va))
        nb = math.sqrt(sum(b * b for b in vb))
        pairs.append((round(dot / (na * nb), 6), la == lb))
    assert len(got) == 10
    for t10 in range(10):
        t = t10 / 10.0
        tp = sum(1 for c, s in pairs if c >= t and s)
        fp = sum(1 for c, s in pairs if c >= t and not s)
        fn = sum(1 for c, s in pairs if c < t and s)
        tn = sum(1 for c, s in pairs if c < t and not s)
        r = got[round(t, 2)]
        assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
        if tp + fp:
            assert abs(r.precision - tp / (tp + fp)) < 1e-6
        if tp + fn:
            assert abs(r.recall - tp / (tp + fn)) < 1e-6
        # monotone: higher threshold never increases tp
        if t10 > 0:
            assert r.tp <= got[round((t10 - 1) / 10.0, 2)].tp


def test_centroid_classify_replay(spark, sf_dir):
    rows = _run(spark, sf_dir, "emb_centroid_classify").collect()
    emb = [(r.vec_id, r.label, [float(x) for x in r.embedding]) for r in
           load_table(spark, sf_dir, "embeddings").collect()]
    by_label = defaultdict(list)
    for vid, lab, v in emb:
        by_label[lab].append((vid, v))
    cents = {}
    for lab, items in by_label.items():
        items.sort()
        dim = len(items[0][1])
        cents[lab] = [sum(v[d] for _, v in items) / len(items)
                      for d in range(dim)]
    conf = defaultdict(int)
    for vid, lab, v in emb:
        best = min(
            ((sum((a - c) ** 2 for a, c in zip(v, cv)), cl)
             for cl, cv in cents.items()),
            key=lambda t: (round(t[0], 9), t[1]))
        conf[(lab, best[1])] += 1
    got = {(r.label, r.predicted): r.n for r in rows}
    assert got == dict(conf)
    # the synthetic labels are weakly separable — require only that the
    # prototype classifier clearly beats the 1/k random baseline
    diag = sum(n for (a, b), n in conf.items() if a == b)
    assert diag / sum(conf.values()) > 1.5 / len(cents)


def test_lateness_profile_replay(spark, sf_dir):
    from datetime import timezone
    got = {r.late_hours: r for r in
           _run(spark, sf_dir, "q_lateness_profile").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts").collect()
    ev.sort(key=lambda r: r.event_id)
    hwm, hist = None, defaultdict(int)
    for r in ev:
        us = int(r.ts.replace(tzinfo=timezone.utc).timestamp() * 1e6)
        hwm = us if hwm is None else max(hwm, us)
        hist[int((hwm - us) // 3600000000)] += 1
    assert {k: r.n for k, r in got.items()} == dict(hist)
    tot, cum = sum(hist.values()), 0
    for k in sorted(hist):
        cum += hist[k]
        assert abs(got[k].cum_share - cum / tot) < 1e-6


def test_lateness_profile_out_of_order_carry(spark, tmp_path):
    """The sf events table is fully in-order (every lateness is 0), so
    the oracle can't see the sharded high-water-mark logic. Build a
    synthetic stream whose global max arrives in the FIRST id-shard
    (n_shards=32, width 7 for 200 ids) so every later shard's hwm comes
    from the cross-shard carry-in, plus in-shard wobble — and pin the
    histogram against a sequential pure-python replay."""
    from datetime import datetime, timezone

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = []
    for i in range(200):
        if i == 3:
            off_h = 500.0          # global max, lands in shard 0
        elif i % 7 == 5:
            off_h = i / 4.0        # stale stragglers: hours-late tail
        else:
            off_h = i / 2.0 + (1.0 if i % 3 == 0 else 0.0)
        rows.append((i, base.replace(tzinfo=None), off_h))
    df = spark.createDataFrame(
        [(i, b, o) for i, b, o in rows], "event_id long, base timestamp, off double")
    from pyspark.sql import functions as F
    (df.select("event_id",
               F.timestamp_micros(
                   (F.unix_micros("base")
                    + (F.col("off") * 3600000000).cast("long"))).alias("ts"))
       .write.parquet(str(tmp_path / "events.parquet")))

    got = {r.late_hours: r for r in
           _run(spark, str(tmp_path), "q_lateness_profile").collect()}

    ev = sorted(
        (i, int(base.timestamp() * 1e6) + int(o * 3600000000))
        for i, _, o in rows)
    hwm, hist = None, defaultdict(int)
    for _, us in ev:
        hwm = us if hwm is None else max(hwm, us)
        hist[(hwm - us) // 3600000000] += 1
    assert {k: r.n for k, r in got.items()} == dict(hist)
    assert len(hist) > 5  # genuinely multi-bucket, unlike the sf data
    tot, cum = sum(hist.values()), 0
    for k in sorted(hist):
        cum += hist[k]
        assert abs(got[k].cum_share - cum / tot) < 1e-6


def test_roc_auc_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "sim_roc_auc").collect()[0]
    emb = {r.vec_id: (r.label, [float(x) for x in r.embedding]) for r in
           load_table(spark, sf_dir, "embeddings").collect()}
    scores = []
    for i, (la, va) in emb.items():
        nxt = emb.get(i + 1)
        if nxt is None:
            continue
        lb, vb = nxt
        dot = sum(a * b for a, b in zip(va, vb))
        na = math.sqrt(sum(a * a for a in va))
        nb = math.sqrt(sum(b * b for b in vb))
        scores.append((round(dot / (na * nb), 6), 1 if la == lb else 0))
    pos = [s for s, p in scores if p]
    neg = [s for s, p in scores if not p]
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
    # direct pairwise AUC with half-credit ties (== rank-sum identity)
    wins = sum(1.0 if sp > sn else (0.5 if sp == sn else 0.0)
               for sp in pos for sn in neg)
    assert abs(got.auc - wins / (len(pos) * len(neg))) < 1e-6
    assert 0.0 <= got.auc <= 1.0


def test_growth_accounting_replay(spark, sf_dir):
    got = {(r.year, r.month): r for r in
           _run(spark, sf_dir, "q_growth_accounting").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts").collect()
    months = defaultdict(set)
    for r in ev:
        months[r.user_id].add(r.ts.year * 12 + r.ts.month - 1)
    per_m = defaultdict(lambda: {"new": 0, "ret": 0, "res": 0, "mau": 0})
    for u, ms in months.items():
        prev = None
        for m in sorted(ms):
            d = per_m[m]
            d["mau"] += 1
            if prev is None:
                d["new"] += 1
            elif prev == m - 1:
                d["ret"] += 1
            else:
                d["res"] += 1
            prev = m
    all_m = sorted(per_m)
    assert len(got) == len(all_m)
    for idx, m in enumerate(all_m):
        r = got[(m // 12, m % 12 + 1)]
        d = per_m[m]
        assert (r.new_users, r.retained, r.resurrected, r.mau) == \
            (d["new"], d["ret"], d["res"], d["mau"])
        prev_mau = per_m[all_m[idx - 1]]["mau"] if idx else 0
        assert r.churned == prev_mau - d["ret"]
        # ledger identity
        assert r.mau == d["new"] + d["ret"] + d["res"]


def test_st_hourly_heatmap_matches_batch(spark, sf_dir):
    got = {(r.dow, r.hr): (r.n, r.share, r.dow_share) for r in
           _run(spark, sf_dir, "st_hourly_heatmap").collect()}
    want = {(r.dow, r.hr): (r.n, r.share, r.dow_share) for r in
            _run(spark, sf_dir, "q_hourly_heatmap").collect()}
    assert got == want  # stream == batch on the bounded source


def test_psi_drift_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "dq_psi_drift").collect()[0]
    orders = load_table(spark, sf_dir, "orders").collect()
    o = [(r.o_orderdate.date().toordinal(),
          int(Decimal(str(r.o_totalprice)).quantize(Decimal("0.0001"))
              * 10000)) for r in orders]
    days = sorted({d for d, _ in o})
    cutoff = days[math.ceil(len(days) / 2.0) - 1]
    lo = min(v for _, v in o)
    hi = max(v for _, v in o)
    nref, ncur = defaultdict(int), defaultdict(int)
    for d, v in o:
        b = min((v - lo) * 10 // max(hi - lo + 1, 1), 9)
        (nref if d < cutoff else ncur)[b] += 1
    tot_ref, tot_cur = sum(nref.values()), sum(ncur.values())
    bins = sorted(set(nref) | set(ncur))
    psi = 0.0
    for b in bins:
        p = (nref[b] + 1.0) / (tot_ref + 10.0)
        q = (ncur[b] + 1.0) / (tot_cur + 10.0)
        psi += (p - q) * math.log(p / q)
    assert got.n_bins == len(bins)
    assert abs(got.psi - psi) < 1e-5
    assert got.psi >= 0.0  # PSI is a symmetrized KL, non-negative


def test_event_study_replay(spark, sf_dir):
    got = {r.off: r for r in _run(spark, sf_dir, "q_event_study").collect()}
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date().toordinal()] += 1
    days = sorted(daily)
    xs = {d: daily[d] for d in days}

    def sgn(a):
        return (a > 0) - (a < 0)

    u, best = 0, None
    for t in days[:-1]:
        u += sum(sgn(xs[t] - xs[j]) for j in days if j != t)
        if best is None or abs(u) > abs(best[1]):
            best = (t, u)
    t_star = best[0]
    assert len(got) == 15
    for off in range(-7, 8):
        d = t_star + off
        r = got[off]
        assert r.day_present == (1 if d in xs else 0)
        assert r.x == xs.get(d, 0)


def test_ols_trend_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_ols_trend").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date().toordinal()] += 1
    days = sorted(daily)
    i0 = days[0]
    pts = [(d - i0, daily[d]) for d in days]
    m = len(pts)
    si = sum(i for i, _ in pts)
    sii = sum(i * i for i, _ in pts)
    sx = sum(x for _, x in pts)
    sxx = sum(x * x for _, x in pts)
    six = sum(i * x for i, x in pts)
    slope = (m * six - si * sx) / (m * sii - si * si)
    intercept = (sx - slope * si) / m
    r2 = ((m * six - si * sx) ** 2
          / ((m * sii - si * si) * (m * sxx - sx * sx)))
    assert got.m == m
    assert abs(got.slope - slope) < 1e-6
    assert abs(got.intercept - intercept) < 1e-5
    assert abs(got.r2 - r2) < 1e-6
    assert 0.0 <= got.r2 <= 1.0


def test_duplicate_payments_replay(spark, sf_dir):
    from datetime import timezone
    rows = _run(spark, sf_dir, "s_duplicate_payments").collect()
    ev = load_table(spark, sf_dir, "events").filter(
        "event_type = 'purchase' AND value IS NOT NULL").select(
        "user_id", "event_id", "ts", "value").collect()
    p = [(r.user_id, r.event_id,
          int(r.ts.replace(tzinfo=timezone.utc).timestamp() * 1e6),
          int(math.floor(r.value))) for r in ev]
    want = set()
    by_key = defaultdict(list)
    for u, e, us, vi in p:
        by_key[(u, vi)].append((e, us))
    for (u, vi), items in by_key.items():
        for i in range(len(items)):
            for j in range(len(items)):
                ea, ua = items[i]
                eb, ub = items[j]
                if ea < eb and abs(ub - ua) <= 86400000000:
                    want.add((u, ea, eb, vi, ub - ua))
    got = {(r.user_id, r.first_event, r.second_event, r.amount_unit,
            r.gap_us) for r in rows}
    assert got == want
    assert len(got) > 0  # screen is non-vacuous on the synthetic data


def test_activity_distribution_replay(spark, sf_dir):
    got = {r.active_days: r for r in
           _run(spark, sf_dir, "q_activity_distribution").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts").collect()
    days = defaultdict(set)
    for r in ev:
        days[r.user_id].add(r.ts.date())
    hist = Counter(len(v) for v in days.values())
    assert {k: r.n_users for k, r in got.items()} == dict(hist)
    tot = sum(hist.values())
    for k, r in got.items():
        at_least = sum(n for d, n in hist.items() if d >= k)
        assert abs(r.ccdf - at_least / tot) < 1e-6
    assert min(got) >= 1 and abs(got[min(got)].ccdf - 1.0) < 1e-6 \
        if min(hist) == min(got) else True


def test_powerlaw_alpha_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "gr_powerlaw_alpha").collect()[0]
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_orderkey < 2000").select("l_orderkey", "l_partkey").collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    deg = defaultdict(int)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    n = len(deg)
    sum_ln = sum(math.log(d) for _, d in sorted(deg.items()))
    assert (got.n_nodes, got.d_max) == (n, max(deg.values()))
    assert abs(got.sum_ln_d - sum_ln) < 1e-4
    assert abs(got.alpha - (1 + n / sum_ln)) < 1e-4
    assert got.alpha > 1.0


def test_keyness_replay(spark, sf_dir):
    import re
    rows = _run(spark, sf_dir, "tx_keyness").collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    per_src = defaultdict(lambda: defaultdict(int))
    for d in docs:
        if not d.text:
            continue
        toks = re.sub(r"\s+", " ", d.text.lower()).strip().split(" ")
        for w in toks:
            per_src[d.source][w] += 1
    glob = defaultdict(int)
    for src, ws in per_src.items():
        for w, c in ws.items():
            glob[w] += c
    n_all = sum(glob.values())
    want = {}
    for src, ws in per_src.items():
        n_src = sum(ws.values())
        cand = []
        for w, a in ws.items():
            g = glob[w]
            ea = g * n_src / n_all
            eb = g * (n_all - n_src) / n_all
            b = g - a
            if a > ea:
                g2 = 2.0 * (a * math.log(a / ea)
                            + (b * math.log(b / eb) if b > 0 else 0.0))
                cand.append((round(g2, 6), w, a, b))
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rk, (g2, w, a, b) in enumerate(cand[:10], start=1):
            want[(src, rk)] = (w, a, b, g2)
    got = {(r.source, r.rk): (r.word, r.n_in_source, r.n_elsewhere, r.g2)
           for r in rows}
    assert set(got) == set(want)
    for k in want:
        gw, ga, gb, gg = got[k]
        ww, wa, wb, wg = want[k]
        assert (gw, ga, gb) == (ww, wa, wb)
        assert abs(gg - wg) < 1e-4


def test_price_volume_mix_replay(spark, sf_dir):
    got = {r.flag: r for r in
           _run(spark, sf_dir, "q_price_volume_mix").collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_shipdate", "l_quantity",
        "l_extendedprice").collect()
    agg = defaultdict(lambda: [Decimal(0), Decimal(0)])
    for r in li:
        yr = r.l_shipdate.year
        if yr in (1996, 1997):
            d = agg[(r.l_returnflag, yr)]
            d[0] += Decimal(str(r.l_quantity)).quantize(Decimal("0.0001"))
            d[1] += Decimal(str(r.l_extendedprice)).quantize(
                Decimal("0.0001"))
    flags = {f for f, _ in agg}
    for f in flags:
        q0, r0 = (float(x) for x in agg[(f, 1996)])
        q1, r1 = (float(x) for x in agg[(f, 1997)])
        p0, p1 = r0 / q0, r1 / q1
        g = got[f]
        assert abs(g.delta_rev - (r1 - r0)) < 1e-2
        assert abs(g.volume_effect - (q1 - q0) * p0) < 1e-2
        assert abs(g.price_effect - (p1 - p0) * q0) < 1e-2
        assert abs(g.mix_effect - (q1 - q0) * (p1 - p0)) < 1e-2
        # the bridge closes: effects sum to the revenue delta
        assert abs((g.volume_effect + g.price_effect + g.mix_effect)
                   - g.delta_rev) < 1e-2


def test_kaplan_meier_replay(spark, sf_dir):
    got = {r.duration_days: r for r in
           _run(spark, sf_dir, "q_kaplan_meier").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id").collect()
    by_user = defaultdict(list)
    hmax = 0
    for r in ev:
        d = r.ts.date().toordinal()
        hmax = max(hmax, d)
        by_user[r.user_id].append((r.ts, r.event_id, d))
    durs = []
    for items in by_user.values():
        items.sort()
        first = items[0][2]
        if len(items) >= 2:
            durs.append((items[1][2] - first, 1))
        else:
            durs.append((hmax - first, 0))
    grid = defaultdict(lambda: [0, 0])  # t -> [d_events, ending]
    for t, obs in durs:
        grid[t][0] += obs
        grid[t][1] += 1
    surv, n_risk = 1.0, len(durs)
    for t in sorted(grid):
        d_ev, ending = grid[t]
        if d_ev > 0:
            r = got[t]
            assert (r.d_events, r.n_risk) == (d_ev, n_risk)
            if d_ev >= n_risk:
                surv = 0.0
            else:
                surv *= 1.0 - d_ev / n_risk
            assert abs(r.survival - surv) < 1e-4
            assert 0.0 <= r.survival <= 1.0
        n_risk -= ending
    assert len(got) == sum(1 for t in grid if grid[t][0] > 0)
    # survival is non-increasing in t
    ts = sorted(got)
    for a, b in zip(ts, ts[1:]):
        assert got[b].survival <= got[a].survival + 1e-9


def test_waterfall_replay(spark, sf_dir):
    got = {(r.year, r.month, r.priority): r for r in
           _run(spark, sf_dir, "q_waterfall_decomp").collect()}
    orders = load_table(spark, sf_dir, "orders").collect()
    agg = defaultdict(Decimal)
    for r in orders:
        mo = r.o_orderdate.year * 12 + r.o_orderdate.month - 1
        agg[(mo, r.o_orderpriority)] += Decimal(
            str(r.o_totalprice)).quantize(Decimal("0.0001"))
    assert len(got) == len(agg)
    for (mo, pr), rev in agg.items():
        r = got[(mo // 12, mo % 12 + 1, pr)]
        assert abs(r.revenue - float(rev)) < 1e-6
        prev = agg.get((mo - 1, pr))
        if prev is None:
            assert r.delta is None
        else:
            assert abs(r.delta - float(rev - prev)) < 1e-6
    # per-month closure: sum of priority deltas == delta of monthly total
    months = sorted({mo for mo, _ in agg})
    for a, b in zip(months, months[1:]):
        if b != a + 1:
            continue
        prios = {p for m, p in agg if m == b} & {p for m, p in agg if m == a}
        lhs = sum(float(agg[(b, p)] - agg[(a, p)]) for p in prios)
        deltas = sum(got[(b // 12, b % 12 + 1, p)].delta for p in prios)
        assert abs(lhs - deltas) < 1e-6


def test_dim_variance_replay(spark, sf_dir):
    got = {r.dim: r for r in
           _run(spark, sf_dir, "emb_dim_variance").collect()}
    emb = load_table(spark, sf_dir, "embeddings").collect()
    dims = len(emb[0].embedding)
    assert len(got) == dims
    cols = defaultdict(list)
    for r in sorted(emb, key=lambda r: r.vec_id):
        for d, v in enumerate(r.embedding, start=1):
            cols[d].append(float(v))
    ranks = sorted(
        ((round((sum(x * x for x in vs) - sum(vs) ** 2 / len(vs))
                / len(vs), 6), d) for d, vs in cols.items()),
        key=lambda t: (-t[0], t[1]))
    for d, vs in cols.items():
        n = len(vs)
        mean = sum(vs) / n
        var = (sum(x * x for x in vs) - sum(vs) ** 2 / n) / n
        r = got[d]
        assert r.n == n
        assert abs(r.mean - mean) < 1e-5
        assert abs(r.variance - var) < 1e-5
        assert r.variance >= -1e-9
    for rk, (_, d) in enumerate(ranks, start=1):
        assert got[d].var_rank == rk


def test_seasonality_strength_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_seasonality_strength").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    days = sorted(daily)
    xs = [daily[d] for d in days]
    trend = []
    for i in range(len(xs)):
        lo, hi = max(0, i - 3), min(len(xs), i + 4)
        trend.append(sum(xs[lo:hi]) / (hi - lo))
    det = [x - t for x, t in zip(xs, trend)]
    by_dow = defaultdict(list)
    for d, v in zip(days, det):
        by_dow[d.isoweekday() % 7 + 1].append(v)
    sea = {dw: sum(vs) / len(vs) for dw, vs in by_dow.items()}
    resid = [x - t - sea[d.isoweekday() % 7 + 1]
             for d, x, t in zip(days, xs, trend)]
    seas_plus = [r + sea[d.isoweekday() % 7 + 1]
                 for d, r in zip(days, resid)]
    trend_plus = [r + t for r, t in zip(resid, trend)]

    def var(v):
        m = len(v)
        return (sum(x * x for x in v) - sum(v) ** 2 / m) / m

    fs = max(0.0, 1.0 - var(resid) / var(seas_plus))
    ft = max(0.0, 1.0 - var(resid) / var(trend_plus))
    assert got.m == len(days)
    assert abs(got.seasonal_strength - fs) < 1e-4
    assert abs(got.trend_strength - ft) < 1e-4
    assert 0.0 <= got.seasonal_strength <= 1.0
    assert 0.0 <= got.trend_strength <= 1.0


def test_basket_profile_replay(spark, sf_dir):
    got = {r.basket_size: r for r in
           _run(spark, sf_dir, "q_basket_profile").collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice").collect()
    per_order = defaultdict(lambda: [0, Decimal(0)])
    for r in li:
        d = per_order[r.l_orderkey]
        d[0] += 1
        d[1] += Decimal(str(r.l_extendedprice)).quantize(Decimal("0.0001"))
    sizes = defaultdict(lambda: [0, Decimal(0)])
    for n, rev in per_order.values():
        sizes[n][0] += 1
        sizes[n][1] += rev
    assert len(got) == len(sizes)
    for size, (n_orders, rev) in sizes.items():
        r = got[size]
        assert r.n_orders == n_orders
        assert abs(r.total_revenue - float(rev)) < 1e-6
        assert abs(r.avg_order_revenue - float(rev) / n_orders) < 1e-4


def test_price_dispersion_replay(spark, sf_dir):
    got = {r.partkey: r for r in
           _run(spark, sf_dir, "q_price_dispersion").collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice").collect()
    per_part = defaultdict(list)
    for r in li:
        per_part[r.l_partkey].append(
            int(Decimal(str(r.l_extendedprice)).quantize(Decimal("0.01"))
                * 100))
    want = {p: v for p, v in per_part.items() if len(v) >= 5}
    assert len(got) == len(want)
    for p, vs in want.items():
        n = len(vs)
        mean = sum(vs) / n
        sd = math.sqrt((sum(x * x for x in vs) - sum(vs) ** 2 / n) / n)
        r = got[p]
        assert r.n == n
        assert abs(r.mean_price - mean / 100.0) < 1e-4
        assert abs(r.sd_price - sd / 100.0) < 1e-4
        assert abs(r.cv - sd / mean) < 1e-5
        assert r.cv >= 0.0


def test_vocab_overlap_replay(spark, sf_dir):
    import re
    got = {(r.src_a, r.src_b): r for r in
           _run(spark, sf_dir, "tok_vocab_overlap").collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    per_src = defaultdict(lambda: defaultdict(int))
    for d in docs:
        if not d.text:
            continue
        toks = re.sub(r"\s+", " ", d.text.lower()).strip().split(" ")
        for w in toks:
            per_src[d.source][w] += 1
    vocab = {}
    for src, ws in per_src.items():
        top = sorted(ws.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
        vocab[src] = {w for w, _ in top}
    srcs = sorted(vocab)
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = srcs[i], srcs[j]
            shared = len(vocab[a] & vocab[b])
            if shared == 0:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert r.n_shared == shared
            union = len(vocab[a]) + len(vocab[b]) - shared
            assert abs(r.jaccard - shared / union) < 1e-6
            assert 0.0 < r.jaccard <= 1.0


def test_mann_whitney_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_mann_whitney").collect()[0]
    ev = load_table(spark, sf_dir, "events").filter(
        "event_type IN ('click','purchase') AND value IS NOT NULL").select(
        "event_type", "value").collect()
    xs = [(int(Decimal(str(r.value)).quantize(Decimal("0.0001")) * 10000),
           1 if r.event_type == "click" else 0) for r in ev]
    n1 = sum(g for _, g in xs)
    n2 = len(xs) - n1
    # average ranks
    svals = sorted(v for v, _ in xs)
    first = {}
    for i, v in enumerate(svals, start=1):
        first.setdefault(v, i)
    cnt = Counter(svals)
    avg_rank = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    r1 = sum(avg_rank[v] for v, g in xs if g == 1)
    u = r1 - n1 * (n1 + 1) / 2.0
    tie = sum(t ** 3 - t for t in cnt.values() if t > 1)
    n = n1 + n2
    var_u = n1 * n2 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z = (u - n1 * n2 / 2.0) / math.sqrt(var_u)
    assert (got.n1, got.n2) == (n1, n2)
    assert abs(got.u_stat - u) < 1e-3
    assert abs(got.z - z) < 1e-5


def test_friedman_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_friedman_test").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date().toordinal()] += 1
    weeks = defaultdict(dict)
    for d, x in daily.items():
        # proleptic ordinal 1 is a Monday; epoch day 0 is a Thursday —
        # (d-1)//7 here == (epoch_day+3)//7 in the SQL (Monday weeks)
        weeks[(d - 1) // 7][d] = x
    complete = {w: m for w, m in weeks.items() if len(m) == 7}
    rsum = defaultdict(float)
    for w, m in complete.items():
        items = sorted(m.items())  # (day, x), dow = isoweekday
        vals = sorted(x for _, x in m.items())
        first = {}
        for i, v in enumerate(vals, start=1):
            first.setdefault(v, i)
        cnt = Counter(vals)
        from datetime import date
        for d, x in m.items():
            dow = date.fromordinal(d).isoweekday()
            rsum[dow] += first[x] + (cnt[x] - 1) / 2.0
    nw = len(complete)
    ss = sum((rsum[dw] / nw - 4.0) ** 2 for dw in sorted(rsum))
    chi2 = 12.0 * nw / (7 * 8) * ss
    assert (got.n_weeks, got.k) == (nw, 7)
    assert abs(got.friedman_chi2 - chi2) < 1e-4
    assert got.friedman_chi2 >= 0.0


def test_avg_precision_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "sim_avg_precision").collect()[0]
    emb = {r.vec_id: (r.label, [float(x) for x in r.embedding]) for r in
           load_table(spark, sf_dir, "embeddings").collect()}
    scores = []
    for i, (la, va) in emb.items():
        nxt = emb.get(i + 1)
        if nxt is None:
            continue
        lb, vb = nxt
        dot = sum(a * b for a, b in zip(va, vb))
        na = math.sqrt(sum(a * a for a in va))
        nb = math.sqrt(sum(b * b for b in vb))
        scores.append((round(dot / (na * nb), 6), 1 if la == lb else 0))
    by_score = defaultdict(lambda: [0, 0])
    for s, p in scores:
        by_score[s][0] += p
        by_score[s][1] += 1
    n_pos = sum(p for _, p in scores)
    tp = npred = 0
    ap = 0.0
    for s in sorted(by_score, reverse=True):
        tp_here, n_here = by_score[s]
        tp += tp_here
        npred += n_here
        ap += (tp_here / n_pos) * (tp / npred)
    assert got.n_pos == n_pos
    assert abs(got.avg_precision - ap) < 1e-5
    assert 0.0 <= got.avg_precision <= 1.0


def test_control_chart_replay(spark, sf_dir):
    got = {r.day: r for r in
           _run(spark, sf_dir, "q_control_chart").collect()}
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    days = sorted(daily)
    xs = [daily[d] for d in days]
    m = len(xs)
    center = sum(xs) / m
    mrs = [abs(b - a) for a, b in zip(xs, xs[1:])]
    band = 2.66 * sum(mrs) / len(mrs)
    for d, x in zip(days, xs):
        r = got[d.isoformat()]
        assert r.x == x
        assert abs(r.center - center) < 1e-5
        assert abs(r.ucl - (center + band)) < 1e-4
        assert abs(r.lcl - (center - band)) < 1e-4
        assert r.out_of_control == (1 if (x > center + band
                                          or x < center - band) else 0)


def test_rolling_corr_replay(spark, sf_dir):
    got = {r.day: r for r in
           _run(spark, sf_dir, "q_rolling_corr").collect()}
    ev = load_table(spark, sf_dir, "events").select("ts", "value").collect()
    n_by = defaultdict(int)
    v_by = defaultdict(Decimal)
    for r in ev:
        d = r.ts.date()
        n_by[d] += 1
        if r.value is not None:
            v_by[d] += Decimal(str(r.value)).quantize(Decimal("0.01"))
    days = sorted(n_by)
    pts = [(n_by[d], int(v_by[d] * 100)) for d in days]
    for i, d in enumerate(days):
        win = pts[max(0, i - 29):i + 1]
        m = len(win)
        r = got[d.isoformat()]
        assert r.m == m
        if m < 2:
            assert r.rolling_corr is None
            continue
        sn = sum(n for n, _ in win)
        sv = sum(v for _, v in win)
        snn = sum(n * n for n, _ in win)
        svv = sum(v * v for _, v in win)
        snv = sum(n * v for n, v in win)
        dn, dv = m * snn - sn * sn, m * svv - sv * sv
        if dn > 0 and dv > 0:
            corr = (m * snv - sn * sv) / math.sqrt(dn * dv)
            assert abs(r.rolling_corr - corr) < 1e-5
            assert -1.0 - 1e-9 <= r.rolling_corr <= 1.0 + 1e-9


def test_cumulative_unique_replay(spark, sf_dir):
    got = {r.day: r for r in
           _run(spark, sf_dir, "q_cumulative_unique").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts").collect()
    first = {}
    days = set()
    for r in ev:
        d = r.ts.date()
        days.add(d)
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
    new_by = Counter(first.values())
    cum = 0
    for d in sorted(days):
        cum += new_by.get(d, 0)
        r = got[d.isoformat()]
        assert r.new_users == new_by.get(d, 0)
        assert r.cumulative_users == cum
    assert cum == len(first)  # everyone is counted exactly once


def test_stickiness_replay(spark, sf_dir):
    got = {(r.year, r.month): r for r in
           _run(spark, sf_dir, "q_stickiness").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts").collect()
    dau = defaultdict(set)
    mau = defaultdict(set)
    for r in ev:
        mo = r.ts.year * 12 + r.ts.month - 1
        dau[(mo, r.ts.date())].add(r.user_id)
        mau[mo].add(r.user_id)
    per_mo = defaultdict(lambda: [0, 0])
    for (mo, _), users in dau.items():
        per_mo[mo][0] += 1
        per_mo[mo][1] += len(users)
    assert len(got) == len(per_mo)
    for mo, (n_days, sum_dau) in per_mo.items():
        r = got[(mo // 12, mo % 12 + 1)]
        assert (r.n_days, r.mau) == (n_days, len(mau[mo]))
        assert abs(r.avg_dau - sum_dau / n_days) < 1e-5
        assert abs(r.stickiness - sum_dau / n_days / len(mau[mo])) < 1e-6
        assert 0.0 < r.stickiness <= 1.0


def test_davies_bouldin_replay(spark, sf_dir):
    got = {r.label: r for r in
           _run(spark, sf_dir, "emb_davies_bouldin").collect()}
    emb = [(r.vec_id, r.label, [float(x) for x in r.embedding]) for r in
           load_table(spark, sf_dir, "embeddings").collect()]
    by_label = defaultdict(list)
    for vid, lab, v in emb:
        by_label[lab].append((vid, v))
    cents, comp = {}, {}
    for lab, items in by_label.items():
        items.sort()
        dim = len(items[0][1])
        cents[lab] = [sum(v[d] for _, v in items) / len(items)
                      for d in range(dim)]
        comp[lab] = sum(
            math.sqrt(sum((a - c) ** 2 for a, c in zip(v, cents[lab])))
            for _, v in items) / len(items)
    for lab in by_label:
        db = max(
            (comp[lab] + comp[o])
            / math.sqrt(sum((a - b) ** 2
                            for a, b in zip(cents[lab], cents[o])))
            for o in by_label if o != lab)
        r = got[lab]
        assert r.n == len(by_label[lab])
        assert abs(r.compactness - comp[lab]) < 1e-4
        assert abs(r.db_index - db) < 1e-3
        assert r.db_index > 0.0


def test_conversion_latency_replay(spark, sf_dir):
    got = {r.latency_days: r for r in
           _run(spark, sf_dir, "q_conversion_latency").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type").collect()
    first, firstp = {}, {}
    for r in ev:
        d = r.ts.date().toordinal()
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
        if r.event_type == "purchase" and (
                r.user_id not in firstp or d < firstp[r.user_id]):
            firstp[r.user_id] = d
    hist = Counter()
    for u, fd in first.items():
        hist[firstp[u] - fd if u in firstp else -1] += 1
    assert {k: r.n_users for k, r in got.items()} == dict(hist)
    tot = sum(hist.values())
    cum = 0
    for k in sorted(hist):
        if k >= 0:
            cum += hist[k]
        assert abs(got[k].cum_converted_share - cum / tot) < 1e-6


def test_holiday_lift_replay(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_holiday_lift").collect()
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    hol = {(1, 1): "new_year", (7, 4): "july4", (12, 25): "christmas"}
    base = defaultdict(lambda: [0, 0])
    for d, x in daily.items():
        if (d.month, d.day) not in hol:
            base[d.isoweekday()][0] += x
            base[d.isoweekday()][1] += 1
    want = {}
    for d, x in daily.items():
        h = hol.get((d.month, d.day))
        if h:
            sx, nd = base[d.isoweekday()]
            want[d.isoformat()] = (h, x, sx / nd)
    assert len(rows) == len(want)
    assert len(rows) >= 1  # the synthetic span covers at least one holiday
    for r in rows:
        h, x, b = want[r.day]
        assert (r.holiday, r.x) == (h, x)
        assert abs(r.weekday_baseline - b) < 1e-5
        assert abs(r.lift - x / b) < 1e-5


def test_risk_scorecard_composition(spark, sf_dir):
    """The scorecard must agree row-for-row with its three source
    screens (composition correctness, not a re-derivation)."""
    got = {r.user_id: r for r in
           _run(spark, sf_dir, "s_risk_scorecard").collect()}
    aml = Counter(r.user_id for r in
                  _run(spark, sf_dir, "s_aml_structuring").collect())
    dup = Counter(r.user_id for r in
                  _run(spark, sf_dir, "s_duplicate_payments").collect())
    rb = {r.user_id: r.z_score for r in
          _run(spark, sf_dir, "s_round_amount_bias").collect()}
    for u, z in rb.items():
        score = (2 * aml.get(u, 0) + dup.get(u, 0)
                 + (1 if z is not None and z > 2.0 else 0))
        if score == 0:
            assert u not in got
            continue
        r = got[u]
        assert r.n_structuring == aml.get(u, 0)
        assert r.n_dup_payments == dup.get(u, 0)
        assert r.risk_score == score
        assert r.band == ("high" if score >= 3 else "medium")
    assert set(got) <= set(rb)


def test_trade_balance_replay(spark, sf_dir):
    got = {r.nation: r for r in
           _run(spark, sf_dir, "q_trade_balance").collect()}
    nat = {r.n_nationkey: r.n_name for r in
           load_table(spark, sf_dir, "nation").collect()}
    sup = {r.s_suppkey: nat[r.s_nationkey] for r in
           load_table(spark, sf_dir, "supplier").collect()}
    cus = {r.c_custkey: nat[r.c_nationkey] for r in
           load_table(spark, sf_dir, "customer").collect()}
    earn, spend = defaultdict(Decimal), defaultdict(Decimal)
    for r in load_table(spark, sf_dir, "lineitem").select(
            "l_suppkey", "l_extendedprice").collect():
        earn[sup[r.l_suppkey]] += Decimal(str(r.l_extendedprice)).quantize(
            Decimal("0.0001"))
    for r in load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_totalprice").collect():
        spend[cus[r.o_custkey]] += Decimal(str(r.o_totalprice)).quantize(
            Decimal("0.0001"))
    nations = set(earn) | set(spend)
    assert set(got) == nations
    for n in nations:
        r = got[n]
        assert abs(r.supplier_revenue - float(earn.get(n, 0))) < 1e-6
        assert abs(r.customer_spend - float(spend.get(n, 0))) < 1e-6
        assert abs(r.balance
                   - float(earn.get(n, 0) - spend.get(n, 0))) < 1e-6


def test_sla_attainment_replay(spark, sf_dir):
    got = {r.priority: r for r in
           _run(spark, sf_dir, "q_sla_attainment").collect()}
    orders = {r.o_orderkey: (r.o_orderpriority, r.o_orderdate.date())
              for r in load_table(spark, sf_dir, "orders").collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in li:
        pr, od = orders[r.l_orderkey]
        nd = (r.l_shipdate.date() - od).days
        if nd < 0:
            continue
        d = agg[pr]
        d[0] += 1
        d[1] += nd <= 30
        d[2] += nd <= 60
        d[3] += nd <= 90
    assert len(got) == len(agg)
    for pr, (n, a, b, c) in agg.items():
        r = got[pr]
        assert r.n_lines == n
        assert abs(r.within_30d - a / n) < 1e-6
        assert abs(r.within_60d - b / n) < 1e-6
        assert abs(r.within_90d - c / n) < 1e-6
        assert r.within_30d <= r.within_60d <= r.within_90d


def test_odds_ratio_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_odds_ratio").collect()[0]
    orders = {r.o_orderkey: r.o_orderpriority for r in
              load_table(spark, sf_dir, "orders").collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag").collect()
    a = b = c = d = 0
    for r in li:
        exp = orders[r.l_orderkey] == "1-URGENT"
        outc = r.l_returnflag == "R"
        if exp and outc:
            a += 1
        elif exp:
            b += 1
        elif outc:
            c += 1
        else:
            d += 1
    assert (got.a, got.b, got.c, got.d) == (a, b, c, d)
    rr = (a / (a + b)) / (c / (c + d))
    orr = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert abs(got.relative_risk - rr) < 1e-5
    assert abs(got.odds_ratio - orr) < 1e-5
    assert abs(got.or_ci_low - math.exp(math.log(orr) - 1.96 * se)) < 1e-4
    assert abs(got.or_ci_high - math.exp(math.log(orr) + 1.96 * se)) < 1e-4
    assert got.or_ci_low <= got.odds_ratio <= got.or_ci_high


def test_pack_efficiency_composition(spark, sf_dir):
    got = {r.lang: r for r in
           _run(spark, sf_dir, "dp_pack_efficiency").collect()}
    pack = _run(spark, sf_dir, "dp_pack").collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in pack:
        d = agg[r.lang]
        d[0] += 1
        d[1] += r.n_docs
        d[2] += r.tokens
    assert len(got) == len(agg)
    for lang, (n_bins, n_docs, toks) in agg.items():
        r = got[lang]
        assert (r.n_bins, r.n_docs, r.total_tokens) == (n_bins, n_docs, toks)
        fill = toks / (n_bins * 2048.0)
        assert abs(r.fill_rate - fill) < 1e-6
        assert abs(r.waste_share - (1 - fill)) < 1e-6
        # every bin except possibly the last is at least budget-full
        assert r.fill_rate > 0.0


def test_rolling_origin_replay(spark, sf_dir):
    got = {r.fold: r for r in
           _run(spark, sf_dir, "tt_rolling_origin").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts").collect()
    pts = [(r.user_id, r.ts.date().toordinal()) for r in ev]
    lo = min(d for _, d in pts)
    hi = max(d for _, d in pts) + 1
    assert len(got) == 4
    for k in range(1, 5):
        c_lo = lo + int((hi - lo) * k * 0.2)
        c_hi = lo + int((hi - lo) * (k + 1) * 0.2)
        tr_users = {u for u, d in pts if d < c_lo}
        te_users = {u for u, d in pts if c_lo <= d < c_hi}
        r = got[k]
        assert r.n_train_events == sum(1 for _, d in pts if d < c_lo)
        assert r.n_test_events == sum(1 for _, d in pts
                                      if c_lo <= d < c_hi)
        assert r.n_train_users == len(tr_users)
        assert r.n_test_users == len(te_users)
        assert r.n_overlap_users == len(tr_users & te_users)
    # expanding window: train set grows monotonically with the fold
    for k in range(2, 5):
        assert got[k].n_train_events >= got[k - 1].n_train_events


def test_rich_club_replay(spark, sf_dir):
    got = {r.k: r for r in _run(spark, sf_dir, "gr_rich_club").collect()}
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_orderkey < 2000").select("l_orderkey", "l_partkey").collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    prev_phi = None
    for k in range(1, 11):
        rich = {n for n, d in deg.items() if d > k}
        if not rich:
            assert k not in got
            continue
        e_k = sum(1 for u, v in edges if u in rich and v in rich)
        r = got[k]
        assert (r.n_k, r.e_k) == (len(rich), e_k)
        if len(rich) > 1:
            phi = 2.0 * e_k / (len(rich) * (len(rich) - 1))
            assert abs(r.phi - phi) < 1e-6
            assert 0.0 <= r.phi <= 1.0


def test_forecast_backtest_replay(spark, sf_dir):
    got = {r.model: r for r in
           _run(spark, sf_dir, "q_forecast_backtest").collect()}
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date().toordinal()] += 1
    days = sorted(daily)
    lo = days[0]
    cutoff = lo + int((days[-1] + 1 - lo) * 0.8)
    train = [d for d in days if d < cutoff]
    test = [d for d in days if d >= cutoff]
    from datetime import date

    def mae_mape(preds):
        errs = [abs(daily[d] - preds[d]) for d in test]
        mapes = [abs(daily[d] - preds[d]) / daily[d] for d in test]
        return sum(errs) / len(test), sum(mapes) / len(test)

    # naive
    last = daily[train[-1]]
    m1 = mae_mape({d: last for d in test})
    # seasonal naive
    by_dow = defaultdict(list)
    for d in train:
        by_dow[date.fromordinal(d).isoweekday()].append(daily[d])
    m2 = mae_mape({d: (sum(by_dow[date.fromordinal(d).isoweekday()])
                       / len(by_dow[date.fromordinal(d).isoweekday()]))
                   for d in test})
    # ols
    pts = [(d - lo, daily[d]) for d in train]
    m = len(pts)
    si = sum(i for i, _ in pts)
    sii = sum(i * i for i, _ in pts)
    sx = sum(x for _, x in pts)
    six = sum(i * x for i, x in pts)
    slope = (m * six - si * sx) / (m * sii - si * si)
    inter = (sx - slope * si) / m
    m3 = mae_mape({d: slope * (d - lo) + inter for d in test})
    for name, (mae, mape) in (("naive", m1), ("seasonal_naive", m2),
                              ("ols_trend", m3)):
        r = got[name]
        assert r.n_test_days == len(test)
        assert abs(r.mae - mae) < 1e-4
        assert abs(r.mape - mape) < 1e-5


def test_bootstrap_se_replay(spark, sf_dir):
    import hashlib
    got = _run(spark, sf_dir, "q_bootstrap_se").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    xs = [daily[d] for d in sorted(daily)]
    m = len(xs)
    means = []
    for b in range(1, 101):
        acc = 0.0
        for j in range(1, m + 1):
            h = int(hashlib.md5(f"bs:{b}:{j}".encode()).hexdigest()[:13],
                    16)
            acc += float(xs[h % m])
        means.append(acc / m)
    grand = sum(means) / len(means)
    se = math.sqrt(sum((v - grand) ** 2 for v in means) / (len(means) - 1))
    assert (got.n_reps, got.n_days) == (100, m)
    assert abs(got.boot_mean - grand) < 1e-4
    assert abs(got.boot_se - se) < 1e-4
    # bootstrap SE of the mean ~ sd/sqrt(m): same order of magnitude
    sd = math.sqrt(sum((x - sum(xs) / m) ** 2 for x in xs) / m)
    assert 0.2 * sd / math.sqrt(m) < got.boot_se < 5 * sd / math.sqrt(m)


def test_temporal_density_replay(spark, sf_dir):
    got = {(r.year, r.month): r for r in
           _run(spark, sf_dir, "gr_temporal_density").collect()}
    orders = {r.o_orderkey: r.o_orderdate for r in
              load_table(spark, sf_dir, "orders").collect()}
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_orderkey < 4000").select("l_orderkey", "l_partkey").collect()
    by_mo = defaultdict(lambda: defaultdict(set))
    for r in li:
        od = orders[r.l_orderkey]
        mo = od.year * 12 + od.month - 1
        by_mo[mo][r.l_orderkey].add(r.l_partkey)
    assert len(got) == len(by_mo)
    for mo, om in by_mo.items():
        edges = set()
        for parts in om.values():
            ps = sorted(parts)
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    edges.add((ps[i], ps[j]))
        nodes = {n for e in edges for n in e}
        r = got[(mo // 12, mo % 12 + 1)]
        assert (r.n_nodes, r.n_edges) == (len(nodes), len(edges))
        if len(nodes) > 1:
            dens = 2.0 * len(edges) / (len(nodes) * (len(nodes) - 1))
            assert abs(r.density - dens) < 1e-6
            assert 0.0 < r.density <= 1.0


def test_mantel_haenszel_replay(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_mantel_haenszel").collect()
    orders = {r.o_orderkey: (r.o_orderpriority, r.o_orderdate.year) for r in
              load_table(spark, sf_dir, "orders").collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag").collect()
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for r in li:
        pr, yr = orders[r.l_orderkey]
        exp = pr == "1-URGENT"
        outc = r.l_returnflag == "R"
        cells[yr][0 if exp and outc else
                  1 if exp else 2 if outc else 3] += 1
    num = den = 0.0
    for yr in sorted(cells):
        a, b, c, d = cells[yr]
        n = a + b + c + d
        num += a * d / n
        den += b * c / n
    mh = num / den
    got = {r.yr: r for r in rows}
    assert set(got) == set(cells)
    for yr, (a, b, c, d) in cells.items():
        r = got[yr]
        assert (r.a, r.b, r.c, r.d) == (a, b, c, d)
        if b > 0 and c > 0:
            assert abs(r.stratum_or - a * d / (b * c)) < 1e-4
        assert abs(r.mh_pooled_or - mh) < 1e-4


def test_alignment_uniformity_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "emb_alignment_uniformity").collect()[0]
    emb = {r.vec_id: (r.label, [float(x) for x in r.embedding]) for r in
           load_table(spark, sf_dir, "embeddings").collect()}
    d2s = []
    for i, (la, va) in emb.items():
        nxt = emb.get(i + 1)
        if nxt is None:
            continue
        lb, vb = nxt
        dot = sum(a * b for a, b in zip(va, vb))
        na = math.sqrt(sum(a * a for a in va))
        nb = math.sqrt(sum(b * b for b in vb))
        d2s.append((la == lb, 2.0 - 2.0 * dot / (na * nb)))
    n_pos = sum(1 for p, _ in d2s if p)
    align = sum(d for p, d in d2s if p) / n_pos
    unif = math.log(sum(math.exp(-2.0 * d) for _, d in d2s) / len(d2s))
    assert (got.n_pairs, got.n_pos) == (len(d2s), n_pos)
    assert abs(got.alignment - align) < 1e-4
    assert abs(got.uniformity - unif) < 1e-4
    assert got.alignment >= 0.0 and got.uniformity <= 0.0


def test_jsonl_quarantine_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "io_jsonl_quarantine").collect()[0]
    docs = load_table(spark, sf_dir, "documents").collect()
    assert got.n_good == len(docs)
    assert got.n_corrupt == 7
    assert got.doc_id_sum == sum(d.doc_id for d in docs)
    assert got.n_chars_total == sum(len(d.text) for d in docs)


def test_discount_response_replay(spark, sf_dir):
    got = {r.disc_x4: r for r in
           _run(spark, sf_dir, "q_discount_response").collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_discount", "l_quantity", "l_extendedprice").collect()
    agg = defaultdict(lambda: [0, Decimal(0), Decimal(0)])
    for r in li:
        k = int(Decimal(str(r.l_discount)).quantize(Decimal("0.0001"))
                * 10000)
        d = agg[k]
        d[0] += 1
        d[1] += Decimal(str(r.l_quantity)).quantize(Decimal("0.0001"))
        d[2] += Decimal(str(r.l_extendedprice)).quantize(Decimal("0.0001"))
    assert len(got) == len(agg)
    for k, (n, q, rev) in agg.items():
        r = got[k]
        assert r.n_lines == n
        assert abs(r.mean_qty - float(q) / n) < 1e-4
        assert abs(r.mean_revenue - float(rev) / n) < 1e-4


def test_segment_migration_replay(spark, sf_dir):
    got = {(r.seg_h1, r.seg_h2): r for r in
           _run(spark, sf_dir, "q_segment_migration").collect()}
    orders = load_table(spark, sf_dir, "orders").collect()
    days = [r.o_orderdate.date().toordinal() for r in orders]
    lo, hi = min(days), max(days) + 1
    cutoff = lo + (hi - lo) // 2
    spend = defaultdict(lambda: defaultdict(int))
    for r in orders:
        half = 1 if r.o_orderdate.date().toordinal() < cutoff else 2
        spend[half][r.o_custkey] += int(
            Decimal(str(r.o_totalprice)).quantize(Decimal("0.0001"))
            * 10000)

    def ntile4(d):
        ranked = sorted(d.items(), key=lambda kv: (kv[1], kv[0]))
        n = len(ranked)
        base, extra = divmod(n, 4)
        seg, i = {}, 0
        for q in range(1, 5):
            size = base + (1 if q <= extra else 0)
            for ck, _ in ranked[i:i + size]:
                seg[ck] = q
            i += size
        return seg

    s1, s2 = ntile4(spend[1]), ntile4(spend[2])
    matrix = Counter()
    for ck in set(s1) | set(s2):
        matrix[(s1.get(ck, 0), s2.get(ck, 0))] += 1
    assert {k: r.n_customers for k, r in got.items()} == dict(matrix)
    rows = defaultdict(int)
    for (a, _), n in matrix.items():
        rows[a] += n
    for (a, b), n in matrix.items():
        assert abs(got[(a, b)].row_share - n / rows[a]) < 1e-6


def test_hurst_replay(spark, sf_dir):
    got = {r.n: r for r in _run(spark, sf_dir, "q_hurst_exponent").collect()}
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    xs = [float(daily[d]) for d in sorted(daily)]
    per_n = {}
    for n in (4, 8, 16):
        lns = []
        for b in range(len(xs) // n):
            blk = xs[b * n:(b + 1) * n]
            mu = sum(blk) / n
            z = []
            acc = 0.0
            for v in blk:
                acc += v - mu
                z.append(acc)
            rng = max(z) - min(z)
            sd = math.sqrt(sum((v - mu) ** 2 for v in blk) / n)
            if sd > 0 and rng > 0:
                lns.append(math.log(rng / sd))
        if lns:
            per_n[n] = (len(lns), sum(lns) / len(lns))
    pts = [(math.log(n), m) for n, (_, m) in sorted(per_n.items())]
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sxx = sum(x * x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    h = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert set(got) == set(per_n)
    for n, (nb, m) in per_n.items():
        r = got[n]
        assert r.n_blocks == nb
        assert abs(r.mean_ln_rs - m) < 1e-4
        assert abs(r.hurst_h - h) < 1e-4
    assert 0.0 < got[4].hurst_h < 1.2  # plausible Hurst range


def test_weibull_fit_composition(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_weibull_fit").collect()
    km = _run(spark, sf_dir, "q_kaplan_meier").collect()
    pts = [(math.log(r.duration_days), math.log(-math.log(r.survival)))
           for r in km
           if 0 < r.survival < 1 and r.duration_days > 0]
    k = len(pts)
    if k <= 1:  # smoke SF can leave <2 usable KM points -> empty fit
        assert rows == []
        return
    got = rows[0]
    sx = sum(x for x, _ in pts)
    sxx = sum(x * x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    inter = (sy - slope * sx) / k
    assert got.n_points == k
    assert abs(got.shape_k - slope) < 1e-4
    assert abs(got.scale_lambda - math.exp(-inter / slope)) < 1e-2
    assert got.shape_k > 0 and got.scale_lambda > 0


def test_degree_gini_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "gr_degree_gini").collect()[0]
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_orderkey < 2000").select("l_orderkey", "l_partkey").collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    vals = [d for _, d in sorted(deg.items(), key=lambda kv: (kv[1], kv[0]))]
    n, sd = len(vals), sum(vals)
    rwd = sum((i + 1) * d for i, d in enumerate(vals))
    gini = (2.0 * rwd - (n + 1) * sd) / (n * sd)
    assert (got.n_nodes, got.n_ends) == (n, sd)
    assert abs(got.degree_gini - gini) < 1e-6
    assert 0.0 <= got.degree_gini < 1.0


def test_nbinom_fit_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_nbinom_fit").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    xs = list(daily.values())
    m = len(xs)
    mu = sum(xs) / m
    var = (sum(x * x for x in xs) - sum(xs) ** 2 / m) / m
    assert got.m == m
    assert abs(got.mean - mu) < 1e-5
    assert abs(got.variance - var) < 1e-3
    if var > mu:
        assert abs(got.nb_r - mu * mu / (var - mu)) < 1e-2
        assert abs(got.nb_p - mu / var) < 1e-5
        assert 0.0 < got.nb_p < 1.0
    else:
        assert got.nb_r is None and got.nb_p is None


def test_record_days_replay(spark, sf_dir):
    got = {r.day: r for r in _run(spark, sf_dir, "q_record_days").collect()}
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    days = sorted(daily)
    run_max, last_rec = None, None
    for d in days:
        x = daily[d]
        is_rec = run_max is None or x > run_max
        run_max = x if run_max is None else max(run_max, x)
        if is_rec:
            last_rec = d
        r = got[d.isoformat()]
        assert (r.x, r.is_record, r.running_max) == (x, int(is_rec), run_max)
        assert r.days_since_record == (d - last_rec).days
    # day 1 is always a record
    assert got[days[0].isoformat()].is_record == 1


def test_seasonal_mann_kendall_replay(spark, sf_dir):
    got = _run(spark, sf_dir, "q_seasonal_mann_kendall").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += 1
    by_dow = defaultdict(list)
    for d in sorted(daily):
        by_dow[d.isoweekday()].append(daily[d])

    def sgn(a):
        return (a > 0) - (a < 0)

    s_total, var_s = 0, 0.0
    for dw in sorted(by_dow):
        xs = by_dow[dw]
        m = len(xs)
        s_total += sum(sgn(xs[j] - xs[i])
                       for i in range(m) for j in range(i + 1, m))
        var_s += m * (m - 1) * (2 * m + 5) / 18.0
    z = ((s_total - 1) / math.sqrt(var_s) if s_total > 0
         else (s_total + 1) / math.sqrt(var_s) if s_total < 0 else 0.0)
    assert got.s_total == s_total
    assert abs(got.var_s - var_s) < 1e-3
    assert abs(got.z - z) < 1e-5


def test_table_manifest_replay(spark, sf_dir):
    import hashlib
    got = {r.table_name: r for r in
           _run(spark, sf_dir, "dq_table_manifest").collect()}
    assert len(got) == 10
    # spot-replay three tables end-to-end
    for t, key_fn in (
            ("region", lambda r: str(r.r_regionkey)),
            ("documents", lambda r: str(r.doc_id)),
            ("lineitem", lambda r: str(r.l_orderkey * 10
                                       + r.l_linenumber))):
        rows = load_table(spark, sf_dir, t).collect()
        acc = 0
        for r in rows:
            acc ^= int(hashlib.md5(key_fn(r).encode()).hexdigest()[:13], 16)
        assert got[t].n_rows == len(rows)
        assert got[t].key_checksum == acc
    # manifest must be invariant to partitioning: re-run and compare
    again = {r.table_name: (r.n_rows, r.key_checksum) for r in
             _run(spark, sf_dir, "dq_table_manifest").collect()}
    assert again == {t: (r.n_rows, r.key_checksum) for t, r in got.items()}


def test_dormancy_timeline_replay(spark, sf_dir):
    got = {r.day_index: r.n_dormant for r in
           _run(spark, sf_dir, "q_dormancy_timeline").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts").collect()
    from datetime import date, timezone
    epoch = date(1970, 1, 1).toordinal()
    days_by_user = defaultdict(set)
    horizon = 0
    for r in ev:
        d = r.ts.date().toordinal() - epoch  # epoch-day, matches the op
        days_by_user[r.user_id].add(d)
        horizon = max(horizon, d)
    horizon += 1
    deltas = defaultdict(int)
    for u, ds in days_by_user.items():
        seq = sorted(ds) + [None]
        for a, b in zip(seq, seq[1:]):
            nxt = b if b is not None else horizon
            if nxt - a >= 2 and a + 2 < nxt:
                deltas[a + 2] += 1
                deltas[nxt] -= 1
    want = {}
    acc = 0
    for d in sorted(deltas):
        acc += deltas[d]
        want[d] = acc
    assert got == want
    assert len(want) > 0  # non-vacuous on the synthetic corpus
    # census never negative and ends at zero
    assert all(v >= 0 for v in got.values())
    assert want[max(want)] == 0


def test_top_share_replay(spark, sf_dir):
    got = {r.pct: r for r in _run(spark, sf_dir, "q_top_share").collect()}
    orders = load_table(spark, sf_dir, "orders").collect()
    spend = defaultdict(int)
    for r in orders:
        spend[r.o_custkey] += int(
            Decimal(str(r.o_totalprice)).quantize(Decimal("0.0001"))
            * 10000)
    ranked = sorted(spend.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ranked)
    tot = sum(v for _, v in ranked)
    prev_share = 0.0
    for pct in (1, 5, 10, 20):
        k = math.ceil(n * pct / 100.0)
        top = sum(v for _, v in ranked[:k])
        r = got[pct]
        assert r.n_top_customers == k
        assert r.top_spend == top / 10000.0
        assert abs(r.share - top / tot) < 1e-6
        # concentration: share grows with pct but stays >= pct/100
        assert r.share >= prev_share
        assert r.share >= pct / 100.0 - 1e-9
        prev_share = r.share


def test_knn_accuracy_composition(spark, sf_dir):
    got = {r.label: r for r in
           _run(spark, sf_dir, "emb_knn_accuracy").collect()}
    knn = _run(spark, sf_dir, "emb_knn_graph").collect()
    lab = {r.vec_id: r.label for r in
           load_table(spark, sf_dir, "embeddings").collect()}
    votes = defaultdict(lambda: defaultdict(int))
    for e in knn:
        votes[e.src_id][lab[e.dst_id]] += 1
    per_label = defaultdict(lambda: [0, 0])
    for src, vs in votes.items():
        pred = min(vs, key=lambda c: (-vs[c], c))
        d = per_label[lab[src]]
        d[0] += 1
        d[1] += pred == lab[src]
    assert len(got) == len(per_label)
    for label, (n, ok) in per_label.items():
        r = got[label]
        assert (r.n, r.n_correct) == (n, ok)
        assert abs(r.accuracy - ok / n) < 1e-6

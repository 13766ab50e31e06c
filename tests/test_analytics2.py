"""Round-4 analytics (continued): pure-python replays of the daily
event-value series screens against the same parquet inputs."""

from __future__ import annotations

import math
from collections import defaultdict
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

"""Distributed PCA over an embedding column.

The statistically heavy part — the d×d Gram matrix — is computed as
per-partition partials with vectorized numpy inside ``mapInPandas``
(Arrow batches, no per-row Python), then combined. The combine and the
eigendecomposition run on the driver, which is legitimate at any corpus
size: the partials are O(d²) each and there is one per partition, so
driver work is bounded by (partitions × d²), independent of row count.
At 100 TB / 1000 executors with d=64 that is a few MB of partials.

This is the textbook two-pass-free PCA: cov = E[xxᵀ] − μμᵀ from a
single pass accumulating (n, Σx, Σxxᵀ).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def gram_partials(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """One row per non-empty partition: (n, sum_vec, gram_flat)."""

    def acc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.vstack(pdf[col].to_numpy()).astype(np.float64)
            n += m.shape[0]
            s = m.sum(axis=0) if s is None else s + m.sum(axis=0)
            gg = m.T @ m
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()],
                                "g": [g.reshape(-1).tolist()]})

    return emb.select(col).mapInPandas(
        acc, schema="n long, s array<double>, g array<double>")


def pca_components(emb: DataFrame, k: int = 8,
                   col: str = "embedding") -> pd.DataFrame:
    """Top-k eigenvalues + explained variance of the covariance matrix.

    Returns a small pandas frame (component, eigenvalue, explained_var);
    caller wraps it in a Spark DataFrame. The only driver-side data is
    the per-partition partials (bounded by partitions × d²).
    """
    parts = gram_partials(emb, col).collect()
    if not parts:
        return pd.DataFrame({"component": pd.Series(dtype="int64"),
                             "eigenvalue": pd.Series(dtype="float64"),
                             "explained_var": pd.Series(dtype="float64")})
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    g = np.sum([np.asarray(p["g"]) for p in parts], axis=0)
    d = s.shape[0]
    mu = s / n
    cov = g.reshape(d, d) / n - np.outer(mu, mu)
    evals = np.linalg.eigvalsh(cov)[::-1]  # descending
    total = float(evals.sum())
    top = evals[:k]
    return pd.DataFrame({
        "component": np.arange(len(top), dtype=np.int64),
        "eigenvalue": np.round(top, 6),
        "explained_var": np.round(top / total, 6) if total else top * 0.0,
    })


def _combined_moments(emb: DataFrame, col: str = "embedding"):
    """(n, mu, cov) from one gram pass; partials are combined in a
    SORTED order so the float accumulation is run-deterministic even
    though ``collect`` returns partitions in arbitrary order."""
    parts = sorted(gram_partials(emb, col).collect(),
                   key=lambda p: (p["n"], tuple(p["s"])))
    if not parts:
        return 0, None, None
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    g = np.sum([np.asarray(p["g"]) for p in parts], axis=0)
    d = s.shape[0]
    mu = s / n
    cov = g.reshape(d, d) / n - np.outer(mu, mu)
    return n, mu, cov


def whitening_model(emb: DataFrame, col: str = "embedding",
                    eps: float = 1e-6):
    """ZCA whitening transform from the covariance eigendecomposition:
    W = V diag(1/sqrt(lam + eps)) V^T. Driver work is the d x d
    eigensolve — model-sized, independent of row count (same contract
    as :func:`pca_components`)."""
    n, mu, cov = _combined_moments(emb, col)
    if n == 0:
        raise ValueError("empty embedding input")
    lam, v = np.linalg.eigh(cov)
    w = v @ np.diag(1.0 / np.sqrt(lam + eps)) @ v.T
    return n, mu, cov, w


def apply_whitening(emb: DataFrame, mu: np.ndarray, w: np.ndarray,
                    col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """y = W (x - mu), vectorized per Arrow batch. The d x d transform
    ships in the task closure (a few KB at d=64) — one map pass, no
    shuffle."""
    wt = w.T.copy()

    def wh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.vstack(pdf[col].to_numpy()).astype(np.float64)
            y = (m - mu) @ wt
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "y": list(y)})

    return emb.select(id_col, col).mapInPandas(
        wh, schema=f"{id_col} long, y array<double>")

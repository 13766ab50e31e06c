"""Distributed iterative optimization: full-batch gradient descent with
executor-side gradient partials.

Same scale contract as operators/pca.py: per-partition numpy partials
via ``mapInPandas`` — each iteration ships (d+1)-sized gradient
vectors to the driver, never rows — so driver work is
O(iters x partitions x d) while the corpus stays distributed. This is
the shape MLlib's own optimizers use (treeAggregate of gradients).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def logreg_fit(feats: DataFrame, label_col: str, feature_cols: list[str],
               n_iters: int = 25, lr: float = 0.5) -> list[float]:
    """Binary logistic regression by full-batch gradient descent.

    Features are standardized with GLOBAL moments (one aggregate pass;
    exact count/sum/sumsq) so the learning rate is scale-free and the
    result is independent of row order: every per-iteration quantity is
    a float64 sum accumulated per-partition then combined in partition
    order, stable for a fixed input layout.

    Returns [bias, w1..wd] on the STANDARDIZED feature scale.
    """
    import numpy as np
    import pandas as pd

    d = len(feature_cols)
    # single-pass global moments for standardization
    aggs = []
    for c in feature_cols:
        aggs += [F.sum(F.col(c).cast("double")).alias(f"s_{c}"),
                 F.sum((F.col(c).cast("double")) ** 2).alias(f"q_{c}")]
    aggs.append(F.count(F.lit(1)).alias("n"))
    m = feats.agg(*aggs).collect()[0]
    n = m["n"]
    mu = np.array([m[f"s_{c}"] / n for c in feature_cols])
    sd = np.array([
        max(np.sqrt(m[f"q_{c}"] / n - (m[f"s_{c}"] / n) ** 2), 1e-12)
        for c in feature_cols])

    base = feats.select(
        F.col(label_col).cast("double").alias("y"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols])

    w = np.zeros(d + 1)
    for _ in range(n_iters):
        ww = w.copy()  # capture by value for this iteration's closure

        def grad(batches):
            g = np.zeros(d + 1)
            for pdf in batches:
                x = (pdf[feature_cols].to_numpy() - mu) / sd
                xb = np.hstack([np.ones((len(pdf), 1)), x])
                y = pdf["y"].to_numpy()
                p = 1.0 / (1.0 + np.exp(-(xb @ ww)))
                g += xb.T @ (p - y)
            yield pd.DataFrame({"pos": range(d + 1), "g": g})

        parts = (base.mapInPandas(grad, "pos int, g double")
                 .groupBy("pos").agg(F.sum("g").alias("g")).collect())
        full = np.zeros(d + 1)
        for r in parts:
            full[r["pos"]] = r["g"]
        w = w - lr * full / n
    return [float(x) for x in w]


def logreg_loss(feats: DataFrame, label_col: str, feature_cols: list[str],
                w: list[float]) -> float:
    """Mean binary log-loss of ``w`` (on the :func:`logreg_fit`
    standardized scale) over the corpus — one moments aggregate (the
    identical standardization pass) + one mapInPandas partial-sum
    pass. At w = 0 the loss is exactly ln 2 (the null model), so
    ``logreg_loss(.., fitted) < ln 2`` is the did-it-learn invariant
    with no second fit."""
    import numpy as np
    import pandas as pd

    d = len(feature_cols)
    aggs = []
    for c in feature_cols:
        aggs += [F.sum(F.col(c).cast("double")).alias(f"s_{c}"),
                 F.sum((F.col(c).cast("double")) ** 2).alias(f"q_{c}")]
    aggs.append(F.count(F.lit(1)).alias("n"))
    m = feats.agg(*aggs).collect()[0]
    n = m["n"]
    mu = np.array([m[f"s_{c}"] / n for c in feature_cols])
    sd = np.array([
        max(np.sqrt(m[f"q_{c}"] / n - (m[f"s_{c}"] / n) ** 2), 1e-12)
        for c in feature_cols])
    ww = np.array(w, dtype="float64")

    base = feats.select(
        F.col(label_col).cast("double").alias("y"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols])

    def partial(batches):
        s = 0.0
        for pdf in batches:
            x = (pdf[feature_cols].to_numpy() - mu) / sd
            xb = np.hstack([np.ones((len(pdf), 1)), x])
            y = pdf["y"].to_numpy()
            z = xb @ ww
            # -[y ln p + (1-y) ln(1-p)] = log1p(exp(-|z|)) + max(0, z) - y*z
            s += float(np.sum(np.log1p(np.exp(-np.abs(z)))
                              + np.maximum(z, 0.0) - y * z))
        yield pd.DataFrame({"s": [s]})

    tot = (base.mapInPandas(partial, "s double")
           .agg(F.sum("s")).collect()[0][0])
    return float(tot) / n

"""In-engine model fitting: batch-gradient logistic regression.

LLM curation pipelines train small quality classifiers (the
fastText-style page-quality filter lineage) over engine-computed
features and then apply them as another filter stage. The fit itself is
a textbook distributed computation: each gradient step is ONE ungrouped
aggregation over the feature table (partial-merge exact sums), and the
weight vector — k+1 scalars — lives on the driver, exactly like
k-means centroids (operators/kmeans.py). No per-row Python, no
driver-side loop over data; iterations × one scan.

At 100 TB the feature table is the thing that scales; the aggregate is
map-side-combined and the collected row is O(k). For many epochs cache
the feature projection; callers control that (same policy as
operators/graph.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logistic_fit(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    iterations: int = 3,
    lr: float = 0.5,
) -> list[float]:
    """Batch gradient descent for logistic regression; returns
    ``[bias, w_1, ..., w_k]`` after ``iterations`` full-batch steps from a
    zero init.

    Update rule (mean gradient): ``w_j -= lr * sum((p - y) * x_j) / n``
    with ``p = 1 / (1 + exp(-(w0 + Σ w_j x_j)))``. Deterministic given the
    input: zero init, fixed iteration count, no sampling. The one float
    caveat is the ungrouped sums' addition order (~1e-13 relative), so
    downstream consumers should round reported weights.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    k = len(feature_cols)
    w = [0.0] * (k + 1)
    n = feats.count()
    if n == 0:
        raise ValueError("cannot fit on an empty DataFrame")
    for _ in range(iterations):
        z = F.lit(w[0])
        for j, c in enumerate(feature_cols):
            z = z + F.lit(w[j + 1]) * F.col(c)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        resid = p - F.col(label_col)
        aggs = [F.sum(resid).alias("g0")] + [
            F.sum(resid * F.col(c)).alias(f"g{j + 1}")
            for j, c in enumerate(feature_cols)
        ]
        row = feats.agg(*aggs).collect()[0]
        w = [w[j] - lr * row[f"g{j}"] / n for j in range(k + 1)]
        if any(not math.isfinite(x) for x in w):
            raise ArithmeticError(
                f"diverged (non-finite weight) — lower lr={lr} or scale features"
            )
    return w

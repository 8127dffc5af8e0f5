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


def logistic_apply(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    threshold: float = 0.0,
) -> DataFrame:
    """APPLY a fitted logistic weight vector ``[bias, w_1, ..., w_k]``
    (the :func:`logistic_fit` artifact) to score rows — the inference
    half of the quality-classifier loop, as ONE narrow projection.

    The weights are baked into the plan as literals (the d fitted
    scalars ARE the broadcast — no join, no shuffle; the bpe_decode
    map-literal recipe), so scoring adds zero exchanges to the input
    scan: a map-only stage at 100 TB.  The score is the LINEAR logit
    ``z = w0 + Σ w_j·x_j`` and the keep decision ``passed = z >=
    threshold`` — equivalent to ``sigmoid(z) >= sigmoid(threshold)``
    by monotonicity, but exp-free: mul/add are correctly-rounded IEEE
    ops (bit-identical on any engine given identical weights), while
    ``exp`` is libm-dependent, so the linear form is what makes the
    scored corpus hash-checkable and the filter boundary deterministic.
    """
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"weights must be [bias] + one per feature: got {len(weights)} "
            f"weights for {len(feature_cols)} features"
        )
    z = F.lit(float(weights[0]))
    for j, c in enumerate(feature_cols):
        z = z + F.lit(float(weights[j + 1])) * F.col(c)
    return df.withColumn("z", z).withColumn(
        "passed", F.col("z") >= F.lit(float(threshold))
    )


def power_iteration_top_component(
    vectors: DataFrame,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_scale: int = 1_000_000,
) -> list[float]:
    """Dominant eigenvector of the (uncentered) second-moment matrix
    X^T X by power iteration — the spectral primitive behind PCA
    whitening, spectral hashing, and embedding-drift monitoring — run
    so that EVERY step is bit-reproducible on an external SQL engine.

    v_{t+1} ∝ X^T (X v_t), one distributed pass per iteration, never
    materializing the d×d matrix.  The reproducibility problem is the
    cross-ROW float sum (summation order is engine- and partition-
    dependent); the fix is the repo's quantization idiom applied per
    step: the corpus is floor-quantized once (xq = floor(x·q_scale),
    BIGINT), each row's projection q_i = floor(Σ_j xq_ij·v_j) is a
    per-row LEFT-TO-RIGHT fold (deterministic), and the d accumulators
    w_j = Σ_i q_i·xq_ij are EXACT integer sums — order-free.
    Normalization (sqrt, divide) uses only correctly-rounded IEEE ops
    on exactly-agreed integers, so the next v is the same doubles
    everywhere.  The driver holds only v (d floats) and w (d integers)
    — the kmeans/logistic convention; iterations × one scan.

    Quantization error is ~1/q_scale per step and cannot accumulate
    (power iteration is self-correcting).  Headroom (r8): the
    accumulators sum q·xq as ``decimal(38,0)`` — the same ~10³⁸
    capacity as the DuckDB oracle's HUGEINT, so both engines stay exact
    over the same domain instead of Spark's LongType failing ~10²⁰
    while the oracle kept going (the asymmetric-contract defect this
    fixes); and the per-row projection guards |Σ xq·v| < 2⁵³ — past
    that the double fold loses integer exactness BEFORE any cast
    overflows, so the operator raises a clear error rather than
    returning silently non-reproducible values.  Uncentered on purpose:
    the mean would be a float AVG (order-dependent); callers wanting
    centered PCA pre-subtract an integer-quantized mean.

    Init is e_1 (deterministic); raises if the corpus is numerically
    orthogonal to it.  Returns the unit component as plain floats.
    """
    d_row = vectors.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not d_row:
        raise ValueError("power_iteration_top_component: empty input")
    d = int(d_row[0]["d"])
    # the quantized corpus is re-read by EVERY iteration (and by every
    # deflated component's passes when the caller is
    # power_iteration_components) — materialize it once, the
    # stored-artifact rule; production would persist xq anyway as the
    # fit input
    xq = vectors.select(
        F.col(id_col),
        F.transform(
            vec_col, lambda x: F.floor(x.cast("double") * q_scale)
        ).alias("xq"),
    ).localCheckpoint(eager=True)
    v = [1.0] + [0.0] * (d - 1)
    for _ in range(int(n_iter)):
        q = _proj_q(F.col("xq"), v)
        w_rows = (
            xq.select(q.alias("q"), "xq")
            # q*x as decimal(19,0)x(19,0) -> decimal(38,0) sum: HUGEINT-
            # class headroom, matching the DuckDB oracle's exactness
            # domain (LongType accumulation failed ~10^18 while the
            # oracle stayed exact — the r8 asymmetric-contract fix)
            .select("q", F.posexplode("xq").alias("dim", "x"))
            .groupBy("dim")
            .agg(
                F.sum(
                    F.col("q").cast("decimal(19,0)")
                    * F.col("x").cast("decimal(19,0)")
                ).alias("w")
            )
            .collect()  # bounded: d rows — the kmeans convention
        )
        w = [0] * d
        for r in w_rows:
            w[r["dim"]] = _accum_int(r["w"], "power_iteration_top_component")
        norm = math.sqrt(float(sum(wj * wj for wj in w)))
        if norm == 0.0:
            raise ValueError("power iteration collapsed to the zero vector")
        v = [float(wj) / norm for wj in w]
    return v


def _proj_q(vec_xq_col, v: list[float]):
    """Per-row quantized projection floor(Σ_j xq_j·v_j) — deterministic
    left-to-right fold, the scheme's per-row primitive.  Guards
    |Σ xq·v| < 2⁵³ BEFORE the floor: past that the double fold loses
    integer exactness silently, breaking the bit-reproducibility
    contract — so raise loudly instead (shared by the base iteration
    AND every deflated pass; the r9 ADVICE fix closing the gap where
    component-2+ projections skipped the guard component 1 had)."""
    v_arr = F.array(*[F.lit(float(x)) for x in v])
    s = F.aggregate(
        F.zip_with(vec_xq_col, v_arr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        F.when(F.abs(s) < F.lit(float(2**53)), F.floor(s))
        .otherwise(
            F.raise_error(
                F.lit(
                    "power iteration: per-row projection |sum(xq*v)| >= "
                    "2^53 — double fold loses integer exactness; lower "
                    "q_scale"
                )
            )
        )
        .cast("long")
    )


def _accum_int(value: object, where: str) -> int:
    """Convert a collected decimal(38,0) accumulator to int, failing
    with a dial-naming error when it is NULL (non-ANSI decimal overflow
    returns NULL; a bare ``int(None)`` TypeError would hide the cause)."""
    if value is None:
        raise ArithmeticError(
            f"{where}: decimal(38,0) accumulator overflowed (NULL sum) — "
            "lower q_scale so quantized products fit the 10^38 headroom"
        )
    return int(value)


def power_iteration_components(
    vectors: DataFrame,
    n_components: int = 2,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_scale: int = 1_000_000,
) -> list[list[float]]:
    """Top ``n_components`` eigenvectors of X^T X by power iteration
    with PROJECTION DEFLATION — every step bit-reproducible on an
    external SQL engine, extending
    :func:`power_iteration_top_component`'s exact-integer scheme to the
    deflated components (the OPQ/PCA-rotation primitive, Ge et al.
    2013 §3.1 parametric case).

    Component 1 is exactly :func:`power_iteration_top_component`.
    Component c iterates on the deflated operator
    (I − Σ_u v_u v_uᵀ)·M: per iteration the distributed pass computes
    the usual exact accumulators w_j = Σ_i q_i·xq_ij PLUS one exact
    cross-projection per previous component, α_u = Σ_i q^(u)_i·q_i
    with q^(u)_i = floor(xq_i·v_u) (both integer sums — order-free,
    decimal(38,0) headroom); the deflation correction
    w_j − Σ_u α_u·v_uj happens driver-side in plain IEEE doubles
    applied LEFT-TO-RIGHT in component order, then floor-quantizes so
    the norm is again an exact integer sum.  Every float op is a
    correctly-rounded function of exactly-agreed integers and
    previously-agreed doubles, so a SQL engine unrolling the same CTE
    chain reproduces each component bit-for-bit (the
    ``embedding_top_components`` oracle does).

    Per component: n_iter × (1 accumulator pass + 1 cross-projection
    aggregate) distributed scans; driver state is c·d floats — the
    kmeans convention.  Deflation is self-correcting the same way the
    base iteration is; the usual caveat applies that power iteration
    resolves component c only when an eigengap separates it.
    """
    r = int(n_components)
    if r < 1:
        raise ValueError(f"n_components must be >= 1, got {n_components}")
    comps = [
        power_iteration_top_component(
            vectors, n_iter=n_iter, id_col=id_col, vec_col=vec_col,
            q_scale=q_scale,
        )
    ]
    if r == 1:
        return comps
    d = len(comps[0])
    # consumed 2× per deflated iteration — stored-artifact rule (the
    # top-component call above checkpoints its own copy; at component
    # counts where that duplication mattered, thread one xq through)
    xq = vectors.select(
        F.col(id_col),
        F.transform(
            vec_col, lambda x: F.floor(x.cast("double") * q_scale)
        ).alias("xq"),
    ).localCheckpoint(eager=True)
    dec = "decimal(19,0)"
    for _ in range(1, r):
        # init: e_{c+1} shifted off the span of previous components
        v = [0.0] * d
        v[len(comps) % d] = 1.0
        for _ in range(int(n_iter)):
            q = _proj_q(F.col("xq"), v)
            prev_qs = [_proj_q(F.col("xq"), u) for u in comps]
            # ONE pass per iteration: the d accumulators AND the c-1
            # cross-projections ride the same posexplode groupBy — the
            # alpha_u sums attach to the dim=0 group (each input row
            # contributes its (q^(u), q) product exactly once there).
            # All sums are exact integers, so fusing cannot change a
            # value; it halves the per-iteration scan count, which IS
            # the wall time on a driver-loop iterative operator.
            w_rows = (
                xq.select(
                    q.alias("q"),
                    *[pq.alias(f"q{u}") for u, pq in enumerate(prev_qs)],
                    "xq",
                )
                .select(
                    "q",
                    *[f"q{u}" for u in range(len(comps))],
                    F.posexplode("xq").alias("dim", "x"),
                )
                .groupBy("dim")
                .agg(
                    F.sum(F.col("q").cast(dec) * F.col("x").cast(dec)).alias("w"),
                    *[
                        F.sum(
                            F.when(
                                F.col("dim") == 0,
                                F.col(f"q{u}").cast(dec) * F.col("q").cast(dec),
                            )
                        ).alias(f"a{u}")
                        for u in range(len(comps))
                    ],
                )
                .collect()  # bounded: d rows
            )
            w_raw = [0] * d
            alphas = [0] * len(comps)
            for row in w_rows:
                w_raw[row["dim"]] = _accum_int(
                    row["w"], "power_iteration_components"
                )
                if row["dim"] == 0:
                    alphas = [
                        _accum_int(
                            row[f"a{u}"],
                            "power_iteration_components (alpha)",
                        )
                        for u in range(len(comps))
                    ]
            # deflation correction + floor re-quantization, LEFT-TO-RIGHT
            # in component order — plain IEEE doubles, mirrored verbatim
            # by the SQL oracle
            wq = []
            for j in range(d):
                x = float(w_raw[j])
                for u, comp in enumerate(comps):
                    x = x - float(alphas[u]) * comp[j]
                wq.append(math.floor(x))
            norm = math.sqrt(float(sum(wj * wj for wj in wq)))
            if norm == 0.0:
                raise ValueError(
                    "deflated power iteration collapsed to the zero vector"
                )
            v = [float(wj) / norm for wj in wq]
        comps.append(v)
    return comps

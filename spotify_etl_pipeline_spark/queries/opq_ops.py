"""OPQ: PCA-rotated product quantization (SURVEY.md X3/X12 tier,
round 8) — the Ge et al. 2013 "Optimized Product Quantization" recipe
in its parametric (spectral) form, built on the exact cross-engine
power iteration:

1. ``embedding_top_components`` — the top-2 eigenvectors of X^T X by
   power iteration with PROJECTION DEFLATION, every step
   bit-reproducible in DuckDB (extends ``embedding_top_component``'s
   exact-integer scheme with one exact cross-projection integer sum per
   previous component — operators/ml.py::power_iteration_components).
2. ``knn_opq_pinned_topk`` — Householder reflections map component c
   onto the first dimension of subspace c (the eigenvalue-balance full
   OPQ optimizes for, realized for the directions the deflation
   resolves), the corpus and queries rotate through the reflections
   (rank-1 updates, distances preserved), and the UNCHANGED pinned PQ
   pipeline (init-only codebooks, integer micro-unit ADC, exact rerank)
   runs entirely in rotated space — so the WHOLE chain, spectrum →
   rotation → encode → search, is value-hash-checked against DuckDB.

The quality claim (OPQ recall ≥ plain PQ when the dominant variance
directions straddle subspace boundaries) is pinned in
tests/test_opq.py on an engineered anisotropic tile — the fixture's
near-isotropic spectrum cannot show the gap by construction, which is
itself the textbook statement of when OPQ pays.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_fixture
from .catalog import register
from .similarity_queries import K, N_QUERIES, PQ_K, PQ_M, PQ_SHORTLIST
from .stats_ops import PI_D, PI_ITERS, PI_Q, _pi_pass_ctes

OPQ_COMPONENTS = 2


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_fixture(spark, sf_dir, "embeddings")


def _materialize(sql: str, names: tuple[str, ...]) -> str:
    """Mark the named CTEs ``AS MATERIALIZED``: DuckDB inlines CTEs by
    default, and in a chain this deep (spectrum → deflation → rotation
    → PQ) every multi-referenced CTE duplicates its ENTIRE upstream
    subtree per reference — the parquet scan count grows geometrically
    and exhausts file descriptors before any row is produced.
    Materializing the chain joints makes each stage evaluate once, the
    same shape the Spark side gets from localCheckpoint.

    Raises when a named CTE produces zero substitutions (r9 ADVICE fix):
    a silent no-op on a spelling/whitespace drift in a shared oracle
    fragment would quietly drop AS MATERIALIZED and reintroduce the
    geometric re-evaluation this exists to prevent — mirror the
    ``_RESID_HEAD`` drift guard and fail loudly instead."""
    import re

    for n in names:
        sql, count = re.subn(rf"(?<![\w]){n} AS \(", f"{n} AS MATERIALIZED (", sql)
        if count == 0:
            raise ValueError(
                f"_materialize: CTE {n!r} not found as '{n} AS (' — the "
                "shared oracle fragment drifted; update the names tuple "
                "or the fragment spelling together"
            )
    return sql


# --- oracle CTE builders -----------------------------------------------------


def _c2_pass_ctes(t: int) -> str:
    """One DEFLATED power-iteration step for component 2 (the chain
    v3 → pf1 supplies component 1 and the per-row projections on it):
    current-v projection ``c2p{t}``, exact cross-projection α =
    Σ q1·q (HUGEINT — order-free), accumulators with the driver-side
    correction floor(w − α·v1_j) re-quantized, norm, next unit vector —
    mirrors operators/ml.py::power_iteration_components bit-for-bit
    (see its docstring for the exactness argument)."""
    return f"""
    c2p{t} AS (
      SELECT p.vec_id, p.xq, p.q1,
             CAST(FLOOR(list_sum(list_transform(list_zip(p.xq, c2v{t - 1}.v),
                        z -> CAST(z[1] AS DOUBLE) * z[2]))) AS BIGINT) AS q
      FROM pf1 p CROSS JOIN c2v{t - 1}
    ),
    c2a{t} AS (SELECT SUM(CAST(q1 AS HUGEINT) * q) AS a FROM c2p{t}),
    c2w{t} AS (
      SELECT dims.dim, SUM(CAST(q AS HUGEINT) * xq[dims.dim + 1]) AS wr
      FROM c2p{t} CROSS JOIN dims GROUP BY dims.dim
    ),
    c2wq{t} AS (
      SELECT w.dim,
             CAST(FLOOR(CAST(w.wr AS DOUBLE)
                        - CAST(c2a{t}.a AS DOUBLE)
                          * v{PI_ITERS}.v[w.dim + 1]) AS BIGINT) AS wq
      FROM c2w{t} w CROSS JOIN c2a{t} CROSS JOIN v{PI_ITERS}
    ),
    c2n{t} AS (
      SELECT SQRT(CAST(SUM(CAST(wq AS HUGEINT) * wq) AS DOUBLE)) AS nrm
      FROM c2wq{t}
    ),
    c2v{t} AS (
      SELECT list(CAST(wq AS DOUBLE) / c2n{t}.nrm ORDER BY dim) AS v
      FROM c2wq{t} CROSS JOIN c2n{t}
    )"""


def _components_ctes() -> str:
    """The shared spectrum chain: base/dims, component 1 (the verbatim
    ``embedding_top_component`` unroll — imports its CTE builder), the
    per-row projections on the final component 1 (``pf1``, computed
    once — iteration-independent), init e_2, and the deflated
    component-2 passes."""
    return f"""
    base AS (
      SELECT vec_id,
             list_transform(embedding,
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * {PI_Q}) AS BIGINT))
               AS xq
      FROM embeddings
    ),
    dims AS (SELECT UNNEST(range({PI_D})) AS dim),
    v0 AS (
      SELECT list_prepend(CAST(1.0 AS DOUBLE),
                 list_transform(range({PI_D - 1}),
                                i -> CAST(0.0 AS DOUBLE))) AS v
    ),
    {",".join(_pi_pass_ctes(i) for i in range(1, PI_ITERS + 1))},
    pf1 AS (
      SELECT base.vec_id, base.xq,
             CAST(FLOOR(list_sum(list_transform(
                        list_zip(base.xq, v{PI_ITERS}.v),
                        z -> CAST(z[1] AS DOUBLE) * z[2]))) AS BIGINT) AS q1
      FROM base CROSS JOIN v{PI_ITERS}
    ),
    c2v0 AS (
      SELECT list_transform(range({PI_D}),
                 i -> CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE)
                           ELSE CAST(0.0 AS DOUBLE) END) AS v
    ),
    {",".join(_c2_pass_ctes(t) for t in range(1, PI_ITERS + 1))}"""


def _rotation_ctes(out: str = "e") -> str:
    """Householder construction + corpus rotation over the spectrum
    chain: unnormalized u1 = v1 − e_1 (target: first dim of subspace
    0), v2 passed through H1, u2 = H1(v2) − e_17 (first dim of subspace
    1), then the corpus rotated reflection-by-reflection — every scalar
    an index-ordered list fold, every elementwise op written with the
    same association ((2·t)/s)·u as operators/pq.py::opq_rotate and the
    driver-side opq_householders, so the rotated doubles are
    bit-identical.  An ``s < 1e-24`` reflection is skipped on both
    engines (component already on its target axis)."""
    sub_d = PI_D // PQ_M
    return f"""
    h1u AS (
      SELECT list_transform(range({PI_D}),
                 i -> v{PI_ITERS}.v[i + 1]
                      - CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END) AS u
      FROM v{PI_ITERS}
    ),
    h1s AS (SELECT list_sum(list_transform(u, x -> x * x)) AS s FROM h1u),
    h1t AS (
      SELECT list_sum(list_transform(list_zip(c2v{PI_ITERS}.v, h1u.u),
                                     p -> p[1] * p[2])) AS t
      FROM c2v{PI_ITERS} CROSS JOIN h1u
    ),
    v2r AS (
      SELECT CASE WHEN h1s.s < 1e-24 THEN c2v{PI_ITERS}.v
                  ELSE list_transform(list_zip(c2v{PI_ITERS}.v, h1u.u),
                       p -> p[1] - 2.0 * h1t.t / h1s.s * p[2]) END AS v
      FROM c2v{PI_ITERS} CROSS JOIN h1u CROSS JOIN h1s CROSS JOIN h1t
    ),
    h2u AS (
      SELECT list_transform(range({PI_D}),
                 i -> v2r.v[i + 1]
                      - CASE WHEN i = {sub_d} THEN 1.0 ELSE 0.0 END) AS u
      FROM v2r
    ),
    h2s AS (SELECT list_sum(list_transform(u, x -> x * x)) AS s FROM h2u),
    e0 AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    r1t AS (
      SELECT e0.vec_id, e0.v,
             list_sum(list_transform(list_zip(e0.v, h1u.u),
                                     p -> p[1] * p[2])) AS t
      FROM e0 CROSS JOIN h1u
    ),
    r1 AS (
      SELECT r1t.vec_id,
             CASE WHEN h1s.s < 1e-24 THEN r1t.v
                  ELSE list_transform(list_zip(r1t.v, h1u.u),
                       p -> p[1] - 2.0 * r1t.t / h1s.s * p[2]) END AS v
      FROM r1t CROSS JOIN h1u CROSS JOIN h1s
    ),
    r2t AS (
      SELECT r1.vec_id, r1.v,
             list_sum(list_transform(list_zip(r1.v, h2u.u),
                                     p -> p[1] * p[2])) AS t
      FROM r1 CROSS JOIN h2u
    ),
    {out} AS (
      SELECT r2t.vec_id,
             CASE WHEN h2s.s < 1e-24 THEN r2t.v
                  ELSE list_transform(list_zip(r2t.v, h2u.u),
                       p -> p[1] - 2.0 * r2t.t / h2s.s * p[2]) END AS v
      FROM r2t CROSS JOIN h2u CROSS JOIN h2s
    )"""


def _pinned_pq_ctes() -> str:
    """The knn_pq_pinned_topk oracle chain verbatim over relation
    ``e`` (vec_id, v) — here ``e`` is the ROTATED corpus: init-only
    codebooks from the 16 lowest-vec_id (rotated) vectors, index-
    ordered-fold encode/LUT distances, micro-unit integer ADC, exact
    rerank — see similarity_queries.knn_pq_pinned_topk for the
    determinism argument."""
    sub_d = PI_D // PQ_M
    return f"""
    init AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {PQ_K})
    ),
    subs AS (SELECT UNNEST(range({PQ_M})) AS sub),
    books AS (
      SELECT subs.sub, init.code,
             list_slice(init.v, subs.sub * {sub_d} + 1,
                        subs.sub * {sub_d} + {sub_d}) AS cw
      FROM init CROSS JOIN subs
    ),
    vsub AS (
      SELECT e.vec_id, subs.sub,
             list_slice(e.v, subs.sub * {sub_d} + 1,
                        subs.sub * {sub_d} + {sub_d}) AS sv
      FROM e CROSS JOIN subs
    ),
    dists AS (
      SELECT vsub.vec_id, vsub.sub, books.code,
             list_sum(list_transform(list_zip(vsub.sv, books.cw),
                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      FROM vsub JOIN books ON vsub.sub = books.sub
    ),
    enc AS (
      SELECT vec_id, sub, code
      FROM (SELECT vec_id, sub, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d2 ASC, code ASC) AS rn
            FROM dists)
      WHERE rn = 1
    ),
    lut AS (
      SELECT vec_id AS query_id, sub, code,
             CAST(FLOOR(d2 * 1000000) AS BIGINT) AS d2u
      FROM dists WHERE vec_id < {N_QUERIES}
    ),
    adc AS (
      SELECT lut.query_id, enc.vec_id AS neighbor_id,
             CAST(SUM(lut.d2u) AS BIGINT) AS adc_u
      FROM enc JOIN lut ON enc.sub = lut.sub AND enc.code = lut.code
      WHERE lut.query_id != enc.vec_id
      GROUP BY lut.query_id, enc.vec_id
    ),
    short AS (
      SELECT query_id, neighbor_id
      FROM (SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adc_u ASC, neighbor_id ASC)
                       AS srank
            FROM adc)
      WHERE srank <= {PQ_SHORTLIST}
    ),
    rer AS (
      SELECT short.query_id, short.neighbor_id,
             list_sum(list_transform(list_zip(q.v, c.v),
                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      FROM short
      JOIN e q ON q.vec_id = short.query_id
      JOIN e c ON c.vec_id = short.neighbor_id
    )"""


# --- catalog entries ---------------------------------------------------------

#: chain joints evaluated once (multi-referenced CTEs; see _materialize)
_SPECTRUM_MAT = (
    ("base", "pf1")
    + tuple(f"w{i}" for i in range(1, PI_ITERS + 1))
    + tuple(f"v{i}" for i in range(1, PI_ITERS + 1))
    + tuple(f"c2p{t}" for t in range(1, PI_ITERS + 1))
    + tuple(f"c2wq{t}" for t in range(1, PI_ITERS + 1))
    + tuple(f"c2v{t}" for t in range(1, PI_ITERS + 1))
)
_ROTATION_MAT = ("h1u", "h1s", "h2u", "h2s", "e", "dists")


@register(
    "embedding_top_components",
    oracle=_materialize(
        f"""
    WITH {_components_ctes()}
    SELECT comp, dims.dim AS dim,
           CAST(FLOOR(v[dims.dim + 1] * 1000000 + 0.5) AS BIGINT)
             AS comp_micro
    FROM (SELECT 1 AS comp, v FROM v{PI_ITERS}
          UNION ALL
          SELECT 2 AS comp, v FROM c2v{PI_ITERS})
    CROSS JOIN dims
    """,
        _SPECTRUM_MAT,
    ),
    survey="X12,X3,X31",
    doc=f"Top-{OPQ_COMPONENTS} eigenvectors of the embedding second-"
    "moment matrix by power iteration with PROJECTION DEFLATION — the "
    "spectral primitive OPQ/PCA rotation consumes — with every step "
    "bit-reproducible cross-engine: component 1 is the verified "
    "embedding_top_component chain; component 2 iterates on "
    "(I - v1 v1^T)M with the one new cross-row quantity, the cross-"
    "projection alpha = sum(q1*q), an EXACT integer sum (order-free, "
    "like the accumulators), and the deflation correction applied in "
    "plain IEEE doubles then floor-re-quantized so the norm is again "
    "an exact integer sum. Emits (comp, dim, comp_micro). Per "
    "component per iteration: one accumulator scan + one 2-scalar "
    "aggregate; driver holds 2*d floats (the kmeans convention).",
)
def embedding_top_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ml import power_iteration_components

    emb = _emb(spark, sf_dir)
    comps = power_iteration_components(
        emb, n_components=OPQ_COMPONENTS, n_iter=PI_ITERS, q_scale=PI_Q
    )
    return spark.createDataFrame(
        [
            (c + 1, j, math.floor(x * 1_000_000 + 0.5))
            for c, comp in enumerate(comps)
            for j, x in enumerate(comp)
        ],
        "comp: bigint, dim: bigint, comp_micro: bigint",
    )


@register(
    "knn_opq_pinned_topk",
    oracle=_materialize(
        f"""
    WITH {_components_ctes()},
    {_rotation_ctes()},
    {_pinned_pq_ctes()}
    SELECT query_id, neighbor_id, rank,
           CAST(FLOOR(d2 * 1000000) AS BIGINT) AS d2_micro
    FROM (SELECT query_id, neighbor_id, d2,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY d2 ASC, neighbor_id ASC) AS rank
          FROM rer)
    WHERE rank <= {K}
    """,
        _SPECTRUM_MAT + _ROTATION_MAT,
    ),
    survey="X3,X12,X32",
    doc="OPQ — PCA-rotated product quantization (Ge et al. 2013, "
    "parametric form) with the ENTIRE chain value-hash-checked: the "
    "deflated exact power iteration supplies the top-2 components, "
    "Householder reflections map them onto the first dimensions of "
    "subspaces 0 and 1 (the eigenvalue balance full OPQ optimizes "
    "for — the dominant variance directions land in DIFFERENT "
    "subspaces instead of straddling codebooks), the corpus and "
    "queries rotate through the reflections (rank-1 narrow updates, "
    "L2 preserved, search lives wholly in rotated space), and the "
    "verified pinned PQ pipeline (init-only codebooks, micro-unit "
    "integer ADC, exact rerank) runs unchanged on the rotated index. "
    "The rotated index is eagerly localCheckpointed (the stored-"
    "artifact rule). Recall >= plain PQ on an anisotropic tile is "
    "pinned in tests/test_opq.py; the trained-codebook quality arm is "
    "exercised there too.",
)
def knn_opq_pinned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ml import power_iteration_components
    from ..operators.pq import (
        _exact_rerank,
        opq_householders,
        opq_rotate,
        pq_encode,
        pq_fit,
        pq_query_lut,
    )

    emb = _emb(spark, sf_dir)
    comps = power_iteration_components(
        emb, n_components=OPQ_COMPONENTS, n_iter=PI_ITERS, q_scale=PI_Q
    )
    hs = opq_householders(comps, m=PQ_M)
    # the rotated corpus is the stored index artifact (rotation happens
    # once at build time in production); it feeds the codebook init, the
    # encode pass, the LUT, and the rerank — materialize it once
    rot = opq_rotate(emb, hs).localCheckpoint(eager=True)
    queries = rot.filter(F.col("vec_id") < N_QUERIES)
    books = pq_fit(rot, m=PQ_M, k=PQ_K, max_iter=0)  # init-only: exact
    codes = pq_encode(rot, books)
    lut = pq_query_lut(queries, books).select(
        "query_id",
        "sub",
        "code",
        F.floor(F.col("d2") * 1_000_000).alias("d2u"),
    )
    exploded = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        F.posexplode("pq_codes").alias("sub", "code"),
    )
    scored = (
        exploded.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d2u").alias("adc_u"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_u"), F.asc("neighbor_id")
    )
    short = (
        scored.withColumn("srank", F.row_number().over(w))
        .filter(F.col("srank") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(short, rot, queries, k=K)


# --- embedding drift: the spectrum primitive applied as a monitor ----------


def _pi_pass_ctes_pfx(pfx: str, i: int) -> str:
    """The verified power-iteration step CTEs (stats_ops._pi_pass_ctes)
    with every name prefixed, so two independent chains — one per
    corpus half — coexist in one drift-monitor oracle."""
    return f"""
    {pfx}p{i} AS (
      SELECT vec_id, xq,
             CAST(FLOOR(list_sum(list_transform(list_zip(xq, {pfx}v{i - 1}.v),
                        p -> CAST(p[1] AS DOUBLE) * p[2]))) AS BIGINT) AS q
      FROM {pfx}base CROSS JOIN {pfx}v{i - 1}
    ),
    {pfx}w{i} AS (
      SELECT dims.dim,
             SUM(CAST({pfx}p{i}.q AS HUGEINT) * {pfx}p{i}.xq[dims.dim + 1]) AS w
      FROM {pfx}p{i} CROSS JOIN dims GROUP BY dims.dim
    ),
    {pfx}n{i} AS (
      SELECT SQRT(CAST(SUM(w * w) AS DOUBLE)) AS nrm FROM {pfx}w{i}
    ),
    {pfx}v{i} AS (
      SELECT list(CAST(w AS DOUBLE) / {pfx}n{i}.nrm ORDER BY dim) AS v
      FROM {pfx}w{i} CROSS JOIN {pfx}n{i}
    )"""


def _drift_half_ctes(pfx: str, parity: int) -> str:
    return f"""
    {pfx}base AS (
      SELECT vec_id,
             list_transform(embedding,
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * {PI_Q}) AS BIGINT))
               AS xq
      FROM embeddings WHERE vec_id % 2 = {parity}
    ),
    {pfx}v0 AS (
      SELECT list_prepend(CAST(1.0 AS DOUBLE),
                 list_transform(range({PI_D - 1}),
                                i -> CAST(0.0 AS DOUBLE))) AS v
    ),
    {",".join(_pi_pass_ctes_pfx(pfx, i) for i in range(1, PI_ITERS + 1))}"""


@register(
    "embedding_drift_components",
    oracle=_materialize(
        f"""
    WITH dims AS (SELECT UNNEST(range({PI_D})) AS dim),
    {_drift_half_ctes("ha", 0)},
    {_drift_half_ctes("hb", 1)}
    SELECT half, dims.dim AS dim,
           CAST(FLOOR(v[dims.dim + 1] * 1000000 + 0.5) AS BIGINT)
             AS comp_micro
    FROM (SELECT 0 AS half, v FROM hav{PI_ITERS}
          UNION ALL
          SELECT 1 AS half, v FROM hbv{PI_ITERS})
    CROSS JOIN dims
    """,
        tuple(f"{p}{n}{i}" for p in ("ha", "hb") for n in ("w", "v")
              for i in range(1, PI_ITERS + 1))
        + ("habase", "hbbase"),
    ),
    survey="X12,X4,X31",
    doc="EMBEDDING DRIFT MONITOR — the production use of the exact "
    "spectrum primitive: the dominant second-moment eigenvector of each "
    "corpus half (vec_id parity standing in for yesterday/today, "
    "shard A/B, pre/post-reingest), emitted as (half, dim, comp_micro) "
    "with every step bit-reproducible cross-engine (two independent "
    "unrolls of the verified power-iteration chain). The drift angle "
    "acos(|v_a . v_b|) is a trivial driver-side dot of the two returned "
    "components — near 0 for same-distribution halves (asserted in "
    "tests/test_opq.py with a planted-drift counterexample). Two "
    "filtered scans per iteration; partition pruning applies when the "
    "halves are real partitions.",
)
def embedding_drift_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ml import power_iteration_top_component

    emb = _emb(spark, sf_dir)
    rows = []
    for half in (0, 1):
        comp = power_iteration_top_component(
            emb.filter(F.col("vec_id") % 2 == half),
            n_iter=PI_ITERS,
            q_scale=PI_Q,
        )
        rows.extend(
            (half, j, math.floor(x * 1_000_000 + 0.5))
            for j, x in enumerate(comp)
        )
    return spark.createDataFrame(
        rows, "half: bigint, dim: bigint, comp_micro: bigint"
    )


# --- OPQ + residual IVFADC: the full Faiss OPQ->IVFPQ production shape ------

#: The verified residual-IVFADC oracle with its head CTE swapped for the
#: rotated corpus: everything downstream (cell references, residuals,
#: init-only books, per-(query, probed-cell) LUTs, fused ADC, exact
#: rerank) is the knn_ivfadc_residual_topk oracle VERBATIM — the
#: composition changes the input space, not the machinery, exactly like
#: the Spark side (pq_ivfadc_residual_topk over opq_rotate output).
_RESID_HEAD = """
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),"""


def _opq_resid_oracle() -> str:
    from .catalog import CATALOG

    base = CATALOG["knn_ivfadc_residual_topk"].oracle
    if _RESID_HEAD not in base:
        raise RuntimeError(
            "knn_ivfadc_residual_topk oracle head changed — update the "
            "OPQ composition's head swap in lockstep"
        )
    head = f"""
    WITH {_components_ctes()},
    {_rotation_ctes(out="rote")},
    e AS (
      SELECT rote.vec_id, emb2.label, rote.v
      FROM rote JOIN embeddings emb2 USING (vec_id)
    ),"""
    return _materialize(
        base.replace(_RESID_HEAD, head),
        _SPECTRUM_MAT + ("h1u", "h1s", "h2u", "h2s", "rote", "e", "rdists"),
    )


@register(
    "knn_opq_ivfadc_residual_topk",
    oracle=_opq_resid_oracle(),
    survey="X3,X12,X32",
    doc="OPQ composed with residual IVFADC — the complete Faiss "
    "OPQMatrix->IndexIVFPQ production shape (Ge et al. 2013 + Jégou et "
    "al. 2011 §IV.A) under ONE full value-hash: the deflated exact "
    "spectrum rotates the corpus (Householder reflections, L2 "
    "preserved, stored IVF cells unchanged — rotation is an index-"
    "build-time narrow map), then the verified residual pipeline runs "
    "verbatim in rotated space: pinned lowest-id cell references, "
    "init-only residual codebooks, per-(query, probed-cell) integer-"
    "micro LUTs, the fused broadcast-ADC join with map-side partial "
    "aggregation, exact rerank on the shortlist. The oracle reuses the "
    "knn_ivfadc_residual_topk CTE chain with only its head swapped for "
    "the rotated relation (guarded against drift), so any divergence "
    "in the shared machinery shows up in BOTH entries' hashes.",
)
def knn_opq_ivfadc_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ml import power_iteration_components
    from ..operators.pq import (
        opq_householders,
        opq_rotate,
        pq_ivfadc_residual_topk,
    )

    emb = _emb(spark, sf_dir)
    comps = power_iteration_components(
        emb, n_components=OPQ_COMPONENTS, n_iter=PI_ITERS, q_scale=PI_Q
    )
    hs = opq_householders(comps, m=PQ_M)
    rot = (
        opq_rotate(emb, hs)
        .join(emb.select("vec_id", "label"), "vec_id")
        # the rotated, cell-tagged corpus is the stored index input —
        # one eager materialization, many consumers downstream
        .localCheckpoint(eager=True)
    )
    queries = rot.filter(F.col("vec_id") < N_QUERIES).select(
        "vec_id", "embedding"
    )
    return pq_ivfadc_residual_topk(
        rot, queries, m=PQ_M, k_codes=PQ_K, k=K, shortlist=PQ_SHORTLIST,
        n_probe=3, cluster_col="label", coarse_mode="pinned",
        books_max_iter=0, int_units=True,
    )

"""OPQ tier (operators/pq.py::opq_householders/opq_rotate +
operators/ml.py::power_iteration_components, Ge et al. 2013): the
deflated spectrum must match numpy, the rotation must be orthonormal
and land the components on their balanced subspace axes, and — the
tier's reason to exist — ADC recall must improve over plain PQ when
the dominant variance directions straddle subspace boundaries.

The recall tile is ENGINEERED anisotropic (two planted factor
directions spread across every subspace): the repo's embeddings
fixture is near-isotropic, where rotation provably cannot help — which
is the textbook statement of when OPQ pays, not a weakness of the
test."""

from __future__ import annotations

import math

import numpy as np
import pytest

from spotify_etl_pipeline_spark.operators.ml import power_iteration_components
from spotify_etl_pipeline_spark.operators.pq import (
    brute_force_l2_topk,
    opq_householders,
    opq_rotate,
    pq_adc_topk,
    pq_encode,
    pq_fit,
)

D = 16
N = 400
N_Q = 20


def _anisotropic(rng, n=N, d=D):
    """Two orthogonal factor directions with energy in EVERY dim (the
    worst case for axis-aligned subspace splitting) + small noise."""
    a = np.ones(d) / math.sqrt(d)
    b = np.array([1.0 if i % 2 == 0 else -1.0 for i in range(d)]) / math.sqrt(d)
    X = (
        (rng.normal(size=(n, 1)) * 10.0) @ a[None, :]
        + (rng.normal(size=(n, 1)) * 4.0) @ b[None, :]
        + rng.normal(size=(n, d)) * 0.3
    )
    return X, a, b


def _df(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id: long, embedding: array<double>",
    )


def test_deflated_components_match_numpy(spark):
    rng = np.random.default_rng(7)
    X, _, _ = _anisotropic(rng)
    comps = power_iteration_components(_df(spark, X), n_components=2, n_iter=6)
    M = X.T @ X
    _, evecs = np.linalg.eigh(M)
    v1, v2 = np.array(comps[0]), np.array(comps[1])
    assert abs(v1 @ evecs[:, -1]) >= 0.999
    assert abs(v2 @ evecs[:, -2]) >= 0.999
    assert abs(v1 @ v2) < 1e-6  # deflation keeps the pair orthogonal


def test_rotation_is_isometric_and_balances_axes(spark):
    rng = np.random.default_rng(7)
    X, _, _ = _anisotropic(rng)
    df = _df(spark, X)
    comps = power_iteration_components(df, n_components=2, n_iter=6)
    hs = opq_householders(comps, m=4)
    Y = np.array(
        [
            r["embedding"]
            for r in opq_rotate(df, hs).orderBy("vec_id").collect()
        ]
    )
    # isometry: pairwise distances preserved to rounding
    for i, j in [(0, 1), (5, 9), (100, 300)]:
        assert math.isclose(
            float(np.linalg.norm(X[i] - X[j])),
            float(np.linalg.norm(Y[i] - Y[j])),
            rel_tol=1e-9,
        )
    # eigenvalue balance: the two dominant directions land on the first
    # dim of subspaces 0 and 1 (dims 0 and 4 at d=16, m=4) — those two
    # coordinates carry essentially all the planted variance
    var = Y.var(axis=0)
    rest = np.delete(var, [0, 4])
    assert var[0] > 50 and var[4] > 5
    assert rest.max() < 1.0


def test_opq_recall_beats_plain_pq_on_anisotropic_tile(spark):
    """The tier's quality claim, pinned: pure-ADC recall@10 vs exact L2
    with TRAINED codebooks (the quality dials), rotated vs not. The
    planted factors straddle every subspace unrotated, so plain PQ
    quantizes correlated subvectors independently; rotation concentrates
    them on two axes in different subspaces."""
    rng = np.random.default_rng(11)
    X, _, _ = _anisotropic(rng)
    df = _df(spark, X).localCheckpoint(eager=True)
    queries = df.filter(f"vec_id < {N_Q}")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_l2_topk(df, queries, k=10).collect()
    }

    def adc_recall(corpus):
        q = corpus.filter(f"vec_id < {N_Q}")
        books = pq_fit(corpus, m=4, k=16, max_iter=4)
        codes = pq_encode(corpus, books)
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in pq_adc_topk(codes, q, books, k=10).collect()
        }
        # truth is in ORIGINAL space; rotation preserves L2, so the
        # exact top-10 sets are identical in rotated space
        return len(got & truth) / len(truth)

    plain = adc_recall(df)
    comps = power_iteration_components(df, n_components=2, n_iter=6)
    rot = opq_rotate(df, opq_householders(comps, m=4)).localCheckpoint(
        eager=True
    )
    rotated = adc_recall(rot)
    assert rotated >= plain, (rotated, plain)
    assert rotated - plain >= 0.05  # a real gap, not tie-noise


def test_opq_guards(spark):
    comps = [[1.0] + [0.0] * 15]
    with pytest.raises(ValueError, match="components"):
        opq_householders(comps * 5, m=4)  # more components than subspaces
    with pytest.raises(ValueError, match="divisible"):
        opq_householders([[1.0, 0.0, 0.0]], m=2)
    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id: long, embedding: array<double>"
    )
    with pytest.raises(ValueError, match="n_components"):
        power_iteration_components(df, n_components=0)


def test_householder_skips_aligned_component(spark):
    """A component already on its target axis must contribute NO
    reflection (s ~ 0) — the rotation degenerates to identity."""
    comps = [[1.0] + [0.0] * 15]
    assert opq_householders(comps, m=4) == []


def test_drift_angle_small_same_dist_large_planted(spark):
    """The drift monitor's contract: top components of two SAME-
    distribution halves align (strong eigengap -> tiny angle); planting
    a different dominant direction in one half opens the angle wide."""
    rng = np.random.default_rng(3)
    X, a, b = _anisotropic(rng, n=600)

    def top(df_rows):
        df = spark.createDataFrame(
            [(i, [float(x) for x in r]) for i, r in df_rows],
            "vec_id: long, embedding: array<double>",
        )
        return np.array(
            power_iteration_components(df, n_components=1, n_iter=6)[0]
        )

    same_a = top([(i, X[i]) for i in range(0, 600, 2)])
    same_b = top([(i, X[i]) for i in range(1, 600, 2)])
    assert abs(float(same_a @ same_b)) > 0.999

    # planted drift: the second half's dominant direction is b, not a
    Xd = (
        (rng.normal(size=(300, 1)) * 10.0) @ b[None, :]
        + rng.normal(size=(300, 16)) * 0.3
    )
    drift_b = top([(i, Xd[i]) for i in range(300)])
    assert abs(float(same_a @ drift_b)) < 0.2


def test_opq_residual_composition_in_family(spark, sf_dir):
    """The composed OPQ->residual-IVFADC entry must behave like its
    unrotated sibling on the fixture: full k rows per query, and recall
    vs exact L2 within a small delta of the raw pinned residual arm
    (rotation preserves L2, so the composition cannot systematically
    lose recall; both run the pinned DETERMINISM dials whose absolute
    recall is the declared trade — the quality dials are recall-tested
    in test_pq_residual.py)."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.queries.catalog import queries
    from spotify_etl_pipeline_spark.schemas import load_fixture

    emb = load_fixture(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_l2_topk(emb, q, k=5).collect()
    }

    def recall(name):
        rows = queries()[name](spark, sf_dir).collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        return len(got & truth) / len(truth)

    raw = recall("knn_ivfadc_residual_topk")
    composed = recall("knn_opq_ivfadc_residual_topk")
    assert composed >= raw - 0.1, (composed, raw)


def test_spectrum_stream_matches_batch_including_replay(spark, tmp_path):
    """Streaming spectrum maintenance (r8): per-epoch components
    written by the stream must equal components computed directly on
    each epoch's rows (bit-exact — the power iteration is batch-
    content-deterministic), the drift report must show ~0 angle between
    same-distribution epochs and a wide angle to a planted-drift epoch,
    and replaying an epoch must leave the report unchanged."""
    from spotify_etl_pipeline_spark.streaming.drift_stream import (
        drift_report,
        run_spectrum_stream,
    )

    rng = np.random.default_rng(5)
    X, a, b = _anisotropic(rng, n=400)
    Xd = (
        (rng.normal(size=(200, 1)) * 10.0) @ b[None, :]
        + rng.normal(size=(200, 16)) * 0.3
    )  # planted drift: dominant direction flips to b

    def rows(arr, base):
        return [
            (base + i, 0, [float(x) for x in v]) for i, v in enumerate(arr)
        ]

    src = str(tmp_path / "src")
    schema = "vec_id: long, label: int, embedding: array<float>"
    # three single-file epochs: two same-distribution halves + drift
    for part in (rows(X[:200], 0), rows(X[200:], 200), rows(Xd, 400)):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out = str(tmp_path / "spec")
    run_spectrum_stream(
        spark, src, out, str(tmp_path / "ckpt"), n_iter=6,
        max_files_per_trigger=1,
    )

    # stream == batch, bit-exact per epoch
    got0 = {
        r["dim"]: r["comp_micro"]
        for r in spark.read.parquet(f"{out}/epoch=0").collect()
    }
    direct = power_iteration_components(
        spark.createDataFrame(rows(X[:200], 0), schema),
        n_components=1,
        n_iter=6,
    )[0]
    want0 = {j: math.floor(c * 1_000_000 + 0.5) for j, c in enumerate(direct)}
    assert got0 == want0

    rep = drift_report(spark, out)
    assert [r["epoch_a"] for r in rep] == [0, 1]
    assert rep[0]["angle_centideg"] < 300  # same distribution: < 3 deg
    assert rep[1]["angle_centideg"] > 4000  # planted drift: > 40 deg

    # replay epoch 1 with identical content -> report unchanged
    ep_rows = spark.read.parquet(f"{out}/epoch=1").collect()
    spark.createDataFrame(
        ep_rows, "dim: bigint, comp_micro: bigint"
    ).write.mode("overwrite").parquet(f"{out}/epoch=1")
    spark.catalog.refreshByPath(out)
    assert drift_report(spark, out) == rep


def test_drift_triggered_reindex_recovers_recall(spark, tmp_path):
    """The documented DRIFT->REINDEX recipe, end to end: the streaming
    spectrum monitor (run_spectrum_stream/drift_report) watches epoch
    components; a same-distribution epoch stays under the refit
    threshold (no reindex — rotation/books are expensive artifacts),
    while a planted-drift epoch (fresh dominant directions c, d
    orthogonal to the build's a, b) trips it; encoding the drifted
    corpus through the FROZEN rotation+books degrades ADC recall, and
    refitting rotation+books on the drifted data recovers it."""
    from spotify_etl_pipeline_spark.streaming.drift_stream import (
        drift_report,
        run_spectrum_stream,
    )

    rng = np.random.default_rng(17)
    d = D
    a = np.ones(d) / math.sqrt(d)
    b = np.array([1.0 if i % 2 == 0 else -1.0 for i in range(d)]) / math.sqrt(d)
    c = np.array([1.0 if i % 4 < 2 else -1.0 for i in range(d)]) / math.sqrt(d)
    e = np.array(
        [1.0 if i % 4 in (0, 3) else -1.0 for i in range(d)]
    ) / math.sqrt(d)

    def tile(n, u, v):
        return (
            (rng.normal(size=(n, 1)) * 10.0) @ u[None, :]
            + (rng.normal(size=(n, 1)) * 4.0) @ v[None, :]
            + rng.normal(size=(n, d)) * 0.3
        )

    X0, X1, X2 = tile(400, a, b), tile(200, a, b), tile(200, c, e)

    # --- the monitor half: stream the three epochs, read drift angles
    def rows(arr, base):
        return [(base + i, 0, [float(x) for x in v]) for i, v in enumerate(arr)]

    src = str(tmp_path / "src")
    schema = "vec_id: long, label: int, embedding: array<float>"
    for part in (rows(X0, 0), rows(X1, 1000), rows(X2, 2000)):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out = str(tmp_path / "spec")
    run_spectrum_stream(
        spark, src, out, str(tmp_path / "ckpt"), n_iter=6,
        max_files_per_trigger=1,
    )
    report = drift_report(spark, out)
    REFIT_CENTIDEG = 2000  # 20 degrees — the recipe's refit threshold
    assert len(report) == 2
    assert report[0]["angle_centideg"] < 500  # same distribution: no refit
    assert report[1]["angle_centideg"] > REFIT_CENTIDEG  # drift: refit
    triggered = [r for r in report if r["angle_centideg"] > REFIT_CENTIDEG]
    assert [r["epoch_b"] for r in triggered] == [2]

    # --- the reindex half: frozen artifacts degrade, refit recovers
    base_df = _df(spark, X0).localCheckpoint(eager=True)
    drift_df = _df(spark, X2).localCheckpoint(eager=True)
    queries = drift_df.filter(f"vec_id < {N_Q}")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_l2_topk(drift_df, queries, k=10).collect()
    }

    def adc_recall(fit_df):
        comps = power_iteration_components(fit_df, n_components=2, n_iter=6)
        H = opq_householders(comps, m=4)
        rot_fit = opq_rotate(fit_df, H).localCheckpoint(eager=True)
        books = pq_fit(rot_fit, m=4, k=16, max_iter=4)
        corpus = opq_rotate(drift_df, H).localCheckpoint(eager=True)
        q = corpus.filter(f"vec_id < {N_Q}")
        codes = pq_encode(corpus, books)
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in pq_adc_topk(codes, q, books, k=10).collect()
        }
        return len(got & truth) / len(truth)

    frozen = adc_recall(base_df)   # rotation+books from the OLD build
    refit = adc_recall(drift_df)   # rotation+books refit on drifted data
    assert refit > frozen, (refit, frozen)
    assert refit - frozen >= 0.1  # a real recovery, not tie-noise


def test_materialize_raises_on_cte_drift():
    """The r9 ADVICE fix: _materialize must raise when a named CTE
    produces zero substitutions (a silent no-op would drop AS
    MATERIALIZED and reintroduce the geometric re-evaluation), and
    still rewrite every listed CTE when the spellings match."""
    from spotify_etl_pipeline_spark.queries.catalog import _load_all

    _load_all()  # opq_ops resolves shared oracle fragments via the catalog
    from spotify_etl_pipeline_spark.queries.opq_ops import _materialize

    sql = "WITH a AS (SELECT 1), b AS (SELECT 2) SELECT * FROM a, b"
    out = _materialize(sql, ("a", "b"))
    assert out.count("AS MATERIALIZED (") == 2
    with pytest.raises(ValueError, match="drift"):
        _materialize(sql, ("missing_cte",))

"""operators/pq.py::pq_ivfadc_residual_topk — residual encoding must
actually buy what Jégou et al. 2011 §IV.A claim: lower quantization
error at the same code budget, and no-worse recall through the probed
pipeline; plus the determinism contract of the pinned driver entry."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.pq import (
    brute_force_l2_topk,
    pq_encode,
    pq_fit,
    pq_ivfadc_residual_topk,
    pq_ivfadc_topk,
)


def _clustered_vectors(spark, n_per=60, n_clusters=5, dim=8):
    """Deterministic well-separated clusters: center c sits at 10*c on
    every axis; members offset by a small per-member wiggle. Residual
    variance (the wiggle) is far below raw variance (the centers), the
    regime where residual PQ must win."""
    rows = []
    vid = 0
    for c in range(n_clusters):
        for i in range(n_per):
            base = float(10 * c)
            vec = [base + ((vid * 7 + j * 3 + i) % 5) / 10.0 for j in range(dim)]
            rows.append((vid, vec))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _with_cells(df, n_per=60):
    """Attach the ground-truth coarse cell (vec_id div n_per) — an IVFPQ
    index is agnostic to HOW the coarse partition was learned; using the
    construction's own cells keeps the differential deterministic."""
    return df.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
        (F.col("vec_id") / n_per).cast("int").alias("cluster"),
    )


def _reconstruction_err(df, codes_df, books, cents_by_cluster=None):
    """Sum ||x - decode(code(x))||^2 over the corpus, decoded python-side
    (collect is fine: this is a test fixture, not the operator)."""
    vecs = {
        r["vec_id"]: (list(r["embedding"]), r["cluster"])
        for r in (
            df.select("vec_id", "embedding", "cluster")
            if "cluster" in df.columns
            else df.select("vec_id", "embedding", F.lit(None).alias("cluster"))
        ).collect()
    }
    m = len(books)
    sub_d = len(books[0][0])
    err = 0.0
    for r in codes_df.collect():
        v, cl = vecs[r["vec_id"]]
        recon = []
        for s in range(m):
            recon.extend(books[s][r["pq_codes"][s]])
        if cents_by_cluster is not None:
            cl = r["cluster"]
            recon = [a + b for a, b in zip(recon, cents_by_cluster[cl])]
        err += sum((a - b) ** 2 for a, b in zip(v, recon))
    return err


def test_residual_reconstruction_error_beats_raw(spark):
    docs = _with_cells(_clustered_vectors(spark))
    # raw-vector PQ at m=2, k=4 codewords (tight budget: 16 cells total)
    raw_books = pq_fit(docs, m=2, k=4)
    raw_codes = pq_encode(docs, raw_books)
    raw_err = _reconstruction_err(docs, raw_codes, raw_books)
    # residual PQ at the SAME budget
    cents = {
        r["cluster"]: list(r["cv"])
        for r in _cluster_cv(docs).collect()
    }
    resid = docs.select(
        "vec_id",
        "cluster",
        F.expr(
            "zip_with(embedding, "
            + _cents_case_expr(cents)
            + ", (a, b) -> a - b)"
        ).alias("embedding"),
    )
    res_books = pq_fit(resid, m=2, k=4)
    res_codes = pq_encode(resid, res_books, keep_cols=("cluster",))
    res_err = _reconstruction_err(docs, res_codes, res_books, cents)
    assert res_err < raw_err * 0.5  # decisively, not marginally


def _cluster_cv(docs):
    from spotify_etl_pipeline_spark.operators.pq import (
        cluster_reference_vectors,
    )

    return cluster_reference_vectors(docs, "cluster", mode="mean")


def _cents_case_expr(cents: dict) -> str:
    arms = " ".join(
        f"WHEN cluster = {c} THEN array({', '.join(f'{x}D' for x in v)})"
        for c, v in sorted(cents.items())
    )
    return f"CASE {arms} END"


def test_residual_recall_no_worse_than_raw(spark):
    docs = _with_cells(_clustered_vectors(spark))
    queries = docs.filter(F.col("vec_id") % 60 == 7).select(
        "vec_id", "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_l2_topk(docs, queries, k=5).collect()
    }
    raw_books = pq_fit(docs, m=2, k=4)
    raw_codes = pq_encode(docs, raw_books, keep_cols=("cluster",))
    raw = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_ivfadc_topk(
            docs, raw_codes, queries, raw_books,
            k=5, shortlist=25, n_probe=2, cluster_col="cluster",
        ).collect()
    }
    res = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_ivfadc_residual_topk(
            docs, queries, m=2, k_codes=4, k=5, shortlist=25, n_probe=2,
            cluster_col="cluster", coarse_mode="mean", books_max_iter=4,
            int_units=False,
        ).collect()
    }
    raw_recall = len(exact & raw) / len(exact)
    res_recall = len(exact & res) / len(exact)
    assert res_recall >= raw_recall
    assert res_recall >= 0.5  # separated clusters + 2/5 probes


def test_pinned_residual_pipeline_is_deterministic(spark, sf_dir):
    from spotify_etl_pipeline_spark.schemas import load_fixture

    emb = load_fixture(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding")

    def run():
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], r["d2_micro"])
            for r in pq_ivfadc_residual_topk(
                emb, queries, m=4, k_codes=16, k=5, shortlist=50,
                n_probe=3, coarse_mode="pinned", books_max_iter=0,
                int_units=True,
            ).collect()
        )

    a, b = run(), run()
    assert a == b and len(a) == 25

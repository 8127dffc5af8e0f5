"""Similarity-search queries over ``embeddings`` (SURVEY.md X3).

Brute-force top-k is exact and oracle-checked; the IVF variant is
approximate by construction (rows-only check here, recall floor asserted in
tests/test_similarity.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..schemas import load_fixture
from .catalog import register

K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_fixture(spark, sf_dir, "embeddings")


@register(
    "knn_brute_force",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM e
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]))
               / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, ROUND(cos, 4) AS cosine
    FROM ranked WHERE rank <= {K}
    """,
    survey="X3",
    doc="Exact top-5 cosine neighbors for 10 query vectors — the ANN "
    "baseline/verifier.",
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    return S.brute_force_topk(emb, queries, k=K)


@register(
    "knn_ivf",
    oracle=None,  # approximate (n_probe < n_clusters) → rows-only check;
    # recall vs brute force asserted in tests/test_similarity.py.
    survey="X3",
    doc="IVF ANN: centroid routing (n_probe=3 of 10 clusters) then exact "
    "scoring within probed clusters — the 100 TB scale path (cuts pairwise "
    "work ~3.3×; at real scale the centroid step is a k-means job of the "
    "same DataFrame shape).",
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    return S.ivf_topk(emb, queries, k=K, n_probe=3)

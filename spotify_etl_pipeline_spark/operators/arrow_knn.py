"""Arrow-batched exact k-NN kernel (SURVEY.md X3 — the throughput twin of
``similarity.brute_force_topk``).

The JVM brute-force path evaluates each pairwise cosine with
``zip_with``/``aggregate`` higher-order functions — exact, oracle-checkable,
but interpreted per element (no whole-stage codegen inside HOF lambdas):
measured 45.8 s for 200 K × 10 queries at the sf10 tile. The same math as a
numpy matmul over Arrow batches is memory-bandwidth-bound — the measured gap
is the whole point of this module. This is the sanctioned use of the Python
path: a dense numeric kernel the built-in expression language can only
express element-at-a-time, fed through ``mapInPandas`` so Arrow moves
columnar batches, never rows.

Plan shape (scale-correct):

- queries are collected to the driver and closed over as one numpy matrix —
  the SAME bounded-|Q| contract as the broadcast LUT joins in the PQ tier
  (``max_queries`` guards it; chunk the query batch past that, each chunk is
  this same plan);
- the corpus streams through ``mapInPandas`` partition-local: each Arrow
  batch emits its LOCAL top-(k+1) rows per query (lexsort on
  (-cos, neighbor_id), so boundary ties cut exactly the way the final rank
  orders — tile-duplicated corpora make equal-cosine ties common, an
  argpartition would keep arbitrary ids). Output is ≤ |Q|·(k+1) rows per
  batch, independent of batch size — the map stage is a reducer, not a
  fan-out;
- one thin global window over the |partitions|·|Q|·(k+1) survivors picks the
  final top-k. Total shuffle is candidate rows only; the |Q|·n score matrix
  never leaves the executors' L2 caches.

Determinism: float64 matmul sums in a different order than the JVM's
sequential fold, so cosines can differ in the last ulp; ranks are stable
wherever the cosine gap exceeds ~1e-15 (the ``knn_brute_force_arrow_agree``
gate hash-checks set agreement with the JVM path instead of claiming
bit-equality).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_CAND_SCHEMA = "query_id long, neighbor_id long, cos double"


def brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded),
    numerically the same ranking as ``similarity.brute_force_topk`` up to
    float-summation order. Output: (query_id, neighbor_id, rank, cosine).
    """
    import numpy as np

    qrows = queries.select(id_col, vec_col).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"{len(qrows)} query vectors exceed max_queries={max_queries}; "
            "chunk the query batch (each chunk repeats this same plan)"
        )
    if not qrows:
        raise ValueError("empty query set")
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    Q = np.array([[float(x) for x in r[vec_col]] for r in qrows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    keep_q = qn > 0  # zero-norm query ⇒ cosine undefined ⇒ no results
    qids, Q, qn = qids[keep_q], Q[keep_q], qn[keep_q]
    if qids.size == 0:
        raise ValueError("every query vector has zero norm — cosine undefined")
    Qhat = Q / qn[:, None]
    kk = k + 1  # +1: a batch slot may be lost to the self-match

    def local_topk(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            C = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
                dtype=np.float64,
            )
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cn = np.sqrt((C * C).sum(axis=1))
            ok = cn > 0
            C, ids, cn = C[ok], ids[ok], cn[ok]
            if ids.size == 0:
                continue
            S = (C / cn[:, None]) @ Qhat.T  # |batch| × |Q| cosine matrix
            m = min(kk, ids.size)
            out_q, out_n, out_c = [], [], []
            for j in range(qids.size):
                # exact composite order (-cos, id): lexsort's LAST key is
                # primary, so ties at the cut keep the smallest ids — the
                # same rows the global window will rank first
                order = np.lexsort((ids, -S[:, j]))[:m]
                out_q.append(np.full(m, qids[j], dtype=np.int64))
                out_n.append(ids[order])
                out_c.append(S[order, j])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cos": np.concatenate(out_c),
                }
            )

    cand = corpus.select(id_col, vec_col).mapInPandas(local_topk, _CAND_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cosine")
        )
    )

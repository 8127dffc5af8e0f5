"""Recall@10 vs n_probe for the append-maintained IVFADC index on an
engineered CLUSTERED-ANISOTROPIC tile — the SCALE.md evidence behind the
`knn_incremental_multiprobe_recall` catalog gate (VERDICT r9 #7).

The driver fixture's labels are random (geometry-free), so its recall
curve is pinned to the searched fraction; this tile has real cluster
structure (Gaussian cells whose centers live mostly in a 2-factor
anisotropic subspace — the same worst-case family as the OPQ tile in
tests/test_opq.py) so widening n_probe buys recall the way it does on
production embeddings.  The index is the INCREMENTAL build: 80% base
freezes init-only books + pinned representatives, 20% appended via
pq_encode_append, serving routes against base representatives over the
union — multi-probe is purely a serve-time dial on that frozen store.

Usage: python tools/bench_multiprobe.py [n_vectors] (default 50000)
Prints one JSON line: {"n": ..., "curve": {"1": {"recall": r, "sec": s},
...}}.
"""
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
D, C, NQ, K, SHORTLIST = 32, 64, 50, 10, 200
M_SUB, K_CODES = 8, 32

spark = (
    SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
    )
    .appName("bench-multiprobe")
    .config("spark.sql.shuffle.partitions", "16")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from spotify_etl_pipeline_spark.operators.pq import (  # noqa: E402
    brute_force_l2_topk,
    pq_encode,
    pq_encode_append,
    pq_fit,
    pq_ivfadc_topk,
)

rng = np.random.default_rng(10)
a = np.ones(D) / math.sqrt(D)
b = np.array([1.0 if i % 2 == 0 else -1.0 for i in range(D)]) / math.sqrt(D)
# continuous anisotropic cloud (2 dominant factors + noise), partitioned
# into C Voronoi cells of sampled centers — boundary points have true
# neighbors in ADJACENT cells, which is exactly the regime multi-probe
# exists for (a tight per-cell Gaussian tile saturates at n_probe=1)
X = (
    rng.normal(size=(N, 1)) * 10.0 @ a[None, :]
    + rng.normal(size=(N, 1)) * 4.0 @ b[None, :]
    + rng.normal(size=(N, D)) * 0.5
)
centers = X[rng.choice(N, size=C, replace=False)]
# nearest-center assignment, chunked so the (chunk x C) distance matrix
# stays small
labels = np.concatenate([
    np.argmin(
        ((X[i : i + 4096, None, :] - centers[None, :, :]) ** 2).sum(axis=2),
        axis=1,
    )
    for i in range(0, N, 4096)
])

emb = spark.createDataFrame(
    [
        (i, int(labels[i]), [float(x) for x in X[i]])
        for i in range(N)
    ],
    "vec_id: long, label: long, embedding: array<double>",
).repartition(16).cache()
emb.count()

base = emb.filter(F.col("vec_id") % 5 != 4)
delta = emb.filter(F.col("vec_id") % 5 == 4)
queries = emb.filter(F.col("vec_id") < NQ).select("vec_id", "embedding")

# quality arms (this is recall evidence, not an oracle): Lloyd-fitted
# books and float mean-centroid routing; the frozen-index maintenance
# shape is unchanged — books and routing reps still come from base only
books = pq_fit(base, m=M_SUB, k=K_CODES, max_iter=3)
codes = (
    pq_encode(base, books, keep_cols=("label",))
    .unionByName(
        pq_encode_append(delta, base, books, assign_mode="mean")
    )
    .cache()
)
codes.count()

exact = {
    (r["query_id"], r["neighbor_id"])
    for r in brute_force_l2_topk(emb, queries, k=K).collect()
}
nbr_cell = {int(i): int(l) for i, l in zip(range(N), labels)}

from spotify_etl_pipeline_spark.operators.similarity import (  # noqa: E402
    ivf_probe_routing,
)

curve = {}
for n_probe in (1, 2, 4, 8):
    # coverage = fraction of true top-10 pairs whose neighbor's cell is
    # probed — the ceiling the n_probe dial controls (recall below it is
    # the codebook's shortlist error, not routing's)
    probed = {}
    for r in ivf_probe_routing(
        base, queries, n_probe=n_probe, mode="mean"
    ).collect():
        probed.setdefault(r["query_id"], set()).add(r["cluster"])
    cov = sum(
        1 for q, nb in exact if nbr_cell[nb] in probed.get(q, set())
    ) / len(exact)
    t0 = time.time()
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_ivfadc_topk(
            emb, codes, queries, books, k=K, shortlist=SHORTLIST,
            n_probe=n_probe, probe_mode="mean", route_corpus=base,
        ).collect()
    }
    sec = time.time() - t0
    curve[str(n_probe)] = {
        "recall": round(len(exact & got) / len(exact), 4),
        "coverage": round(cov, 4),
        "sec": round(sec, 2),
    }

print(json.dumps({
    "n": N, "d": D, "clusters": C, "m": M_SUB, "k_codes": K_CODES,
    "shortlist": SHORTLIST, "curve": curve,
}))
spark.stop()

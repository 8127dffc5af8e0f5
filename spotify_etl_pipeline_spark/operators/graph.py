"""Iterative graph operators expressed as DataFrame fixpoint loops.

Public algorithm per Page, Brin, Motwani, Winograd, "The PageRank
Citation Ranking" (Stanford tech report, 1999), weighted variant.

The reference has no graph engine; connected components (operators/
components.py) arrived with the dedup tier because near-dup resolution IS
a graph problem. PageRank completes the family: corpus-curation pipelines
use link-graph centrality as a document-quality prior (the CommonCrawl /
OPIC lineage), and entity-resolution pipelines use it to pick cluster
canon. Same execution shape as components: a driver-side loop over a
FIXED, small iteration count where each iteration is pure DataFrame
algebra — one join + one aggregation — so every pass is a single shuffle
keyed by vertex id and Catalyst/AQE plan each stage independently.

Scale notes (100 TB / 10^10-edge regime):

- Each iteration shuffles the edge list once on ``src`` (join against
  current ranks) and once on ``dst`` (contribution sum). Both are
  hash-partitioned equi-shuffles — no all-pairs, no driver data.
- The rank vector is |V| rows (thin: id + double). The edge list never
  changes, so both operators persist it (and the other loop-invariant
  tables) for the duration of the computation — and UNPERSIST everything
  before returning: the result is materialized once via an eager
  ``localCheckpoint`` (the :mod:`.components` convention), so the caller
  gets a lineage-free distributed DataFrame and the session's cache
  returns to its pre-call state. Without that release every invocation
  leaked its cached partitions for the session lifetime — invisible in a
  single bench run, compounding across a 163-query sweep.
- The eager checkpoint also cuts plan depth (otherwise linear-to-
  exponential in ``iterations``). The curation use-case (quality prior)
  converges usefully in 3-5 passes.
- Dangling mass (vertices with no out-edges) is redistributed uniformly —
  the standard correction; skipping it leaks rank mass and the vector no
  longer sums to 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Weighted PageRank over a directed edge list.

    ``edges`` holds one row per directed edge; ``weight`` (optional) is an
    edge-weight column — contributions are proportional to the edge's
    share of its source's total out-weight. Returns ``[node, rank]`` with
    ranks summing to 1 (damping + uniform dangling redistribution).

    Deterministic: no sampling, no rand(); the only float-order
    sensitivity is the per-vertex contribution sum (bounded by in-degree),
    so results are stable to ~1e-12 across partitionings.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")

    w = F.col(weight) if weight else F.lit(1.0)
    # The edge list, vertex set, and out-weight table are reused by every
    # iteration; without persist each pass re-expands whatever join tree
    # produced `edges` (linear-in-iterations plan copies of the most
    # expensive subtree). MEMORY_AND_DISK default: at 10^10 edges these
    # spill instead of recomputing.
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        w.cast("double").alias("w"),
    ).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # |V| is a sizing constant for the teleport term — a scalar aggregate,
    # not a driver-side loop over data (this also materializes e + nodes)
    n = nodes.count()
    out_w = e.groupBy("src").agg(F.sum("w").alias("ow")).persist()

    handles = [e, nodes, out_w]
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    teleport = F.lit((1.0 - damping) / n)
    for _ in range(iterations):
        # Each iteration references ranks twice (contribution join + dangling
        # anti-join): without a lineage cut the plan tree doubles per pass
        # (2^iterations copies of every upstream subtree). persist() makes
        # the second reference a cache read; the cached vectors are |V| thin
        # rows per pass, all released after the final materialization below.
        ranks = ranks.persist()
        handles.append(ranks)
        contrib = (
            ranks.join(e, ranks["node"] == e["src"], "inner")
            .join(out_w, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w") / F.col("ow")).alias("contrib"))
        )
        # rank mass sitting on vertices with no out-edges, spread uniformly
        dangling = ranks.join(
            out_w, ranks["node"] == out_w["src"], "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    teleport
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
        )
    # One action computes the whole loop (every persisted pass fills and is
    # reused within it), then the cache is RELEASED: the eager local
    # checkpoint leaves a lineage-free |V|-row distributed result that the
    # ContextCleaner frees when the caller drops it, and unpersisting the
    # loop intermediates returns the session cache to its pre-call state
    # instead of leaking per invocation.
    out = ranks.localCheckpoint(eager=True)
    for h in handles:
        h.unpersist()
    return out


def label_propagation(
    edges: DataFrame,
    *,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Synchronous weighted label propagation (Raghavan et al. 2007,
    deterministic variant): every node starts labeled with its own id;
    each round it adopts the label carrying the largest total incident
    edge weight among its neighbors, ties toward the SMALLER label.
    Classic LPA breaks ties randomly; pinning ties (and running
    synchronously for a fixed round count) makes the result exactly
    reproducible — the property every oracle-checked query here relies
    on, and the variant curation pipelines want anyway (re-runs must not
    re-shuffle community assignments).

    Community detection complements PageRank in the curation stack:
    centrality ranks documents/domains, communities GROUP them (domain
    clustering, topic sharding, per-community mixture caps).

    Execution shape matches :func:`pagerank`: a driver loop over a fixed
    round count, each round one equi-join (labels onto the edge list) +
    one keyed aggregation (per-(node, label) weight) + one per-node argmax
    window — all shuffles keyed by node id, no driver data. The edge list
    is symmetrized once up front (undirected semantics), which also makes
    every node a neighbor-bearing ``a``-side key — the per-round argmax is
    total over the node set, no isolated-node branch exists. A node with
    NO edges cannot be represented in an edges-only input and is absent
    from the output; callers needing self-labels for edgeless nodes union
    them in afterwards.

    Returns ``[node, label]`` for every node appearing in ``edges``.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    w = (
        F.col(weight).cast("double")
        if weight is not None
        else F.lit(1.0)
    )
    directed = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w")
    )
    und = directed.unionAll(
        directed.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    )
    # collapse parallel edges from symmetrization so each (a, b) carries
    # one summed weight — keeps the per-round join fan-out minimal
    eu = und.groupBy("a", "b").agg(F.sum("w").alias("w"))
    eu = eu.persist()
    handles = [eu]
    nodes = eu.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("lbl"))
    rank_w = Window.partitionBy("node").orderBy(F.desc("score"), F.asc("lbl"))
    for _ in range(iterations):
        # lineage cut per round (pagerank convention): labels is referenced
        # once per round so growth is linear, not exponential, but at high
        # iteration counts the uncut plan still deepens per pass and a task
        # retry would recompute the whole chain; the cached vector is |V|
        # thin rows, released after the final materialization below
        labels = labels.persist()
        handles.append(labels)
        scores = (
            eu.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"), "lbl")
            .agg(F.sum("w").alias("score"))
        )
        # total over the node set: symmetrization puts every node on the
        # a-side of eu, so the argmax emits one row per node — no
        # keep-previous branch is reachable
        labels = (
            scores.withColumn("_rn", F.row_number().over(rank_w))
            .filter(F.col("_rn") == 1)
            .select("node", "lbl")
        )
    # same cache-hygiene contract as pagerank: materialize once, release all
    out = labels.select("node", F.col("lbl").alias("label")).localCheckpoint(
        eager=True
    )
    for h in handles:
        h.unpersist()
    return out

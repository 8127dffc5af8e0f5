"""Connected components + duplicate-cluster resolution (SURVEY.md X1/X2).

Candidate-pair generators (:mod:`.dedup`) tell you WHICH documents look
alike; an actual dedup pass must then group pairs into clusters and pick
one survivor per cluster. Components are computed with iterative min-label
propagation:

    comp(n) ← min(comp(n), min over neighbors m of comp(m))

repeated to fixpoint. Each round is two shuffles (message groupBy + join);
rounds needed = graph diameter, and near-dup graphs are shallow (stars and
small cliques — a handful of rounds). Every round ``localCheckpoint``s the
frontier so the Catalyst lineage does not grow with the iteration count
(the classic iterative-algorithm failure mode on Spark at scale). For
adversarially deep graphs swap the propagation body for the
large-star/small-star contraction of Kiveris et al. (MapReduce CC) — same
driver loop, same contract.

This is genuinely iterative, so there is no single-statement SQL
equivalent in Spark — but DuckDB's recursive CTE recomputes the same
fixpoint, which is what the oracle does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node
    id reachable. Undirected. Converges in O(diameter) rounds."""
    # Materialize the (narrow) edge projection ONCE before fanning out into
    # the two union branches: ``edges`` is typically the output of an
    # expensive candidate generator (the full shingle/LSH pipeline), and
    # every downstream branch that re-reads an unmaterialized plan re-runs
    # that whole pipeline.
    edges = edges.select(F.col(src), F.col(dst)).localCheckpoint()
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    both = both.distinct().localCheckpoint()
    comp = (
        both.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    changed = 1
    for _ in range(max_iter):
        # neighbor's current component, min-ed per node
        msgs = (
            both.join(comp, both.b == comp.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new = (
            comp.join(msgs, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_min", F.col("component")) < F.col("component")).alias(
                    "_changed"
                ),
            )
        ).localCheckpoint(eager=False)
        # ONE job per round (r13, guide §5): the full-scan count both
        # MATERIALIZES the lazily-marked local checkpoint (every
        # partition is computed, so lineage truncates exactly as the
        # eager form did) and returns the convergence signal — the
        # previous form paid an eager-checkpoint job PLUS a limit(1)
        # probe job per round.
        changed = new.filter(F.col("_changed")).count()
        comp = new.drop("_changed")
        if changed == 0:
            break
    if changed != 0:
        # a silently-unconverged labeling would merge/split clusters wrongly;
        # deep graphs need more rounds (or the large-star/small-star variant)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(graph diameter exceeds max_iter); raise max_iter"
        )
    return comp


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 30
) -> DataFrame:
    """(node, component) via alternating large-star/small-star contraction
    (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
    Components in MapReduce and Beyond", ACM SoCC 2014 — public
    algorithm). Same contract as :func:`connected_components`; converges
    in O(log² n) rounds *independent of graph diameter*, which is the
    variant to reach for when the duplicate graph is adversarially deep
    (long chains of pairwise near-dups — e.g. versioned documents) rather
    than the shallow stars/cliques near-dup candidates usually form.

    One round =

    - **large-star**: every node connects its strictly-larger neighbors
      to the minimum of its closed neighborhood;
    - **small-star** on the result (held canonical, larger→smaller):
      every node connects its smaller neighbors and itself to their
      minimum.

    Each half-round is a groupBy(min) + join over the edge set (plus a
    distinct and, per full round, one tiny count+bit_xor signature job) —
    roughly 2× the shuffle work of a propagation round, but the edge set
    *contracts* toward min-centered stars instead of carrying labels one
    hop per round, so total work is O(log² n) rounds × shrinking edges
    versus O(diameter) rounds × constant edges. Fixpoint = edge set
    unchanged; every round ``localCheckpoint``s so lineage stays flat.
    """
    # One materialization of the (narrow) edge projection before it fans
    # out into THREE consumers (both node-union branches + the canonical
    # edge set) — otherwise the candidate-generator pipeline feeding this
    # runs three times (see connected_components).
    edges = edges.select(F.col(src), F.col(dst)).localCheckpoint()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # canonical (x, y), x > y; self-loops contribute nodes only
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("x"),
            F.least(F.col(src), F.col(dst)).alias("y"),
        )
        .filter(F.col("x") != F.col("y"))
        .distinct()
        # lazy: the _sig(e) full scan right below materializes it
        .localCheckpoint(eager=False)
    )

    def _sig(df: DataFrame) -> tuple[int, int]:
        # bit_xor: order-insensitive over the (distinct) edge set and
        # cannot overflow under ANSI mode, unlike a hash SUM.  This agg
        # is a FULL scan, so calling it on a lazily-marked local
        # checkpoint materializes every partition in the same job that
        # computes the signature (the r13 one-job-per-round fusion).
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(x, y))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    sig = _sig(e)
    converged = sig[0] == 0
    for _ in range(max_iter):
        if converged:
            break
        # large-star over full neighbor lists
        both = e.select("x", "y").unionByName(
            e.select(F.col("y").alias("x"), F.col("x").alias("y"))
        )
        mins = both.groupBy("x").agg(F.min("y").alias("mn"))
        m = F.least(F.col("x"), F.col("mn"))
        large = (
            both.join(mins, "x")
            .filter(F.col("y") > F.col("x"))
            .select(F.col("y").alias("x"), m.alias("y"))
            .distinct()
        )
        # small-star on the canonical result (every y < x here)
        mins2 = large.groupBy("x").agg(F.min("y").alias("m2"))
        part1 = (
            large.join(mins2, "x")
            .filter(F.col("y") != F.col("m2"))
            .select(F.col("y").alias("x"), F.col("m2").alias("y"))
        )
        part2 = mins2.select("x", F.col("m2").alias("y"))
        # lazy checkpoint + the full-scan _sig agg = ONE job per round
        # (materialization and signature fused; r12 ran them separately)
        new_e = part1.unionByName(part2).distinct().localCheckpoint(eager=False)
        new_sig = _sig(new_e)
        # Signature equality is the cheap screen; confirm with an exact
        # set compare so a (count, bit_xor) collision between distinct
        # consecutive edge sets (~2^-64/round) can never declare a false
        # fixpoint. Both sides are distinct and the counts already match,
        # so an empty exceptAll proves set equality; the exact job runs
        # only on candidate-fixpoint rounds (typically once per call).
        converged = new_sig == sig and new_e.exceptAll(e).isEmpty()
        e, sig = new_e, new_sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds; raise max_iter"
        )
    # fixpoint edges are (member, center) stars; centers + isolated nodes
    # label themselves
    return (
        nodes.join(e, nodes.node == e.x, "left")
        .select("node", F.coalesce("y", F.col("node")).alias("component"))
    )


def resolve_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
    algo: str = "propagation",
) -> DataFrame:
    """Full-corpus dedup verdict: every row gets its duplicate-cluster id
    (min member id; singletons are their own cluster) and a survivor flag.

    ``algo``: ``"propagation"`` (min-label, O(diameter) rounds — right for
    the shallow star/clique graphs near-dup candidates form) or ``"star"``
    (large-star/small-star contraction, O(log² n) rounds — right when the
    duplicate graph can be adversarially deep). Identical output by
    construction; equivalence is regression-tested.

    Downstream keeps ``is_survivor`` rows — the canonical LLM-corpus dedup
    output shape.
    """
    algos = {
        "propagation": connected_components,
        "star": connected_components_star,
    }
    if algo not in algos:
        raise ValueError(
            f"unknown algo {algo!r}; expected one of {sorted(algos)}"
        )
    cc = algos[algo]
    comp = cc(pairs, src=pair_a, dst=pair_b)
    return (
        df.join(comp, df[id_col] == comp.node, "left")
        .select(
            df[id_col],
            F.coalesce("component", df[id_col]).alias("cluster_id"),
        )
        .withColumn("is_survivor", F.col(id_col) == F.col("cluster_id"))
    )

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
        ).localCheckpoint()
        changed = new.filter(F.col("_changed")).limit(1).count()
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


def resolve_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """Full-corpus dedup verdict: every row gets its duplicate-cluster id
    (min member id; singletons are their own cluster) and a survivor flag.

    Downstream keeps ``is_survivor`` rows — the canonical LLM-corpus dedup
    output shape.
    """
    comp = connected_components(pairs, src=pair_a, dst=pair_b)
    return (
        df.join(comp, df[id_col] == comp.node, "left")
        .select(
            df[id_col],
            F.coalesce("component", df[id_col]).alias("cluster_id"),
        )
        .withColumn("is_survivor", F.col(id_col) == F.col("cluster_id"))
    )

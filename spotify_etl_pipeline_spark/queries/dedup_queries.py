"""Dedup queries (SURVEY.md X1/X2) with DuckDB oracles.

Spark implementations in :mod:`..operators.dedup`. The MinHash/LSH oracles
rebuild the content-hashed shingle ids (md5-prefix bigint — bit-identical in
DuckDB) and the fixed hash family in SQL — the whole pipeline is
deterministic by construction, which is what makes an external oracle
possible at all without any global vocabulary sort on the Spark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..schemas import load_fixture
from .catalog import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_fixture(spark, sf_dir, "documents")


# Shared CTE: distinct (doc_id, shingle) for 3-gram shingles, DuckDB-side
# (single source of truth: oracle_sql_helpers.shingle_select_sql).
from .oracle_sql_helpers import shingle_select_sql

_SHINGLES_CTE = f"""
    sh AS ({shingle_select_sql(3, "documents")})
"""

_MINHASH_COLS = ", ".join(
    f"MIN(({a} * sid + {b}) % {D.MINHASH_P}) AS h{i}"
    for i, (a, b) in enumerate(zip(D.MINHASH_A, D.MINHASH_B))
)

_SIG_CTE = f"""
    {_SHINGLES_CTE},
    ids AS (
      SELECT doc_id,
             ('0x' || substring(md5(shingle), 1, 15))::BIGINT % {D.MINHASH_P} AS sid
      FROM sh
    ),
    sig AS (SELECT doc_id, {_MINHASH_COLS} FROM ids GROUP BY doc_id)
"""


@register(
    "dedup_exact_group",
    oracle="""
    SELECT lang, source, MIN(doc_id) AS survivor_id, COUNT(*) AS n_members
    FROM documents
    GROUP BY lang, source
    """,
    survey="X1,A5",
    doc="Exact dedup: deterministic survivor (min id) per key group.",
)
def dedup_exact_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    return (
        _docs(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(common * 1.0 / (ca.n_sh + cb.n_sh - common), 4) AS jaccard
    FROM inter
    JOIN cnt ca ON inter.doc_a = ca.doc_id
    JOIN cnt cb ON inter.doc_b = cb.doc_id
    WHERE common * 1.0 / (ca.n_sh + cb.n_sh - common) >= 0.8
    """,
    survey="X2",
    doc="3-gram Jaccard near-dup pairs (threshold 0.8). prefix_filter="
    "'auto' (the operator default) picks the candidate generator by "
    "corpus count — shingle-blocked self-join below 10⁴ docs (the "
    "driver's fixture scales), exact PPJoin prefix filtering above "
    "(measured 2.1× at the 50 K-doc sf1 tile) — both lossless, so one "
    "oracle covers either plan.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.8, prefix_filter="auto"
    )


@register(
    "dedup_minhash_signatures",
    oracle=f"WITH {_SIG_CTE} SELECT * FROM sig",
    survey="X2",
    doc="12-function MinHash signatures over content-hashed shingle ids — "
    "deterministic hash family shared with the oracle; no vocabulary pass, "
    "no global sort.",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_signatures(_docs(spark, sf_dir), n=3)


_BAND_SELECTS = " UNION ALL ".join(
    f"SELECT doc_id, {band} AS band, "
    + " || '_' || ".join(
        f"CAST(h{band * D.ROWS_PER_BAND + r} AS VARCHAR)"
        for r in range(D.ROWS_PER_BAND)
    )
    + " AS bucket FROM sig"
    for band in range(D.N_BANDS)
)


@register(
    "dedup_lsh_candidates",
    oracle=f"""
    WITH {_SIG_CTE},
    banded AS ({_BAND_SELECTS})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
    """,
    survey="X2",
    doc="MinHash-LSH banding (4 bands × 3 rows): candidate pairs via "
    "equi-join on (band, bucket) — no cross join anywhere.",
)
def dedup_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.lsh_candidate_pairs(_docs(spark, sf_dir), n=3)


_DUCK_TOKVAL = (
    "(length(t) * 31 + ascii(substring(t, 1, 1)) * 7 + ascii(substring(t, -1, 1)))"
)

_DUCK_BITSUMS = ", ".join(
    f"CAST(list_sum(list_transform(string_split(text, ' '), "
    f"t -> CASE WHEN (({_DUCK_TOKVAL} % 65536) >> {j}) & 1 = 1 "
    f"THEN 1 ELSE -1 END)) AS BIGINT)"
    for j in range(D.SIMHASH_BITS)
)
_DUCK_SIMHASH = " + ".join(
    f"(CASE WHEN sums[{j + 1}] > 0 THEN CAST({1 << j} AS BIGINT) "
    f"ELSE CAST(0 AS BIGINT) END)"
    for j in range(D.SIMHASH_BITS)
)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH s AS (SELECT doc_id, [{_DUCK_BITSUMS}] AS sums FROM documents)
    SELECT doc_id, {_DUCK_SIMHASH} AS simhash FROM s
    """,
    survey="X2",
    doc="16-bit SimHash signatures — per-document fold, zero shuffle.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(_docs(spark, sf_dir))


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, v,
             NULLIF(sqrt(list_sum(list_transform(v, x -> x * x))), 0) AS nrm
      FROM e
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
                 / (a.nrm * b.nrm), 4) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
          / (a.nrm * b.nrm) >= 0.45
    """,
    survey="X2,X3",
    doc="Embedding-cosine near-dup pairs (threshold 0.45), double-precision "
    "dot products via zip_with/aggregate.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_neardup_pairs(
        load_fixture(spark, sf_dir, "embeddings"), threshold=0.45
    )


_EDGE_SQL = f"""
    cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN cnt ca ON inter.doc_a = ca.doc_id
      JOIN cnt cb ON inter.doc_b = cb.doc_id
      WHERE common * 1.0 / (ca.n_sh + cb.n_sh - common) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    )
"""


_RESOLVE_ORACLE = f"""
    WITH RECURSIVE {_SHINGLES_CTE}, {_EDGE_SQL},
    reach(node, lbl) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS cluster_id,
           d.doc_id = COALESCE(c.component, d.doc_id) AS is_survivor
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    """


@register(
    "dedup_resolve_clusters",
    oracle=_RESOLVE_ORACLE,
    survey="X1,X2",
    doc="End-to-end dedup verdict: near-dup pairs (3-gram Jaccard ≥ 0.8) → "
    "connected components via iterative min-label propagation "
    "(operators/components.py) → cluster id + survivor flag for every "
    "document. Oracle recomputes the fixpoint with a recursive CTE.",
)
def dedup_resolve_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import resolve_duplicates

    docs = _docs(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    return resolve_duplicates(docs.select("doc_id"), pairs, id_col="doc_id")


@register(
    "dedup_resolve_clusters_logstar",
    oracle=_RESOLVE_ORACLE,
    survey="X1,X2,X15",
    doc="Same dedup verdict computed with large-star/small-star "
    "contraction (Kiveris et al., SoCC 2014) instead of min-label "
    "propagation: O(log² n) rounds independent of graph diameter — the "
    "variant for adversarially deep duplicate chains (e.g. versioned "
    "documents). Components are algorithm-independent, so the SAME "
    "recursive-CTE oracle hash-checks both; the driver row here is what "
    "verifies the contraction against an external fixpoint.",
)
def dedup_resolve_clusters_logstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import resolve_duplicates

    docs = _docs(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    return resolve_duplicates(
        docs.select("doc_id"), pairs, id_col="doc_id", algo="star"
    )


# --- capstone: quality-aware canonical selection -----------------------------
@register(
    "dedup_canonical_by_quality",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE}, {_EDGE_SQL},
    reach(node, lbl) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
    cl AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    ),
    dd AS (
      SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) >= 2
    ),
    bgq AS (
      SELECT doc_id,
             unnest([substring(t, CAST(x AS INTEGER), 2)
                     for x in range(1, length(t))]) AS bg
      FROM dd
    ),
    lmq AS (SELECT bg, COUNT(*) AS c FROM bgq GROUP BY bg),
    totq AS (SELECT CAST(SUM(c) AS DOUBLE) AS tc FROM lmq),
    score AS (
      SELECT b.doc_id, ROUND(AVG(LN(lmq.c / totq.tc)), 4) AS score
      FROM bgq b JOIN lmq ON b.bg = lmq.bg CROSS JOIN totq
      GROUP BY b.doc_id
    ),
    j AS (
      SELECT cl.doc_id, cl.cluster_id,
             COALESCE(s.score, -999999.0) AS score
      FROM cl LEFT JOIN score s ON cl.doc_id = s.doc_id
    )
    SELECT doc_id, cluster_id, score,
           ROW_NUMBER() OVER (PARTITION BY cluster_id
                              ORDER BY score DESC, doc_id) = 1 AS is_canonical
    FROM j
    """,
    survey="X1,X2,X4",
    doc="Round-3 capstone chaining the dedup and quality tiers: near-dup "
    "clusters (3-gram Jaccard >= 0.8 -> iterative min-label components) "
    "with the canonical document per cluster chosen by char-bigram LM "
    "score instead of min-id — the policy real curation uses (keep the "
    "best-written copy, not the lowest key). Scores are rounded BEFORE "
    "the argmax so the cross-engine ordering is decided at 4dp with a "
    "doc_id tiebreak, never by last-ulp float noise. The oracle "
    "recomputes blocking, the component fixpoint, the LM fit, and the "
    "argmax in one recursive-CTE statement.",
)
def dedup_canonical_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.components import resolve_duplicates

    docs = _docs(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    clusters = resolve_duplicates(
        docs.select("doc_id"), pairs, id_col="doc_id"
    ).select("doc_id", "cluster_id")

    dd = docs.filter(F.length("text") >= 2).select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    bg = dd.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("bg"),
    )
    lm = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    tot = lm.agg(F.sum("c").cast("double").alias("tc"))
    score = (
        bg.join(F.broadcast(lm), "bg")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.round(F.avg(F.log(F.col("c") / F.col("tc"))), 4).alias("score"))
    )
    j = clusters.join(score, "doc_id", "left").select(
        "doc_id",
        "cluster_id",
        F.coalesce("score", F.lit(-999999.0)).alias("score"),
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return j.select(
        "doc_id",
        "cluster_id",
        "score",
        (F.row_number().over(w) == 1).alias("is_canonical"),
    )


_SEMDEDUP_THR = 0.45

#: DuckDB twin of operators.dedup.semdedup_auto_centroids: C = max(2,
#: floor(sqrt(n))). Both sides floor an IEEE-double sqrt, so the derived
#: C is bit-identical — the dynamic dial stays fully hash-checkable.
_SEMDEDUP_AUTO_C_SQL = (
    "(SELECT GREATEST(2, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) FROM e)"
)


#: Shared semdedup CTE chain over a source exposing (vec_id, embedding) —
#: one definition so the plain query and the exact-collapse composition
#: cannot drift. The opening "e" CTE casts to double; callers prepend
#: their own source CTE and reference it here. ``c_expr`` is the centroid
#: count — a literal int or the auto-√n scalar subquery (DuckDB allows a
#: subquery in LIMIT).
def _semdedup_oracle(source: str, c_expr: str = _SEMDEDUP_AUTO_C_SQL) -> str:
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {source}
    ),
    cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {c_expr})
    ),
    d AS (
      SELECT e.vec_id, cents.cid,
             list_sum(list_transform(list_zip(e.v, cents.cv),
                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      FROM e CROSS JOIN cents
    ),
    asg AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2 ASC, cid ASC) AS rn
        FROM d) WHERE rn = 1
    ),
    n AS (
      SELECT e.vec_id, asg.cid, e.v,
             NULLIF(sqrt(list_sum(list_transform(e.v, x -> x * x))), 0) AS nrm
      FROM e JOIN asg USING (vec_id)
    ),
    pairs AS (
      SELECT a.cid AS cluster, a.vec_id AS kept_id, b.vec_id AS dropped_id,
             list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
               / (a.nrm * b.nrm) AS cos
      FROM n a JOIN n b ON a.cid = b.cid AND a.vec_id < b.vec_id
    )
    SELECT cluster, kept_id, dropped_id, ROUND(cos, 4) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY dropped_id
                                       ORDER BY kept_id ASC) AS rn
          FROM pairs WHERE cos >= {_SEMDEDUP_THR})
    WHERE rn = 1
    """


@register(
    "dedup_semdedup_clusters",
    oracle=_semdedup_oracle("embeddings"),
    survey="X2,X3,X19",
    doc="SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup — "
    "pairwise cosine is computed ONLY within a k-means cell, collapsing "
    "the O(n²) brute force to O(Σ n_c²); the cell count grows with the "
    "corpus (50k clusters on LAION in the paper), making this the "
    "embedding-dedup scale path. n_centroids='auto': C = max(2, "
    "floor(sqrt(n))) derived from the corpus count on BOTH engines "
    "(√n is the paper's grow-C-with-corpus dial), centroids pinned to "
    "the C lowest-id vectors (deterministic k-means init) so DuckDB "
    "rederives the identical partition; the assignment regime switches "
    "literal→broadcast-join at C=32, the pairwise stage shuffles once "
    "on the cluster equi-key.",
)
def dedup_semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.semdedup_dropped(
        load_fixture(spark, sf_dir, "embeddings"),
        n_centroids="auto",
        threshold=_SEMDEDUP_THR,
    )


@register(
    "dedup_semdedup_pipeline",
    oracle=_semdedup_oracle(
        "(SELECT MIN(vec_id) AS vec_id, embedding "
        "FROM embeddings GROUP BY embedding)"
    ),
    survey="X1,X2,X3",
    doc="The production semantic-dedup composition: EXACT dedup first "
    "(one keyed aggregate on the vector value, min-id representative), "
    "SemDeDup on the representatives only. Stage order is the measured "
    "scale lever — on the sf10 stress tile (every vector an exact-dup "
    "cluster of 100) this runs 8.1 s vs 345 s for semantic dedup "
    "against uncollapsed duplicates (SCALE.md); on organic data it is "
    "a cheap guarantee that the pairwise stage never re-discovers what "
    "a hash aggregate already knows. Same output contract as "
    "dedup_semdedup_clusters, computed over representatives.",
)
def dedup_semdedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_fixture(spark, sf_dir, "embeddings")
    reps = (
        emb.groupBy("embedding")
        .agg(F.min("vec_id").alias("vec_id"))
        .select("vec_id", "embedding")
    )
    return D.semdedup_dropped(
        reps, n_centroids="auto", threshold=_SEMDEDUP_THR
    )

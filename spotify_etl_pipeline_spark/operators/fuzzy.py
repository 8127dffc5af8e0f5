"""Blocked fuzzy string matching (edit-distance entity resolution).

The X2 near-dup tier covers document-scale similarity (MinHash/SimHash/
embedding); this operator covers the SHORT-STRING regime — names, ids,
labels — where the right metric is edit distance and the scale problem is
the same: never evaluate the O(n²) pairwise distance matrix.

Blocking is the FastSS / SymSpell deletion-neighborhood scheme (public
algorithm): two strings within edit distance 1 necessarily share a member
of their deletion neighborhoods (the string itself plus every
single-character deletion) — a substitution at position i makes both
i-deletions equal; an insertion/deletion makes one string a deletion
variant of the other. So candidates come from an equi-join on variant,
cost O(n·L) rows instead of O(n²) pairs, and an exact ``levenshtein``
verify keeps precision at 1. Both stages are deterministic string
arithmetic, so an external SQL oracle rederives the identical pair set —
the blocked query stays fully value-hash-checkable.

At corpus scale: the variant explosion is a narrow map (L+1 rows per
string, L = string length); the join shuffles on the variant hash, so only
strings sharing a variant ever meet — same bucket-bound shape as LSH
banding. For max_dist > 1 the scheme generalizes to deeper deletion
neighborhoods (L choose d variants); d=1 is the precision/recall-free
sweet spot and what entity-resolution passes actually use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .skew import widen_narrow_scan


def deletion_variants_expr(col: str) -> str:
    """SQL expression: array of the string itself plus every
    single-character-deletion variant (1-based positions; i=0 is the
    identity variant)."""
    return f"""
    transform(sequence(0, length({col})), i ->
      CASE WHEN i = 0 THEN {col}
           ELSE concat(substr({col}, 1, i - 1), substr({col}, i + 1)) END)
    """


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    max_variant_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, dist) for all pairs within edit
    distance ``max_dist`` (must be 1 — the deletion-1 neighborhood blocks
    exactly that radius), id_a < id_b, verified with exact levenshtein.

    ``max_variant_df`` drops variants shared by more than that many
    strings before the join — the fuzzy twin of the dedup stop-shingle
    cut (``ngram_jaccard_pairs.max_shingle_df``). A template-heavy corpus
    (millions of near-identical generated names) funnels its hot variants
    into quadratic buckets; the cap bounds every bucket at the price of
    losing pairs reachable ONLY through a hot variant. Off by default so
    the result (and its oracle) stays exact.
    """
    if max_dist != 1:
        raise ValueError(
            "deletion-1 blocking guarantees recall only for max_dist=1; "
            "deepen the neighborhood before raising the radius"
        )
    # variant explosion is the per-row-expensive map stage — widen a
    # 1-split scan so it does not serialize on one core
    base = widen_narrow_scan(df.select(id_col, text_col))
    variants = base.select(
        F.col(id_col).alias("vid"),
        F.col(text_col).alias("vname"),
        F.explode(F.expr(deletion_variants_expr(text_col))).alias("variant"),
    ).distinct()  # a string can yield the same variant twice (repeated chars)
    if max_variant_df is not None:
        keep = (
            variants.groupBy("variant")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_variant_df)
            .select("variant")
        )
        variants = variants.join(keep, "variant")
    a = variants.alias("a")
    b = variants.alias("b")
    cand = (
        a.join(b, (F.col("a.variant") == F.col("b.variant"))
               & (F.col("a.vid") < F.col("b.vid")))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.col("a.vname").alias("name_a"),
            F.col("b.vname").alias("name_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )


def deletion_variants_sql(col: str) -> str:
    """DuckDB twin of :func:`deletion_variants_expr` — identical variant
    set so the candidate join (and therefore the verified pair set) is
    engine-independent."""
    return f"""
    list_transform(range(0, length({col}) + 1), i ->
      CASE WHEN i = 0 THEN {col}
           ELSE substr({col}, 1, i - 1) || substr({col}, i + 1) END)
    """

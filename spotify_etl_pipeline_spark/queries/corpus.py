"""Capstone: the end-to-end corpus-curation pipeline, as ONE oracle-checked
query. This is the actual user story the extension operators exist for —
language filter → quality gate → near-dup dedup with cluster resolution →
content-hash dataset split — composed from the same operators the catalog
tests individually, and verified against a single DuckDB statement that
recomputes the whole chain (including the connected-components fixpoint via
recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators.components import resolve_duplicates
from ..operators.text import fingerprint_expr, quality_score
from ..schemas import load_fixture
from .catalog import register
from .oracle_sql_helpers import (
    CURATION_LANGS as _LANGS,
    CURATION_QUALITY_MIN as _QUALITY_MIN,
    SPLIT_SELECT_SQL,
    dedup_and_split_ctes,
    quality_sql,
)

_LANG_LIST = ", ".join(f"'{la}'" for la in _LANGS)
_QUALITY_SQL = quality_sql()


@register(
    "corpus_curation",
    oracle=f"""
    WITH RECURSIVE
    curated AS (
      SELECT doc_id, lang, text FROM documents
      WHERE lang IN ({_LANG_LIST}) AND {_QUALITY_SQL} >= {_QUALITY_MIN}
    ),
    {dedup_and_split_ctes("curated")}
    {SPLIT_SELECT_SQL}
    """,
    survey="X1,X2,X4",
    doc="End-to-end corpus curation: language filter → integer quality gate "
    "(≥6200 milli) → 3-gram-Jaccard near-dup clustering with min-id "
    "survivor resolution → content-fingerprint 80/10/10 split, reported as "
    "(split, lang) counts. One composed pipeline over the same operators "
    "the catalog checks individually; the oracle recomputes the whole "
    "chain in a single statement, connected-components fixpoint included.",
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    keep = (
        quality_score(docs)
        .filter(
            (F.col("quality_milli") >= _QUALITY_MIN) & F.col("lang").isin(*_LANGS)
        )
        .select("doc_id")
    )
    curated = docs.join(keep, "doc_id").select("doc_id", "lang", "text")
    pairs = D.ngram_jaccard_pairs(curated, n=3, threshold=0.8)
    survivors = (
        resolve_duplicates(curated.select("doc_id"), pairs, id_col="doc_id")
        .filter("is_survivor")
        .select("doc_id")
    )
    bucket = fingerprint_expr() % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        curated.join(survivors, "doc_id")
        .select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )

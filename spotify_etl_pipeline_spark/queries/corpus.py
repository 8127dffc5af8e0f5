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
    fingerprint_sql,
    quality_sql,
    shingle_select_sql,
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
    sh AS ({shingle_select_sql(3, "curated")}),
    cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN cnt ca ON inter.doc_a = ca.doc_id
      JOIN cnt cb ON inter.doc_b = cb.doc_id
      WHERE common * 1.0 / (ca.n_sh + cb.n_sh - common) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
    surv AS (
      SELECT d.doc_id, d.lang, d.text
      FROM curated d LEFT JOIN comp c ON d.doc_id = c.node
      WHERE COALESCE(c.component, d.doc_id) = d.doc_id
    ),
    fp AS (
      SELECT lang, {fingerprint_sql()} AS h
      FROM surv
    )
    SELECT CASE WHEN h % 100 < 80 THEN 'train'
                WHEN h % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs
    FROM fp
    GROUP BY 1, 2
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

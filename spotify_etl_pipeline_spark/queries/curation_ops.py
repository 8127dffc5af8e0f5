"""Corpus-curation queries (training-data pipeline extension tier):
benchmark decontamination and deterministic mixture resampling, both with
full DuckDB oracles (the fingerprint/shingle formulas are shared verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import benchmark_ngram_hits, mixture_sample
from ..schemas import load_fixture
from .catalog import register
from .oracle_sql_helpers import fingerprint_sql, shingle_select_sql

DECONTAM_N = 5
# doc_id % 29 == 0 → the stand-in benchmark set: large enough that the
# fixture corpus has real 5-gram contamination at every SF (7 hit docs at
# sf0.01, not a vacuous empty result)
BENCH_MOD = 29


@register(
    "decontaminate_against_benchmark",
    oracle=f"""
    WITH bench AS (SELECT * FROM documents WHERE doc_id % {BENCH_MOD} = 0),
    corpus AS (SELECT * FROM documents WHERE doc_id % {BENCH_MOD} <> 0),
    bsh AS (SELECT DISTINCT shingle FROM ({shingle_select_sql(DECONTAM_N, "bench")})),
    csh AS ({shingle_select_sql(DECONTAM_N, "corpus")})
    SELECT csh.doc_id, COUNT(*) AS n_hits
    FROM csh JOIN bsh USING (shingle)
    GROUP BY csh.doc_id
    """,
    survey="X2,X4",
    doc="Benchmark decontamination (public GPT-3/C4 methodology): corpus "
    "documents sharing any 5-gram with the held-out benchmark set, with "
    "distinct-shared-shingle counts. The benchmark shingle set is small by "
    "nature and broadcasts; the corpus side never shuffles before the "
    "per-doc aggregation of matches.",
)
def decontaminate_against_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % BENCH_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % BENCH_MOD != 0)
    return benchmark_ngram_hits(corpus, bench, n=DECONTAM_N)


_MIX_FRACTIONS = {f"src{i}": (i % 4 + 1) / 4 for i in range(20)}

# round(), not int() — matches mixture_sample (truncation would undershoot
# targets whose float product lands just below the integer)
_MIX_CASE = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {round(f * 10000)}"
    for s, f in sorted(_MIX_FRACTIONS.items())
) + " ELSE 10000 END"


@register(
    "source_mixture_sample",
    oracle=f"""
    WITH fp AS (
      SELECT source, {fingerprint_sql()} AS h
      FROM documents
    )
    SELECT source, COUNT(*) AS n_kept
    FROM fp
    WHERE h % 10000 < {_MIX_CASE}
    GROUP BY source
    """,
    survey="X4,X1",
    doc="Deterministic source-mixture resampling: per-source keep "
    "fractions (src_i keeps (i%4+1)/4 here) applied via a content-"
    "fingerprint predicate — zero shuffles, zero RNG state, stable under "
    "re-ingestion; the mixture-reweighting stage of every multi-source "
    "pretraining recipe.",
)
def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    kept = mixture_sample(docs, _MIX_FRACTIONS, granularity=10_000)
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))

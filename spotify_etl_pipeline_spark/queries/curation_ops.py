"""Corpus-curation queries (training-data pipeline extension tier):
benchmark decontamination and deterministic mixture resampling, both with
full DuckDB oracles (the fingerprint/shingle formulas are shared verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators.components import resolve_duplicates
from ..operators.curation import benchmark_ngram_hits, mixture_sample
from ..operators.text import fingerprint_expr, quality_score, shingles
from ..schemas import load_fixture
from .catalog import register
from .oracle_sql_helpers import (
    CURATION_LANGS,
    CURATION_QUALITY_MIN,
    SPLIT_SELECT_SQL,
    dedup_and_split_ctes,
    fingerprint_sql,
    quality_sql,
    shingle_select_sql,
)

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
    survey="X2,X4,X20",
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


#: Per-language token budget for mixture_sample_to_budget. 4000 puts the
#: sf0.01 fixture in all three regimes at once: en (~11.8k tokens) is
#: deeply downsampled, zh (~4.1k) sits just under keep-whole, and
#: es/fr/de (< 4k) clamp to the whole stratum.
_TOKEN_BUDGET = 4_000


@register(
    "mixture_sample_to_budget",
    oracle=f"""
    WITH tk AS (
      SELECT lang, {fingerprint_sql()} AS h,
             len(string_split(text, ' ')) AS nt
      FROM documents
    ),
    tot AS (SELECT lang, SUM(nt) AS T FROM tk GROUP BY lang),
    fr AS (
      SELECT lang,
             LEAST(CAST(10000 AS BIGINT),
                   (CAST(10000 AS BIGINT) * {_TOKEN_BUDGET}) // T) AS f
      FROM tot
    ),
    kept AS (
      SELECT tk.lang, nt FROM tk JOIN fr USING (lang) WHERE h % 10000 < f
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(nt) AS BIGINT) AS n_tokens_kept
    FROM kept GROUP BY lang
    """,
    survey="X4,X1",
    doc="Token-BUDGET-driven mixture sampling: each language capped at "
    f"{_TOKEN_BUDGET} tokens — the data-mixing stage when the recipe "
    "says 'cap web text at N tokens', with the keep fraction DERIVED "
    "from per-stratum token totals (least(1, budget/T_s) in all-BIGINT "
    "floor arithmetic — bit-reproducible, no floats) and applied via "
    "the shared content-fingerprint predicate (re-ingest-stable, zero "
    "RNG). One partial-agg totals pass + a broadcast threshold join + a "
    "per-row predicate: the corpus never shuffles. The fixture budget "
    "exercises all three regimes: deep downsample (en), near-1 (zh), "
    "and clamped keep-whole (es/fr/de).",
)
def mixture_sample_to_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import budget_mixture_sample

    docs = load_fixture(spark, sf_dir, "documents")
    kept = budget_mixture_sample(
        docs, stratum="lang", token_budget=_TOKEN_BUDGET
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
        F.sum("_nt").cast("long").alias("n_tokens_kept"),
    )


#: Total token budget for the temperature entry. 22000 against the
#: sf0.01 fixture (~27k tokens, en ~11.8k) lands the strata in three
#: regimes: en deeply downsampled (keep ~0.57), zh/es/fr near-1, de
#: clamped whole — the same three-regime coverage as the per-stratum
#: budget entry, but under the sqrt-share division.
_TEMP_BUDGET = 22_000


@register(
    "mixture_sample_temperature",
    oracle=f"""
    WITH tk AS (
      SELECT lang, {fingerprint_sql()} AS h,
             len(string_split(text, ' ')) AS nt
      FROM documents
    ),
    tot AS (SELECT lang, SUM(nt) AS T FROM tk GROUP BY lang),
    w AS (
      SELECT lang, T,
             CAST(FLOOR(sqrt(CAST(T AS DOUBLE)) * 1000 + 0.5) AS BIGINT)
               AS wq
      FROM tot
    ),
    sw AS (SELECT SUM(wq) AS swq FROM w),
    fr AS (
      SELECT lang,
             LEAST(CAST(10000 AS BIGINT),
                   (CAST(10000 AS BIGINT) * {_TEMP_BUDGET} * wq)
                     // (swq * T)) AS f
      FROM w CROSS JOIN sw
    ),
    kept AS (
      SELECT tk.lang, nt FROM tk JOIN fr USING (lang) WHERE h % 10000 < f
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(nt) AS BIGINT) AS n_tokens_kept
    FROM kept GROUP BY lang
    """,
    survey="X4,X1",
    doc=f"Temperature-based multilingual sampling at alpha=0.5 (Conneau "
    f"& Lample 2019, the XLM-R recipe): a TOTAL budget of {_TEMP_BUDGET} "
    "tokens divided among languages proportionally to sqrt(T_s), "
    "up-weighting low-resource strata — kept tokens per language "
    "converge to the sqrt-share targets. Works as a full value-hash "
    "oracle BECAUSE alpha=0.5: IEEE sqrt is correctly rounded, so the "
    "quantized weights floor(sqrt(T)*1000+0.5) are the same BIGINT on "
    "both engines and the whole threshold chain is exact integer "
    "arithmetic (general pow() is not correctly rounded and would not "
    "hash-check). Same never-shuffle-the-corpus plan as the budget "
    "sampler: totals partial-agg, 1-row sum-of-weights broadcast, "
    "|strata|-row threshold broadcast, fingerprint predicate.",
)
def mixture_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import temperature_mixture_sample

    docs = load_fixture(spark, sf_dir, "documents")
    kept = temperature_mixture_sample(
        docs, stratum="lang", total_token_budget=_TEMP_BUDGET
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
        F.sum("_nt").cast("long").alias("n_tokens_kept"),
    )


@register(
    "text_repetition_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    base AS (
      SELECT doc_id, toks, greatest(len(toks), 1) AS n,
             len(list_distinct(toks)) AS n_distinct
      FROM t
    ),
    bigrams AS (
      SELECT doc_id,
             unnest(list_transform(range(greatest(len(toks) - 1, 0)),
                                   i -> toks[i+1] || '_' || toks[i+2])) AS bg
      FROM t
    ),
    bg_counts AS (
      SELECT doc_id, bg, COUNT(*) AS c FROM bigrams GROUP BY doc_id, bg
    ),
    top_bg AS (SELECT doc_id, MAX(c) AS top_c FROM bg_counts GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(b.n AS BIGINT) AS n_tokens,
           CAST(FLOOR(1000 * (b.n - b.n_distinct) / b.n) AS BIGINT)
               AS dup_token_milli,
           CAST(FLOOR(1000 * COALESCE(t.top_c, 0) / greatest(b.n - 1, 1)) AS BIGINT)
               AS top_bigram_milli,
           (b.n - b.n_distinct) * 2 < b.n
               AND COALESCE(t.top_c, 0) * 5 < greatest(b.n - 1, 1) AS keep
    FROM base b LEFT JOIN top_bg t ON b.doc_id = t.doc_id
    """,
    survey="X4",
    doc="Gopher-style repetition quality stats per document: duplicate-"
    "token fraction and most-frequent-bigram fraction (FLOOR-milli "
    "integers — cross-engine exact), plus the keep flag (dup fraction "
    "< 0.5 AND top-bigram fraction < 0.2, evaluated in integer "
    "arithmetic). The bigram counts shuffle on (doc, bigram) — bounded "
    "per-document work, no corpus-wide state.",
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    base = t.select(
        "doc_id",
        "toks",
        F.greatest(F.size("toks"), F.lit(1)).alias("n"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )
    # NON-distinct bigram multiset (same '_'-joined shape as the shared
    # shingles helper; doc_shingles is not reused here because it
    # dedups per document, and repetition counting needs the duplicates)
    bigrams = t.select("doc_id", F.explode(shingles("toks", 2)).alias("bg"))
    top_bg = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    dup = F.col("n") - F.col("n_distinct")
    top_c = F.coalesce(F.col("top_c"), F.lit(0))
    n_bg = F.greatest(F.col("n") - 1, F.lit(1))
    return (
        base.join(top_bg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.floor(1000 * dup / F.col("n")).alias("dup_token_milli"),
            F.floor(1000 * top_c / n_bg).alias("top_bigram_milli"),
            ((dup * 2 < F.col("n")) & (top_c * 5 < n_bg)).alias("keep"),
        )
    )


_LANG_LIST = ", ".join(f"'{la}'" for la in CURATION_LANGS)


@register(
    "corpus_curation_decontaminated",
    oracle=f"""
    WITH RECURSIVE
    bench AS (SELECT * FROM documents WHERE doc_id % {BENCH_MOD} = 0),
    corpus0 AS (
      SELECT doc_id, lang, text FROM documents
      WHERE doc_id % {BENCH_MOD} <> 0
        AND lang IN ({_LANG_LIST}) AND {quality_sql()} >= {CURATION_QUALITY_MIN}
    ),
    bsh AS (SELECT DISTINCT shingle FROM ({shingle_select_sql(DECONTAM_N, "bench")})),
    contaminated AS (
      SELECT DISTINCT doc_id
      FROM ({shingle_select_sql(DECONTAM_N, "corpus0")}) csh
      JOIN bsh USING (shingle)
    ),
    curated AS (
      SELECT * FROM corpus0
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    {dedup_and_split_ctes("curated")}
    {SPLIT_SELECT_SQL}
    """,
    survey="X1,X2,X4",
    doc="The full training-corpus chain with decontamination composed in: "
    "language + quality gate -> drop documents sharing any 5-gram with "
    "the held-out benchmark -> near-dup clustering with min-id survivor "
    "resolution -> content-fingerprint 80/10/10 split, as (split, lang) "
    "counts. Every stage reuses the individually-verified operator; the "
    "oracle recomputes the whole chain (recursive-CTE components "
    "included) in one statement.",
)
def corpus_curation_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % BENCH_MOD == 0)
    corpus0 = (
        quality_score(docs.filter(F.col("doc_id") % BENCH_MOD != 0))
        .filter(
            (F.col("quality_milli") >= CURATION_QUALITY_MIN)
            & F.col("lang").isin(*CURATION_LANGS)
        )
        .select("doc_id")
        .join(docs, "doc_id")
        .select("doc_id", "lang", "text")
        # consumed twice (decontam shingles + the anti-join's left side):
        # persist so the quality pipeline runs once
        .persist()
    )
    contaminated = benchmark_ngram_hits(corpus0, bench, n=DECONTAM_N).select("doc_id")
    # consumed three times (pair generation, the node set inside
    # resolve_duplicates, and the final survivor join) — without persist
    # the whole quality+decontamination subtree re-executes per consumer
    curated = corpus0.join(contaminated, "doc_id", "left_anti").persist()
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


def _bloom_oracle() -> str:
    from ..operators.bloom import BLOOM_K, bloom_position_sql_duck

    bp = bloom_position_sql_duck("shingle")
    pos_list = ", ".join(bp)
    return f"""
    WITH bench AS (SELECT * FROM documents WHERE doc_id % {BENCH_MOD} = 0),
    corpus AS (SELECT * FROM documents WHERE doc_id % {BENCH_MOD} <> 0),
    bsh AS (SELECT DISTINCT shingle
            FROM ({shingle_select_sql(DECONTAM_N, "bench")})),
    bits AS (SELECT DISTINCT unnest([{pos_list}]) AS pos FROM bsh),
    csh AS ({shingle_select_sql(DECONTAM_N, "corpus")}),
    cpos AS (SELECT doc_id, shingle, unnest([{pos_list}]) AS pos FROM csh),
    bloom_pos AS (
      SELECT doc_id, shingle FROM cpos JOIN bits USING (pos)
      GROUP BY doc_id, shingle HAVING COUNT(*) = {BLOOM_K}
    ),
    bl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bloom
           FROM bloom_pos GROUP BY doc_id),
    ex AS (SELECT csh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_exact
           FROM csh JOIN bsh USING (shingle) GROUP BY csh.doc_id)
    SELECT bl.doc_id, n_bloom,
           CAST(COALESCE(ex.n_exact, 0) AS BIGINT) AS n_exact
    FROM bl LEFT JOIN ex USING (doc_id)
    """


@register(
    "bloom_decontaminate",
    oracle=_bloom_oracle(),
    survey="X2,X4,X6,X20,X25",
    doc="Bloom-filter benchmark decontamination: the exact pass "
    "(decontaminate_against_benchmark) broadcasts the benchmark's raw "
    "shingle strings, which stops being free when the eval union carries "
    "10^8+ n-grams; this variant broadcasts a fixed 2^16-bit position set "
    "instead (m-bit Bloom array as a ≤m-row DISTINCT table) at a bounded, "
    "measured false-positive cost — n_bloom vs n_exact per doc IS the FP "
    "overhang. Hash family = md5 hex slices mod m, bit-identical in "
    "DuckDB; FPs only over-flag (conservative drop), misses impossible.",
)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import bloom_contamination

    docs = load_fixture(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % BENCH_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % BENCH_MOD != 0)
    return bloom_contamination(corpus, bench, n=DECONTAM_N)


#: Total token budget for the curation-quality-mix capstone's final
#: temperature stage, sized against the post-cut post-quality survivor
#: mass at sf0.01 so the sqrt-share division leaves some languages
#: downsampled and some near-or-at clamp.
_QMIX_BUDGET = 15_000


def _qmix_oracle() -> str:
    """Assembled capstone oracle: the intra-doc cut CTE prefix (shared
    verbatim with the X30 entries, substring_ops.intra_ctes) + cleaned
    corpus reassembly + the LM/ntile tier + the temperature stage —
    each fragment the same SQL its standalone entry hash-checks."""
    from .substring_ops import cleaned_corpus_ctes, intra_ctes

    return (
        intra_ctes("documents")
        + cleaned_corpus_ctes("ispans", "documents")
        + lm_tier_surv_ctes("cdocs")
        + temperature_mix_ctes("surv", _QMIX_BUDGET)
        + """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(nt) AS BIGINT) AS n_tokens_kept
    FROM skept GROUP BY lang
    """
    )


def lm_tier_surv_ctes(src: str) -> str:
    """The char-bigram LM quality tier as reusable CTEs over ``src``
    (doc_id, lang, text): fit the LM on ``src`` itself, score per doc,
    ntile(3) per language, and end at ``surv`` — the survivors with the
    tail third dropped.  The SQL twin of ``lm_score_milli`` +
    ``assign_quality_buckets(bucket <= 2)``, shared by the quality-mix
    capstone and the end-to-end chain so the formulas cannot drift."""
    return f""",
    ld AS (
      SELECT doc_id, lang, lower(text) AS t FROM {src} WHERE length(text) >= 2
    ),
    bg AS (
      SELECT doc_id,
             unnest([substring(t, CAST(x AS INTEGER), 2)
                     for x in range(1, length(t))]) AS bg
      FROM ld
    ),
    bgc AS (SELECT doc_id, bg, COUNT(*) AS k FROM bg GROUP BY doc_id, bg),
    lm AS (SELECT bg, SUM(k) AS c FROM bgc GROUP BY bg),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS tc FROM lm),
    sc AS (
      SELECT b.doc_id,
             CAST(FLOOR(ROUND(SUM(b.k * LN(lm.c / tot.tc)) / SUM(b.k), 4)
                        * 10000 + 0.5)
                  AS BIGINT) AS m
      FROM bgc b JOIN lm ON b.bg = lm.bg CROSS JOIN tot
      GROUP BY b.doc_id
    ),
    rk AS (
      SELECT ld.doc_id,
             NTILE(3) OVER (PARTITION BY ld.lang
                            ORDER BY sc.m DESC, ld.doc_id) AS b
      FROM sc JOIN ld USING (doc_id)
    ),
    surv AS (
      SELECT {src}.doc_id, {src}.lang, {src}.text
      FROM {src} JOIN rk USING (doc_id) WHERE rk.b <= 2
    )"""


def temperature_mix_ctes(src: str, budget: int) -> str:
    """The α=0.5 temperature-mixture stage as reusable CTEs over
    ``src`` (doc_id, lang, text): √T-share integer thresholds against a
    ``budget``-token total, ending at ``skept`` — the kept rows with
    ``doc_id`` carried through so a downstream stage (the end-to-end
    capstone) can join the kept corpus back, while the quality-mix
    capstone aggregates (lang, nt) exactly as before.  The SQL twin of
    ``temperature_mixture_sample`` (thresholds_mode='plan')."""
    return f""",
    stk AS (
      SELECT doc_id, lang, {fingerprint_sql()} AS h,
             len(string_split(text, ' ')) AS nt
      FROM {src}
    ),
    stot AS (SELECT lang, SUM(nt) AS T FROM stk GROUP BY lang),
    sw_ AS (
      SELECT lang, T,
             CAST(FLOOR(sqrt(CAST(T AS DOUBLE)) * 1000 + 0.5) AS BIGINT)
               AS wq
      FROM stot
    ),
    ssw AS (SELECT SUM(wq) AS swq FROM sw_),
    sfr AS (
      SELECT lang,
             LEAST(CAST(10000 AS BIGINT),
                   (CAST(10000 AS BIGINT) * {budget} * wq)
                     // (swq * T)) AS f
      FROM sw_ CROSS JOIN ssw
    ),
    skept AS (
      SELECT stk.doc_id, stk.lang, nt
      FROM stk JOIN sfr USING (lang) WHERE h % 10000 < f
    )"""


@register(
    "corpus_curation_quality_mix",
    oracle=_qmix_oracle(),
    survey="X30,X10,X4,X1",
    doc="The modern pretraining curation chain as ONE composed plan "
    "(RefinedWeb/CCNet stage order): intra-document repetition cut "
    "(keep-first, L=4) → char-bigram LM quality tiers computed on the "
    "CLEANED text with the tail third dropped per language → "
    f"temperature mixing at alpha=0.5 to a {_QMIX_BUDGET}-token total "
    "budget over the survivors — reporting per-language kept "
    "docs/tokens. Every stage reuses the individually-oracle-checked "
    "operator (shared CTE fragments, the corpus_curation convention), "
    "so the capstone pins the COMPOSITION: the LM trains on cleaned "
    "text, the tiers rank cleaned scores, the mixture thresholds and "
    "fingerprints derive from cleaned survivors. Scale shape is the "
    "union of its parts: doc-bounded cut shuffles, one vocabulary-sized "
    "LM fit, per-lang ntile (approx-cutoff mode is the 100 TB swap-in), "
    "broadcast mixture thresholds — the corpus never joins itself.",
)
def corpus_curation_quality_mix(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    from ..operators.curation import temperature_mixture_sample
    from ..operators.text import intradoc_cut_corpus
    from .stats_ops import assign_quality_buckets, lm_score_milli
    from .substring_ops import INTRA_L

    docs = load_fixture(spark, sf_dir, "documents")
    cleaned = (
        intradoc_cut_corpus(docs, min_len=INTRA_L)
        .select("doc_id", F.col("clean_text").alias("text"))
        .join(docs.select("doc_id", "lang"), "doc_id")
        # the cleaned corpus is read by FOUR downstream consumers (LM
        # fit, LM scoring, the survivor join, mixture totals) — eager
        # localCheckpoint so the cut pipeline runs once, not per
        # consumer (the stored-artifact lesson measured on the residual
        # PQ index, SCALE.md §Round-7)
        .localCheckpoint(eager=True)
    )
    scored = lm_score_milli(cleaned)  # (doc_id, m, lang) — cleaned text
    # the tier stage carries the same dial as quality_lm_buckets:
    # approx=True swaps the per-lang ntile (one-task sort per language)
    # for broadcast percentile_approx cutoffs — the 100 TB path; the
    # oracle pins the exact mode, the approx arm is tolerance-tested at
    # the capstone level (tests/test_curation.py)
    keep_ids = (
        assign_quality_buckets(scored, n_buckets=3, approx=approx)
        .filter(F.col("bucket") <= 2)
        .select("doc_id")
    )
    survivors = cleaned.join(keep_ids, "doc_id")
    kept = temperature_mixture_sample(
        survivors, stratum="lang", total_token_budget=_QMIX_BUDGET
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
        F.sum("_nt").cast("long").alias("n_tokens_kept"),
    )


#: stratified_exact_n_sample's N: 30 per language selects a strict
#: subset at sf0.01+ (≈100 docs/lang) and keeps-whole at sf0.001
#: (≈10 docs/lang) — both regimes exercised across the driver's scales.
_EVAL_N = 30


@register(
    "eval_set_stratified_sample",
    oracle=f"""
    WITH fp AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             {fingerprint_sql()} AS f
      FROM documents
    )
    SELECT lang, doc_id, n_tokens
    FROM (SELECT lang, doc_id, n_tokens,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY f % 10000 ASC, f ASC,
                                             doc_id ASC) AS rk
          FROM fp)
    WHERE rk <= {_EVAL_N}
    """,
    survey="X1,X4,X34",
    doc=f"Exact-N-per-stratum deterministic sampling — EVAL-SET CARVING: "
    f"exactly {_EVAL_N} documents per language (whole stratum when "
    "smaller), ranked by (content fingerprint, doc_id) — pseudo-random "
    "but purely content-derived, so the carved set is bit-stable under "
    "re-ingestion/retries/repartitioning with zero RNG state, unlike "
    "the mixture samplers' fraction targets whose realized sizes drift "
    "binomially. Per-stratum top-N via ROW_NUMBER; the operator's "
    "prefilter=True dial is the 100 TB arm — a totals pass sizes a "
    "fingerprint-bucket threshold admitting ~margin*N rows per stratum "
    "into the window (admission VERIFIED >= N per stratum, raises "
    "rather than approximating: the N smallest keys provably lie below "
    "any threshold admitting >= N rows), so no corpus-sized stratum "
    "ever sorts in one task; equality-tested against this exact arm.",
)
def eval_set_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import stratified_exact_n_sample

    docs = load_fixture(spark, sf_dir, "documents")
    return stratified_exact_n_sample(docs, stratum="lang", n_per_stratum=_EVAL_N)


def leak_free_split_sql(src: str, n_per_stratum: int, n: int) -> str:
    """The leak-free split as a COMPLETE, self-contained ``WITH ...
    SELECT`` statement over ``src`` (doc_id, lang, text) — the eval-
    carve CTE (verbatim the ``eval_set_stratified_sample`` formulation)
    feeding the Bloom membership CTEs (verbatim the
    ``bloom_decontaminate`` construction, probe side = the non-eval
    corpus), the two already-hash-checked fragments chained the
    direction the capstone runs them.  Usable directly as an oracle
    (``src='documents'``) or as a nested-subquery stage of the
    end-to-end chain."""
    from ..operators.bloom import BLOOM_K, bloom_position_sql_duck

    pos_list = ", ".join(bloom_position_sql_duck("shingle"))
    return f"""
    WITH fp AS (
      SELECT lang, doc_id, text, {fingerprint_sql()} AS f FROM {src}
    ),
    ev AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY f % 10000 ASC, f ASC,
                                           doc_id ASC) AS rk
        FROM fp)
      WHERE rk <= {n_per_stratum}
    ),
    evdocs AS (SELECT d.doc_id, d.text FROM {src} d JOIN ev USING (doc_id)),
    bsh AS (SELECT DISTINCT shingle
            FROM ({shingle_select_sql(n, "evdocs")})),
    bits AS (SELECT DISTINCT unnest([{pos_list}]) AS pos FROM bsh),
    train0 AS (SELECT d.doc_id, d.text FROM {src} d
               ANTI JOIN ev USING (doc_id)),
    csh AS ({shingle_select_sql(n, "train0")}),
    cpos AS (SELECT doc_id, shingle, unnest([{pos_list}]) AS pos FROM csh),
    contaminated AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id, shingle FROM cpos JOIN bits USING (pos)
        GROUP BY doc_id, shingle HAVING COUNT(*) = {BLOOM_K}
      )
    )
    SELECT d.doc_id, d.lang,
           CASE WHEN ev.doc_id IS NOT NULL THEN 'eval'
                WHEN c.doc_id IS NOT NULL THEN 'cut'
                ELSE 'train' END AS split
    FROM {src} d
    LEFT JOIN ev ON d.doc_id = ev.doc_id
    LEFT JOIN contaminated c ON d.doc_id = c.doc_id
    """


def _leak_free_oracle() -> str:
    return leak_free_split_sql("documents", _EVAL_N, DECONTAM_N)


@register(
    "eval_split_decontaminated",
    oracle=_leak_free_oracle(),
    survey="X34,X20,X36,X1,X4",
    doc=f"The LEAK-FREE SPLIT capstone: carve exactly {_EVAL_N} eval "
    "docs per language (content-fingerprint-ranked — "
    "eval_set_stratified_sample verbatim), then scrub the TRAINING "
    "corpus against the carved set's 5-grams via the Bloom bitset "
    "(bloom_decontaminate's construction, probe side = non-eval "
    "corpus) — per-doc (doc_id, lang, split) with split in "
    "{eval, train, cut}, the whole assignment value-hash-checked. "
    "Bloom FPs only move train->cut (conservative, deterministic md5 "
    "family); misses are impossible, so zero eval 5-grams survive in "
    "kept train (planted-contamination-tested). Scale: |langs|*N eval "
    "ids materialized once, <=m-row broadcast bitset, corpus side one "
    "narrow shingle explode + broadcast probe — no corpus x eval join.",
)
def eval_split_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import leak_free_split

    docs = load_fixture(spark, sf_dir, "documents")
    return leak_free_split(
        docs, stratum="lang", n_per_stratum=_EVAL_N, n=DECONTAM_N
    )


# Deterministic PII planting for the scrub entry: the synthetic corpus
# is word-salad with no PII, so the entry derives redactable spans from
# doc_id — in the COMMON Spark-SQL/DuckDB dialect subset, so BOTH
# engines build the byte-identical input text (Spark via F.expr, DuckDB
# verbatim in the oracle CTE).  Different moduli put each PII kind on a
# different (overlapping) subset of docs, zero-hit docs included.
_PII_AUG_SQL = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||"
    " CAST(doc_id AS STRING) || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 1 THEN ' call +1-555-' ||"
    " lpad(CAST(doc_id % 10000 AS STRING), 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 5 = 2 THEN ' host 10.' ||"
    " CAST(doc_id % 256 AS STRING) || '.0.1 up' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 3 THEN ' id 123-45-6789 ok' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 4 THEN"
    " ' acct 4111111111111111 end' ELSE '' END"
)


def _pii_oracle() -> str:
    from ..operators.pii import pii_scrub_sql_duck

    counts, clean = pii_scrub_sql_duck("t")
    cols = ",\n           ".join(counts)
    return f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents)
    SELECT doc_id,
           {cols},
           {clean} AS clean_text
    FROM aug
    """


@register(
    "corpus_pii_scrub",
    oracle=_pii_oracle(),
    survey="X41,X4,F1,F3",
    doc="PII/pattern scrubbing (VERDICT r11 #4) — the redaction stage a "
    "shipped corpus runs before tokenization: emails, ssn-shaped ids, "
    "phone numbers, IPv4 addresses, and card-shaped digit runs, "
    "redacted by a fixed-order regexp_replace chain with SEQUENTIAL "
    "per-pattern audit counts (each pattern counts on the text AFTER "
    "the previous replacements — what this stage actually redacted; an "
    "ssn inside an email is the email's, not double-counted). Patterns "
    "live in the Java-regex/RE2 common subset so the DuckDB twin runs "
    "them byte-identically. Scale: ONE narrow projection — zero "
    "exchanges/joins added to the corpus scan (plan-asserted, the "
    "bpe_decode recipe); map-only at 100 TB with no skew surface.",
)
def corpus_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pii import pii_scrub

    docs = load_fixture(spark, sf_dir, "documents")
    aug = docs.select("doc_id", F.expr(_PII_AUG_SQL).alias("text"))
    return pii_scrub(aug, "text").select(
        "doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4", "n_card",
        "clean_text",
    )

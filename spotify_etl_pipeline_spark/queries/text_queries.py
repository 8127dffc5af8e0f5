"""Text-analysis queries over ``documents`` (SURVEY.md X4) with DuckDB
oracles. The Spark implementations live in :mod:`..operators.text`; each
oracle reproduces the arithmetic exactly (shared per-token value formula,
shared rounding)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as T
from ..schemas import load_fixture
from .catalog import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_fixture(spark, sf_dir, "documents")


_EN = ", ".join(f"'{w}'" for w in T.LANG_PROFILES["en"])
_DE = ", ".join(f"'{w}'" for w in T.LANG_PROFILES["de"])
# DuckDB twin of operators.text._token_value
_DUCK_TOKVAL = (
    "(length(t) * 31 + ascii(substring(t, 1, 1)) * 7 + ascii(substring(t, -1, 1)))"
)


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_unique,
           ROUND((length(text) - len(string_split(text, ' ')) + 1)
                 / len(string_split(text, ' ')), 4) AS avg_token_len
    FROM documents
    """,
    survey="X4",
    doc="Per-document token statistics (counts, distinct, avg length).",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.token_stats(_docs(spark, sf_dir))


@register(
    "text_word_frequency",
    oracle="""
    SELECT tok AS token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
    survey="X4",
    doc="Global word frequency, deterministic top-20 (the word-count shape).",
)
def text_word_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.word_frequency(_docs(spark, sf_dir), top_k=20)


@register(
    "text_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang AS labeled_lang,
             ROUND(len(list_filter(string_split(text, ' '),
                                   t -> list_contains([{_EN}], t)))
                   / greatest(len(string_split(text, ' ')), 1), 4) AS en_score,
             ROUND(len(list_filter(string_split(text, ' '),
                                   t -> list_contains([{_DE}], t)))
                   / greatest(len(string_split(text, ' ')), 1), 4) AS de_score
      FROM documents
    )
    SELECT doc_id, labeled_lang, en_score, de_score,
           CASE WHEN en_score >= de_score THEN 'en' ELSE 'de' END AS predicted_lang
    FROM scored
    """,
    survey="X4",
    doc="Heuristic language ID: stopword-profile match fractions + argmax.",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.language_scores(_docs(spark, sf_dir))


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_unique,
           CAST(40 * least(greatest(len(string_split(text, ' ')), 1), 100)
              + (3000 * len(list_distinct(string_split(text, ' '))))
                // greatest(len(string_split(text, ' ')), 1)
              + 3000
              - (3000 * len(list_filter(string_split(text, ' '),
                                        t -> list_contains([{_EN}], t))))
                // greatest(len(string_split(text, ' ')), 1)
           AS BIGINT) AS quality_milli
    FROM documents
    """,
    survey="X4",
    doc="Composite quality score (length saturation + diversity + "
    "non-stopword density) on a 0-10000 integer milli scale — pure integer "
    "arithmetic because a float score rounded to 4dp hit a half-ulp "
    "boundary at sf0.1 where the two engines' round() disagreed.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_score(_docs(spark, sf_dir))


@register(
    "text_bpe_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           CAST(list_sum(list_transform(string_split(text, ' '),
                t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_pieces
    FROM documents
    """,
    survey="X4",
    doc="BPE-ish subword counting: ceil(len/4) pieces per word.",
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.bpe_ish_token_count(_docs(spark, sf_dir))


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                 t -> CAST({_DUCK_TOKVAL} AS BIGINT))),
             (acc, x) -> (acc * {T.FP_BASE} + x) % {T.MOD}) AS fingerprint
    FROM documents
    """,
    survey="X4",
    doc="Rolling polynomial hash fingerprint over the token stream.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprint(_docs(spark, sf_dir))


@register(
    "text_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT token, COUNT(*) AS dfreq FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf, dfreq.dfreq,
           ROUND(tf.tf * ln(n.n_docs * 1.0 / dfreq.dfreq), 4) AS tfidf
    FROM tf JOIN dfreq USING (token) CROSS JOIN n
    """,
    survey="X4",
    doc="TF-IDF: per-(doc, token) term frequency × ln(N/doc-frequency). "
    "Two hash aggregates + a vocab-sized join (AQE broadcasts it) + a "
    "1-row broadcast for N — no global sort, no UDF.",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "dfreq",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("dfreq")), 4
            ).alias("tfidf"),
        )
    )


@register(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g')) AS clean_text
    FROM documents
    """,
    survey="X4",
    doc="Canonical pre-tokenization cleanup: lowercase → strip "
    "non-alphanumerics → collapse runs of spaces → trim. Pure codegen "
    "string expressions (regexp_replace is JVM-side); the normalize step "
    "every corpus pipeline runs before shingling/tokenizing.",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return _docs(spark, sf_dir).select("doc_id", clean.alias("clean_text"))


@register(
    "text_pii_redact",
    oracle="""
    WITH salted AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) ||
             '@example.com or +1-555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                 AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(raw,
               '[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
             '[+][0-9]+-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
    FROM salted
    """,
    survey="X4",
    doc="PII scrubbing (corpus-prep staple): email and phone patterns "
    "replaced with placeholder tokens, pure codegen regexp_replace. The "
    "PII is synthesized in-query from doc attributes so the redaction "
    "paths are actually exercised on the synthetic corpus; patterns use "
    "explicit [0-9] classes to stay regex-dialect-neutral for the oracle.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    salted = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        ).alias("raw"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.col("raw"), "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+", "<EMAIL>"
        ),
        r"[+][0-9]+-[0-9]{3}-[0-9]{4}",
        "<PHONE>",
    )
    return salted.select("doc_id", redacted.alias("redacted"))


# --- BM25 retrieval scoring --------------------------------------------------
_BM25_TERMS = ("hash", "join", "scan")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(SUM(dl) AS BIGINT) AS total_len,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM dl
    ),
    dft AS (
      SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks WHERE tok IN ({_BM25_TERMS_SQL}) GROUP BY tok
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE tok IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, tok
    ),
    scored AS (
      SELECT tf.doc_id,
             SUM(LN(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                   / (stats.total_len / stats.n_docs))))
               AS s
      FROM tf
      JOIN dl ON tf.doc_id = dl.doc_id
      JOIN dft ON tf.tok = dft.tok
      CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    ranked AS (
      SELECT doc_id, ROUND(s, 4) AS score,
             ROW_NUMBER() OVER (ORDER BY ROUND(s, 4) DESC, doc_id) AS rank
      FROM scored
    )
    SELECT rank, doc_id, score FROM ranked WHERE rank <= 10
    """,
    survey="X4",
    doc="BM25 ranking (Robertson/Sparck Jones; k1=1.2, b=0.75, Lucene-style "
    "smoothed idf) for a fixed 3-term query over whitespace tokens — the "
    "retrieval-grade upgrade of tf-idf with document-length "
    "normalization. Corpus stats (N, avgdl, per-term df) are tiny "
    "aggregates broadcast back to the (doc, term) tf rows; ranking is "
    "decided on the 4dp-rounded score with a doc_id tiebreak so "
    "cross-engine ordering never rests on last-ulp float noise.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.sum("dl").alias("total_len"), F.count(F.lit(1)).alias("n_docs")
    )
    hits = toks.filter(F.col("tok").isin(*_BM25_TERMS))
    dft = hits.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    tf = hits.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = (
        idf
        * (F.col("tf") * 2.2)
        / (
            F.col("tf")
            + 1.2
            * (0.25 + 0.75 * F.col("dl") / (F.col("total_len") / F.col("n_docs")))
        )
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dft), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("s"))
    )
    # top-10 FIRST via orderBy+limit (TakeOrderedAndProject — distributed
    # partial top-k), THEN the rank attach over the 10 survivors: the old
    # row_number-then-filter shape sorted EVERY scored doc in one
    # partition (a corpus-scale single-partition sort at 100 TB — the r9
    # fix); partitionBy(lit) keeps the 10-row rank window warning-free.
    top = scored.select(
        "doc_id", F.round("s", 4).alias("score")
    ).orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).alias("rank"), "doc_id", "score"
    )


@register(
    "text_ngram_diversity",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(greatest(len(toks) - 2, 0)),
               i -> toks[i+1] || '_' || toks[i+2] || '_' || toks[i+3])
               AS grams
      FROM t
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           CAST((1000 * len(list_distinct(grams))) // len(grams) AS BIGINT)
             AS diversity_permille
    FROM g WHERE len(grams) > 0
    """,
    survey="X4",
    doc="N-gram diversity score (distinct-trigram ratio per document) — "
    "the self-repetition/diversity statistic curation recipes threshold "
    "on (the Self-BLEU-lite of RefinedWeb-style filters, complementing "
    "the X30 extent-based repetition tier with a cheap scalar). "
    "Entirely NARROW: token split, trigram transform, in-row "
    "array_distinct, integer permille — zero shuffles, zero UDFs; at "
    "100 TB this is a free rider on any corpus scan. Integer div "
    "quantization (the cross-engine idiom); docs shorter than one "
    "trigram are excluded on both engines.",
)
def text_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_fixture(spark, sf_dir, "documents")
    # split bound ONCE per row through the single-element-transform
    # let-binding (the interpreted-HOF rule, SCALE.md §Round-8: a
    # lambda-bearing expression gets no subexpression elimination, so
    # an inline split would re-tokenize per output gram)
    g = docs.select(
        "doc_id",
        F.expr(
            # CASE guard, not greatest(...,0): Spark sequence(1, 0) is
            # DESCENDING [1, 0], not empty (caught by the planted
            # short-doc test — the fixture never exercises it)
            "element_at(transform(array(split(text, ' ')), ts -> "
            "CASE WHEN size(ts) >= 3 THEN "
            "transform(sequence(1, size(ts) - 2), "
            "i -> concat_ws('_', slice(ts, i, 3))) "
            "ELSE array() END), 1)"
        ).alias("grams"),
    ).filter(F.size("grams") > 0)
    return g.select(
        "doc_id",
        F.size("grams").cast("long").alias("n_grams"),
        F.size(F.array_distinct("grams")).cast("long").alias("n_distinct"),
        F.expr("(1000 * size(array_distinct(grams))) div size(grams)")
        .cast("long")
        .alias("diversity_permille"),
    )


@register(
    "quality_gopher_gates",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             length(replace(text, ' ', '')) AS nc,
             len(list_filter(string_split(text, ' '),
                             t -> t IN ({_EN}))) AS n_stop,
             len(list_filter(string_split(text, ' '),
                             t -> regexp_full_match(t, '[a-zA-Z]+')))
               AS na,
             length(text) - length(replace(text, '#', ''))
               + length(text) - length(replace(text, '…', '')) AS ns
      FROM documents
    ),
    m AS (
      SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
             CAST(n_stop AS BIGINT) AS n_stop,
             CAST((1000 * nc) // greatest(n_words, 1) AS BIGINT)
               AS wlen_milli,
             CAST((1000 * na) // greatest(n_words, 1) AS BIGINT)
               AS alpha_milli,
             CAST((1000 * ns) // greatest(n_words, 1) AS BIGINT)
               AS symbol_milli
      FROM s
    )
    SELECT doc_id, n_words, wlen_milli, n_stop, alpha_milli, symbol_milli,
           n_words BETWEEN 25 AND 100000 AS pass_words,
           wlen_milli BETWEEN 3000 AND 10000 AS pass_wlen,
           n_stop >= 2 AS pass_stop,
           alpha_milli >= 800 AS pass_alpha,
           symbol_milli <= 100 AS pass_symbol,
           (n_words BETWEEN 25 AND 100000) AND
           (wlen_milli BETWEEN 3000 AND 10000) AND
           n_stop >= 2 AND alpha_milli >= 800 AND symbol_milli <= 100
             AS pass_all
    FROM m
    """,
    survey="X43,X4,X10,F2",
    doc="Gopher-style heuristic gate battery (Rae et al. 2021 §A1.1): "
    "word count, mean word length, stopword presence, alphabetic-word "
    "fraction, symbol ratio — each as the measured statistic PLUS its "
    "boolean gate with a per-rule audit (WHICH rule killed a document "
    "is the debugging quantity; quality_score's composite cannot say). "
    "min_words dialed 50→25 for the fixture's 10-99-word documents so "
    "both gate branches are populated where the driver hashes; the "
    "remaining dials are the paper's. Integer milli-scaled arithmetic "
    "end to end (the quality_score half-ulp lesson). ONE narrow "
    "projection — map-only at 100 TB, a free rider on any corpus scan.",
)
def quality_gopher_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = T.gopher_gates(_docs(spark, sf_dir), min_words=25)
    return g.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "wlen_milli",
        F.col("n_stop").cast("long").alias("n_stop"),
        "alpha_milli",
        "symbol_milli",
        "pass_words",
        "pass_wlen",
        "pass_stop",
        "pass_alpha",
        "pass_symbol",
        "pass_all",
    )

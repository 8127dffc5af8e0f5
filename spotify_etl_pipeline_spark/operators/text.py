"""Text-analysis operators over the ``documents`` table (SURVEY.md X4).

All pure built-in column expressions (whole-stage codegen, no Python in the
hot path): tokenization, shingling, language-ID scoring, quality scoring,
BPE-ish token counting, and a rolling-hash document fingerprint.

Scale notes: everything here is a narrow projection except the explicit
``explode``-based frequency aggregations, which shuffle on the token/shingle
key with map-side partial aggregation — the canonical word-count shape that
scales linearly. The rolling hash folds per-row over the token array (no
shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Tiny per-language stopword profiles for the heuristic language scorer.
# Intersected with the fixture vocabulary on purpose — the operator shape
# (profile match fraction → argmax) is what scales, not the word lists.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
}

MOD = 1_000_000_007
FP_BASE = 131


def tokens(col: Column | str) -> Column:
    """Whitespace tokenizer (documents.text is single-space separated)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def shingles(tokens_expr: str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> column.

    ``tokens_expr`` must be a SQL expression yielding array<string>.
    Built with transform-over-sequence so it stays JVM-side.
    """
    joined = ", '_', ".join(f"{tokens_expr}[i + {k}]" for k in range(n))
    return F.expr(
        f"CASE WHEN size({tokens_expr}) >= {n} THEN "
        f"transform(sequence(0, size({tokens_expr}) - {n}), i -> concat({joined})) "
        f"ELSE array() END"
    )


def stopword_fraction(toks: Column, words: tuple[str, ...]) -> Column:
    """Fraction of tokens that appear in ``words``."""
    return F.size(F.filter(toks, lambda t: t.isin(*words))) / F.greatest(
        F.size(toks), F.lit(1)
    )


def token_stats(df: DataFrame) -> DataFrame:
    """Per-document token statistics: counts, distinct counts, avg length."""
    toks = tokens("text")
    return df.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.round(
            (F.length("text") - F.size(toks) + 1) / F.size(toks), 4
        ).alias("avg_token_len"),
    )


def language_scores(df: DataFrame) -> DataFrame:
    """Heuristic language ID: stopword-profile match fraction per language,
    argmax wins (ties break toward 'en' via >=)."""
    toks = tokens("text")
    en = F.round(stopword_fraction(toks, LANG_PROFILES["en"]), 4)
    de = F.round(stopword_fraction(toks, LANG_PROFILES["de"]), 4)
    out = df.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        en.alias("en_score"),
        de.alias("de_score"),
    )
    return out.withColumn(
        "predicted_lang",
        F.when(F.col("en_score") >= F.col("de_score"), F.lit("en")).otherwise(F.lit("de")),
    )


def quality_score(df: DataFrame) -> DataFrame:
    """Composite document quality: length saturation + lexical diversity +
    non-stopword density, weighted 0.4/0.3/0.3, on a 0–10000 milli scale.

    Deliberately INTEGER arithmetic end to end (counts, ``div``): a float
    formulation rounded to 4dp can land on a half-ulp boundary where two
    engines' round() disagree — observed at sf0.1 before this was
    integerized. Exact integers compare exactly, at every scale.
    """
    stop_list = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    # 0.4*min(n/100,1)*10000 = 40*min(n,100); 0.3*(x/n)*10000 = (3000*x) div n
    return df.selectExpr(
        "doc_id",
        "lang",
        "size(split(text, ' ')) AS n_tokens",
        "size(array_distinct(split(text, ' '))) AS n_unique",
        f"""
        CAST(40 * least(greatest(size(split(text, ' ')), 1), 100)
             + (3000 * size(array_distinct(split(text, ' '))))
               div greatest(size(split(text, ' ')), 1)
             + 3000
             - (3000 * size(filter(split(text, ' '), t -> t IN ({stop_list}))))
               div greatest(size(split(text, ' ')), 1)
        AS BIGINT) AS quality_milli
        """,
    )


def gopher_gates(
    df: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_wlen_milli: int = 3_000,
    max_wlen_milli: int = 10_000,
    min_stop: int = 2,
    min_alpha_milli: int = 800,
    max_symbol_milli: int = 100,
) -> DataFrame:
    """Gopher-style heuristic quality gates (Rae et al. 2021 §A1.1, the
    public rule battery most curation stacks run BEFORE any model-based
    scorer): per-document word count, mean word length, stopword
    presence, alphabetic-word fraction, and symbol-to-word ratio, each
    emitted as the measured statistic PLUS a boolean gate, with
    ``pass_all`` the conjunction.  Unlike :func:`quality_score` (one
    composite number) this keeps the per-rule audit — which rule killed
    a document is the quantity curation debugging needs.

    Defaults are the paper's production dials (50-100k words, mean word
    length 3-10 chars, ≥2 stopwords, ≥80% alphabetic words, ≤10%
    symbol ratio); callers tune per corpus.  The paper's line-shaped
    rules (bullet/ellipsis line fractions) are omitted: they need a
    line structure the operator would have to invent for single-line
    text.  Symbol ratio counts ``#`` and ``…`` characters by
    length-difference — exact on any engine, no regex.

    All statistics are INTEGER arithmetic end to end (the
    :func:`quality_score` half-ulp lesson): milli-scaled via
    ``(1000*x) div n``, so the DuckDB twin (``//``) compares exactly.
    One narrow projection — no shuffle, no UDF, free rider on any
    corpus scan at 100 TB.
    """
    stop_list = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    stats = df.selectExpr(
        "*",
        "size(split(text, ' ')) AS n_words",
        "length(replace(text, ' ', '')) AS _n_chars_in_words",
        f"size(filter(split(text, ' '), t -> t IN ({stop_list}))) AS n_stop",
        # \A..\z, not ^..$: Java's $ matches BEFORE a trailing line
        # terminator, so a token like 'word\n' would count alphabetic
        # here while DuckDB's regexp_full_match refuses it — a
        # cross-engine hash divergence on any corpus with embedded
        # newlines (the BPE tier's trainable-word filter idiom)
        "size(filter(split(text, ' '), t -> t rlike '\\\\A[a-zA-Z]+\\\\z'))"
        " AS _n_alpha",
        "length(text) - length(replace(text, '#', ''))"
        " + length(text) - length(replace(text, '…', '')) AS _n_symbols",
    ).selectExpr(
        "*",
        "CAST((1000 * _n_chars_in_words) div greatest(n_words, 1)"
        " AS BIGINT) AS wlen_milli",
        "CAST((1000 * _n_alpha) div greatest(n_words, 1) AS BIGINT)"
        " AS alpha_milli",
        "CAST((1000 * _n_symbols) div greatest(n_words, 1) AS BIGINT)"
        " AS symbol_milli",
    )
    gated = stats.select(
        *[c for c in stats.columns if not c.startswith("_")],
        (F.col("n_words").between(min_words, max_words)).alias("pass_words"),
        (F.col("wlen_milli").between(min_wlen_milli, max_wlen_milli)).alias(
            "pass_wlen"
        ),
        (F.col("n_stop") >= min_stop).alias("pass_stop"),
        (F.col("alpha_milli") >= min_alpha_milli).alias("pass_alpha"),
        (F.col("symbol_milli") <= max_symbol_milli).alias("pass_symbol"),
    )
    return gated.withColumn(
        "pass_all",
        F.col("pass_words")
        & F.col("pass_wlen")
        & F.col("pass_stop")
        & F.col("pass_alpha")
        & F.col("pass_symbol"),
    )


def bpe_ish_token_count(df: DataFrame, max_piece: int = 4) -> DataFrame:
    """Subword-unit count: each word contributes ceil(len/max_piece) pieces —
    a deterministic BPE-style stand-in (SURVEY.md X4 'token counting')."""
    toks = tokens("text")
    pieces = F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / F.lit(float(max_piece)))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        pieces.alias("n_pieces"),
    )


def _token_value(expr: str) -> str:
    """SQL sub-expression: cheap deterministic per-token value shared with the
    DuckDB oracle (length*31 + first-char*7 + last-char)."""
    return (
        f"(length({expr}) * 31 + ascii(substring({expr}, 1, 1)) * 7"
        f" + ascii(substring({expr}, -1, 1)))"
    )


def fingerprint_expr() -> F.Column:
    """THE rolling-hash content fingerprint over the ``text`` column —
    fold(tokens, 0, (acc, t) -> (acc*131 + value(t)) mod 1e9+7), an
    order-sensitive hash computable identically in any SQL engine (the
    per-token value uses only length/first/last chars so an oracle can
    reproduce it without a shared hash library). Single definition shared
    by every consumer (fingerprint, dataset_split, corpus curation,
    mixture sampling); the DuckDB twin is
    queries/oracle_sql_helpers.fingerprint_sql.
    """
    return F.expr(
        "aggregate(split(text, ' '), CAST(0 AS BIGINT), "
        f"(acc, t) -> (acc * {FP_BASE} + {_token_value('t')}) % {MOD})"
    )


def fingerprint(df: DataFrame) -> DataFrame:
    """Rolling polynomial hash over the token stream (document fingerprint);
    see :func:`fingerprint_expr` for the formula."""
    return df.select("doc_id", fingerprint_expr().alias("fingerprint"))


def _rolling_hash_expr(list_sql: str) -> str:
    """SQL sub-expression: the shared rolling hash folded over an arbitrary
    token-array expression (the :func:`fingerprint_expr` formula,
    parameterized so chunk/prefix consumers cannot drift from the
    whole-document fingerprint). DuckDB twin:
    queries/oracle_sql_helpers.list_rolling_hash_sql."""
    return (
        f"aggregate({list_sql}, CAST(0 AS BIGINT), "
        f"(acc, t) -> (acc * {FP_BASE} + {_token_value('t')}) % {MOD})"
    )


def chunk_windows(
    df: DataFrame, size: int = 64, stride: int = 48, keep_tokens: bool = False
) -> DataFrame:
    """RAG/training-prep chunking: overlapping ``size``-token windows every
    ``stride`` tokens, with per-chunk offsets and content hash.

    Pure narrow transform — split, ``sequence`` of window starts,
    ``posexplode``, per-chunk ``slice`` + rolling hash; zero shuffles, and
    output volume is bounded at ~size/stride × the corpus (1.33× at the
    64/48 default), so the op scales exactly like a projection. The final
    window is allowed to be short (slice clamps at the end of the doc) —
    chunk boundaries are a pure function of the token count, so
    re-ingestion reproduces identical chunk ids and hashes.

    ``stride`` must not exceed ``size``: full coverage (every token in at
    least one chunk) is the chunking contract, and stride > size would
    silently drop the tokens between windows (found by
    tests/test_properties.py::test_chunk_windows_cover_and_reconstruct).
    """
    if not 1 <= stride <= size:
        raise ValueError(
            f"stride must be in [1, size] for full coverage, got "
            f"stride={stride} size={size}"
        )
    chunk = f"slice(toks, start_tok + 1, {size})"
    cols = [
        F.col("doc_id"),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(F.expr(chunk)).cast("long").alias("n_toks"),
        F.expr(_rolling_hash_expr(chunk)).alias("chunk_hash"),
    ]
    if keep_tokens:
        # downstream per-chunk featurization (e.g. the RAG bucket index)
        # needs the token array itself, not just its hash
        cols.append(F.expr(chunk).alias("chunk"))
    return (
        df.select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.posexplode(F.expr(f"sequence(0, size(toks) - 1, {stride})")).alias(
                "chunk_id", "start_tok"
            ),
        )
        .select(*cols)
    )


def prefix_duplicate_clusters(df: DataFrame, prefix_len: int = 16) -> DataFrame:
    """Boilerplate / partial-duplicate detection: documents sharing an
    identical first-``prefix_len``-token prefix hash, as
    (prefix_hash, doc_id, cluster_size) rows for clusters of ≥2 docs.

    The complement of whole-document exact dedup: mirrors (a prefix is a
    weaker key than the full fingerprint) how template boilerplate is
    found in web corpora. Shape: groupBy-count on the hash (map-side
    partial aggregation — the shuffle carries distinct hashes, not doc
    rows), filter to sizes ≥2, then join the slim (doc_id, hash)
    projection back. Duplicate-prefix clusters are a small fraction of a
    real corpus, so the filtered count table is broadcast-eligible and
    AQE plans the join shuffle-free; a count *window* instead would
    shuffle every doc row with no partial aggregation. The per-doc hash
    is a narrow fold over the first ``prefix_len`` tokens only.
    """
    prefix = f"slice(split(text, ' '), 1, {prefix_len})"
    hashed = df.select(
        "doc_id", F.expr(_rolling_hash_expr(prefix)).alias("prefix_hash")
    )
    clusters = (
        hashed.groupBy("prefix_hash")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .filter(F.col("cluster_size") >= 2)
    )
    return hashed.join(clusters, "prefix_hash").select(
        "prefix_hash", "doc_id", "cluster_size"
    )


def word_frequency(df: DataFrame, top_k: int = 20) -> DataFrame:
    """Global token frequency, deterministic top-k (count desc, token asc).

    explode → groupBy(token) is the canonical shuffle-with-combiner shape;
    TakeOrderedAndProject caps the result without a global sort.
    """
    return (
        df.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(top_k)
    )


def dup_span_coverage(df: DataFrame, w: int = 8) -> DataFrame:
    """Per-document exact duplicated-span coverage: the fraction (integer
    permille) of each document's tokens covered by a ``w``-token span
    that occurs verbatim in at least one OTHER document — the statistic
    behind exact substring deduplication (Lee et al., ACL 2022),
    re-expressed at fixed width so it is joins + aggregations instead of
    a suffix array.

    Plan: constant ×w span explode of the token stream → ONE shuffle on
    shingle where min/max window aggregates flag cross-document spans
    (``min(doc_id) != max(doc_id)`` ⟺ distinct-doc count ≥ 2 — no set
    buffering, no countDistinct) → interval union as a sweep-line window,
    not an explode. Because every span has the same width ``w`` and spans
    arrive sorted by start inside a doc, the union length is exactly
    ``w + Σ min(w, pos − prev_pos)`` — one ``lag`` window partitioned by
    doc_id over |covered spans| rows, then a groupBy on the SAME key (no
    extra exchange). The earlier shape exploded each covered span into
    ``w`` token indices and distinct-ed them: ×w the rows (188 M at the
    sf10 tile) through two extra shuffles, for numbers this window
    derives in place — measured 220 s → 84 s at sf10 for identical
    output (the remaining cost is the unavoidable shingle-keyed sort of
    the span explode itself). Every shuffle keys on shingle or doc_id hashes; no all-pairs
    stage. Documents shorter than ``w`` tokens have zero duplicated
    coverage by definition.
    """
    tt = df.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id", "toks", F.size("toks").alias("n_tokens")
    )
    spans = tt.filter(F.col("n_tokens") >= w).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, n_tokens - {w}), "
                f"i -> array_join(slice(toks, i + 1, {w}), ' '))"
            )
        ).alias("pos", "shingle"),
    )
    wsh = Window.partitionBy("shingle")
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    covered = (
        spans.withColumn("_mn", F.min("doc_id").over(wsh))
        .withColumn("_mx", F.max("doc_id").over(wsh))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("doc_id", "pos")
        # fixed-width sweep: spans are unique per (doc_id, pos) by
        # construction (posexplode), so with a fixed width the union of
        # [pos, pos+w) intervals is w for the first span plus the gap
        # capped at w for each subsequent one
        .withColumn("_prev", F.lag("pos").over(wdoc))
        .select(
            "doc_id",
            F.when(F.col("_prev").isNull(), F.lit(w))
            .otherwise(F.least(F.lit(w), F.col("pos") - F.col("_prev")))
            .alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("dup_tokens"))
    )
    return (
        tt.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"))
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            F.expr("(coalesce(dup_tokens, 0) * 1000) div n_tokens").alias(
                "dup_permille"
            ),
        )
    )


def _cross_doc_keys(
    rows: DataFrame, key: str, with_first_pos: bool = False
) -> DataFrame:
    """Distinct ``key`` values occurring in ≥2 distinct doc_ids, as
    (key, _mn) where ``_mn`` is the lowest doc_id containing the key;
    ``with_first_pos`` adds ``_mnk`` = min (doc_id, p) struct — the
    single earliest occurrence, for the keep-one witness policy (the
    input must carry a position column ``p``).

    This is the skew-immune form of the cross-doc test: ``groupBy(key)``
    gets map-side partial aggregation (a gram occurring 10 M times
    collapses to one partial row per input partition before the
    exchange), where the previous ``Window.partitionBy(key)`` min/max
    materialized every occurrence of a key in ONE task — the exact hot
    spot a boilerplate-heavy corpus (the very thing substring dedup
    exists for, Lee et al. §5) would hit at 100 TB.  Callers equi-join
    the result back to the occurrence stream; a hot key in that join is
    N rows × 1 row, which AQE's skew split handles, unlike a hot window
    partition, which nothing does.
    """
    aggs = [F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx")]
    if with_first_pos:
        aggs.append(F.min(F.struct("doc_id", "p")).alias("_mnk"))
    cols = [key, "_mn"] + (["_mnk"] if with_first_pos else [])
    return (
        rows.groupBy(key)
        .agg(*aggs)
        .filter(F.col("_mn") != F.col("_mx"))
        .select(*cols)
    )


def _keep_filter(dup: DataFrame, keep: str) -> DataFrame:
    """Apply the witness policy to cross-doc duplicated occurrences.

    ``keep="all"``: every occurrence of a duplicated window is reported
    (so the cut step removes the content from the corpus entirely).
    ``keep="first"``: the single EARLIEST occurrence per duplicated
    window — min (doc_id, p), the first position in the lowest doc_id —
    is exempt, so exactly one copy of the duplicated content survives a
    subsequent cut: Lee et al. (ACL 2022)'s keep-one-occurrence policy,
    exact.  (Until round 8 this exempted EVERY occurrence inside the
    witness document, letting that document's own internal repeats
    survive — strictly more lenient than the paper.)  Requires ``_mnk``
    (the per-key min (doc_id, p) struct) on the input and drops it.
    """
    if keep == "first":
        dup = dup.filter(F.struct("doc_id", "p") != F.col("_mnk"))
    elif keep != "all":
        raise ValueError(f"keep must be 'all' or 'first', got {keep!r}")
    return dup.select("doc_id", "p")


def exact_substring_spans(
    df: DataFrame,
    min_len: int = 10,
    hash_prune: bool = True,
    keep: str = "all",
) -> DataFrame:
    """Maximal cross-document duplicated token spans — the exact
    substring-dedup tier of Lee et al. (ACL 2022), who cut every span of
    ≥50 tokens occurring verbatim elsewhere in the corpus, located with
    a monolithic suffix array. This is the same duplicated-span
    discovery on DataFrame algebra via the standard window reduction: a
    token position lies inside a cross-doc duplicated substring of
    length ≥ L **iff** it is covered by some cross-doc-duplicated
    L-token sliding window, so the maximal duplicated spans are exactly
    the contiguous runs of duplicated-window coverage — the
    suffix-array pass collapses to one equi-shuffle on the window key
    plus a per-doc sweep. Unlike :func:`dup_span_coverage` (which
    reports per-doc covered-token TOTALS at fixed width), this returns
    the span EXTENTS — (doc_id, span_start 1-based, span_len), the
    actual cut list a Lee-style dedup pass consumes, with spans of
    unbounded length (maximality in the run direction, not the window
    width).

    ``keep="all"`` (default) lists every occurrence of duplicated
    content; ``keep="first"`` exempts the single earliest occurrence
    (min (doc_id, p)) per duplicated window, so a cut driven by the
    list leaves exactly one copy in the corpus — the paper's
    keep-one-occurrence policy, exact (r8; see :func:`_keep_filter`).

    Scale path (``hash_prune=True``): the corpus-wide shuffle carries
    8-byte ``xxhash64`` window keys instead of L-token strings (the
    shuffle-volume problem that pushes single-node implementations to
    suffix arrays); hash-duplicated positions — a small fraction of any
    organic corpus — are then VERIFIED by re-deriving the actual gram
    strings for candidates only (one bounded equi-join back to the
    token arrays) and re-grouping on the string, so a 64-bit collision
    can never fabricate a span: the output is exact, the full-width
    strings only ever shuffle for candidates. ``hash_prune=False``
    ships gram strings directly — the oracle-shaped plan, fine at
    fixture scale, quoted here because an external SQL engine has no
    xxhash64.

    Both shuffles key on window content (hash or string) and doc_id —
    no all-pairs stage; the cross-doc test is a partial-aggregating
    ``groupBy`` + join-back (see :func:`_cross_doc_keys` for why not a
    window); the sweep is one lag + one running-sum window partitioned
    by doc_id.
    """
    L = int(min_len)
    if L < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    tt = df.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("n_tokens"))
    grams = tt.filter(F.col("n_tokens") >= L).select(
        "doc_id",
        F.explode(F.expr(f"sequence(1, n_tokens - {L} + 1)")).alias("p"),
        F.expr(f"array_join(slice(toks, p, {L}), ' ')").alias("gram"),
    )
    if hash_prune:
        seeds = grams.select("doc_id", "p", F.xxhash64("gram").alias("h"))
        cand = seeds.join(
            _cross_doc_keys(seeds, "h").select("h"), "h"
        ).select("doc_id", "p")
        # exact verify: re-derive gram strings for CANDIDATES only
        # (equi-join on doc_id against the token arrays) and re-apply the
        # cross-doc test on the real string — hash collisions die here;
        # the keep policy is decided here too, on string-exact groups
        verif = cand.join(tt.select("doc_id", "toks"), "doc_id").select(
            "doc_id",
            "p",
            F.expr(f"array_join(slice(toks, p, {L}), ' ')").alias("gram"),
        )
        wf = keep == "first"
        dup = _keep_filter(
            verif.join(_cross_doc_keys(verif, "gram", with_first_pos=wf), "gram"),
            keep,
        )
    else:
        wf = keep == "first"
        dup = _keep_filter(
            grams.join(_cross_doc_keys(grams, "gram", with_first_pos=wf), "gram"),
            keep,
        )
    return _coverage_spans(dup, L)


def _coverage_spans(dup: DataFrame, L: int) -> DataFrame:
    """Contiguous coverage runs over duplicated window positions
    (doc_id, p) → maximal spans (doc_id, span_start, span_len): windows
    [p, p+L) touch or overlap exactly when the position gap is <= L.
    One lag + one running-sum window, both partitioned by doc_id —
    per-doc bounded, never a global sort."""
    wd = Window.partitionBy("doc_id").orderBy("p")
    wrun = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        dup.withColumn("_prev", F.lag("p").over(wd))
        .withColumn(
            "_brk",
            F.when(
                F.col("_prev").isNull() | (F.col("p") - F.col("_prev") > L),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_island", F.sum("_brk").over(wrun))
        .groupBy("doc_id", "_island")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max("p") + L - F.min("p")).cast("long").alias("span_len"),
        )
        .select("doc_id", "span_start", "span_len")
    )


def _apply_cut(df: DataFrame, spans: DataFrame, L: int) -> DataFrame:
    """Remove every token covered by ``spans`` from ``df`` (doc_id,
    text); returns (doc_id, n_tokens, n_cut, clean_text).  The shared
    apply kernel of :func:`substring_cut_corpus` and
    :func:`substring_cut_fixpoint`.

    ``spans`` must be merged-maximal coverage runs — DISJOINT and
    in-bounds per document (:func:`_coverage_spans` output, which is
    what both callers supply): ``n_cut`` sums span lengths and the
    stitcher below assumes non-overlapping sorted runs.

    Plan (r12 rewrite, guide §2.4/§8): the span list is a doc-level
    DECISION table — tiny next to the token stream — so the cut is
    applied as ONE narrow array expression after a doc-scale join:
    spans collapse to a per-doc list (span-scale groupBy), join back on
    doc_id, and ``clean_text`` is stitched from the KEPT gaps between
    sorted spans with ``slice``/``array_join`` — a single pass over the
    span list that re-slices the token array in place.  The previous
    form exploded every covered index, posexploded the whole corpus to
    (doc_id, idx, tok) rows, anti-joined on (doc_id, idx), and
    re-assembled with a corpus-wide collect_list groupBy — TWO
    token-scale shuffles whose every decision was already determined
    doc-locally.  Both shuffles are gone; the heavy token payload now
    never crosses an exchange (the §8 rule: move heavy bytes zero
    times when the decision data is small).
    """
    span_lists = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_len")).alias("_spans")
    )
    tt = df.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id", "toks", F.size("toks").alias("n_tokens")
    )
    # spans are disjoint and in-bounds, so cut tokens = sum of span lens
    n_cut = F.coalesce(
        F.expr(
            "aggregate(_spans, CAST(0 AS BIGINT), (a, sp) -> a + sp.span_len)"
        ),
        F.lit(0).cast("long"),
    )
    # stitch the kept gaps: fold the sorted span list carrying (next
    # uncut position, kept pieces); close with the tail gap.  slice()
    # re-slices the token array without per-token rows.
    clean = F.expr(
        """
        aggregate(
          array_sort(coalesce(_spans, array())),
          named_struct('cur', 1,
                       'pieces', CAST(array() AS array<string>)),
          (acc, sp) -> named_struct(
            'cur', CAST(sp.span_start + sp.span_len AS INT),
            'pieces', IF(sp.span_start > acc.cur,
                         array_append(acc.pieces,
                           array_join(slice(toks, acc.cur,
                             CAST(sp.span_start AS INT) - acc.cur), ' ')),
                         acc.pieces)),
          acc -> array_join(
            IF(acc.cur <= n_tokens,
               array_append(acc.pieces,
                 array_join(slice(toks, acc.cur,
                                  n_tokens - acc.cur + 1), ' ')),
               acc.pieces),
            ' '))
        """
    )
    return tt.join(span_lists, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        n_cut.alias("n_cut"),
        clean.alias("clean_text"),
    )


def substring_cut_corpus(
    df: DataFrame, min_len: int = 10, keep: str = "all"
) -> DataFrame:
    """The APPLY step of exact substring dedup (Lee et al. ACL 2022 §4:
    after locating duplicated spans, *remove* them from the corpus):
    every token covered by a cross-doc duplicated span of ≥ ``min_len``
    tokens (:func:`exact_substring_spans`) is cut; returns one row per
    input document — (doc_id, n_tokens, n_cut, clean_text), where
    ``clean_text`` is the surviving tokens re-joined in order (empty
    string when everything was duplicated).

    **Witness policy — a deliberate deviation knob.** The paper's
    ExactSubstr keeps ONE occurrence of each duplicated span in the
    corpus; ``keep="all"`` (default, and what the driver-checked
    catalog entry runs) cuts EVERY occurrence, so duplicated content
    vanishes entirely — the stricter hygiene some curation recipes
    want (e.g. suspected-contamination scrubbing).  ``keep="first"``
    reproduces the paper's keep-one policy exactly by exempting the
    single earliest occurrence — min (doc_id, p) — of each duplicated
    window: one copy survives a cut, including against the witness
    document's own internal repeats (r8 tightening; previously the
    whole witness document was exempt).  Both are exact; they differ
    only in which occurrences the span list names.

    Plan: spans → covered indices (one explode of the NON-overlapping
    merged spans, so no distinct), token stream with 1-based positions
    (one posexplode), anti-join on (doc_id, idx), then one groupBy doc_id
    re-assembling order via array_sort(collect_list(struct(idx, tok))) —
    the per-doc buffer is bounded by document length, the tier's standing
    doc-bounded premise (same class as the tokenize/chunking operators).
    All shuffles key on doc_id; linear end-to-end.

    Like the paper's own procedure this is ONE cutting pass: removal can
    splice previously-distant text into new ≥L duplicates, so exactness
    is "no span from the INPUT's cut list survives", not idempotence —
    :func:`substring_cut_fixpoint` iterates until no cross-doc span of
    ≥ L survives anywhere.
    """
    L = int(min_len)
    return _apply_cut(df, exact_substring_spans(df, min_len=L, keep=keep), L)


def substring_cut_fixpoint(
    df: DataFrame,
    min_len: int = 10,
    keep: str = "all",
    max_passes: int = 8,
) -> DataFrame:
    """Iterated :func:`substring_cut_corpus` until NO cross-doc
    duplicated span of ≥ ``min_len`` tokens survives — the closure the
    one-pass operator documents away: cutting a span can splice
    previously-distant text into a brand-new ≥L duplicate (doc
    "u1 A B u2" loses A — duplicated with some second doc — becoming
    "u1 B u2", which a third document already contains verbatim), and
    only iteration removes such splice-created duplicates.  Returns
    (doc_id, n_tokens, n_cut, clean_text) against the ORIGINAL corpus:
    ``n_cut`` counts every token removed across all passes.

    Driver-loop pattern (cf. kmeans/pagerank/connected-components):
    each pass derives the span list and materializes it while counting
    it (one fused job: lazy localCheckpoint + full count — the
    emptiness check), applies the cut, and eagerly localCheckpoints the
    shrunken corpus so lineage stays flat across passes (the
    graph-operator hygiene).  Organic corpora converge in
    1-2 passes — splicing needs a cut boundary to recreate ≥L exact
    tokens, vanishingly rare outside adversarial construction — so
    ``max_passes`` is a runaway guard, not a tuning knob; hitting it
    raises rather than returning a silently-unconverged corpus.
    """
    L = int(min_len)
    orig = df.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    cur = df.select("doc_id", "text")
    for _ in range(int(max_passes)):
        # the span list is consumed twice per pass (emptiness probe +
        # the apply's span_lists groupBy) and is tiny (merged maximal
        # runs); r12: materialize it once so the full gram/hash/verify
        # discovery pipeline runs ONCE per pass, not twice (the
        # stored-artifact rule applied to the loop's decision table).
        # r13 (guide §5): the checkpoint is LAZY and the emptiness probe
        # is a full count — one job now materializes the span list AND
        # decides convergence, where r12 ran an eager-checkpoint job
        # plus a limit(1) probe job per pass.
        spans = exact_substring_spans(
            cur, min_len=L, keep=keep
        ).localCheckpoint(eager=False)
        if spans.count() == 0:
            break
        cur = (
            _apply_cut(cur, spans, L)
            .select("doc_id", F.col("clean_text").alias("text"))
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"substring_cut_fixpoint did not converge in {max_passes} passes"
        )
    return orig.join(
        cur.select("doc_id", F.col("text").alias("clean_text")), "doc_id"
    ).select(
        "doc_id",
        "n_tokens",
        (
            F.col("n_tokens")
            - F.when(F.col("clean_text") == "", 0).otherwise(
                F.size(F.split("clean_text", " "))
            )
        )
        .cast("long")
        .alias("n_cut"),
        "clean_text",
    )


def _intra_doc_dup(rows: DataFrame, key: str, keep: str) -> DataFrame:
    """WITHIN-document duplicated-window test, skew-immune: positions
    whose ``key`` (gram string or hash) occurs at ≥2 positions in the
    SAME document.  ``groupBy(doc_id, key)`` partial-aggregates (the
    :func:`_cross_doc_keys` rationale — a page-template line repeated
    10 k times inside one scraped doc collapses map-side instead of
    pinning a window task) and equi-joins back.  ``keep="first"``
    exempts the earliest occurrence per (doc, window) so a cut leaves
    one copy; ``keep="all"`` reports every occurrence."""
    if keep not in ("first", "all"):
        raise ValueError(f"keep must be 'all' or 'first', got {keep!r}")
    keys = (
        rows.groupBy("doc_id", key)
        .agg(F.count(F.lit(1)).alias("_n"), F.min("p").alias("_mnp"))
        .filter(F.col("_n") > 1)
        .select("doc_id", key, "_mnp")
    )
    dup = rows.join(keys, ["doc_id", key])
    if keep == "first":
        dup = dup.filter(F.col("p") > F.col("_mnp"))
    return dup.select("doc_id", "p")


def intradoc_duplicate_spans(
    df: DataFrame,
    min_len: int = 10,
    hash_prune: bool = True,
    keep: str = "first",
) -> DataFrame:
    """Maximal WITHIN-document duplicated token spans — the intra-doc
    complement of :func:`exact_substring_spans`: a position is covered
    iff its L-token window occurs verbatim at ≥2 positions in the SAME
    document.  Repeated boilerplate inside a single page (nav blocks,
    pagination footers, scraper echo loops) is what the repetition
    filters of Gopher (Rae et al. 2021 §A1.1) and RefinedWeb target
    with fractions; this returns the actual EXTENTS — (doc_id,
    span_start, span_len) — so a cut can remove the repeats while
    ``keep="first"`` (default) leaves the earliest copy in place, the
    keep-one policy every intra-doc cleaner uses (cutting all copies
    would gut the document).

    Same scale shape as the cross-doc tier: ``hash_prune=True`` shuffles
    8-byte xxhash64 keys and string-verifies candidates only (collisions
    cannot fabricate a span); the duplicate test is a partial-aggregating
    ``groupBy(doc_id, key)`` + join-back (see :func:`_intra_doc_dup`);
    the sweep is the shared per-doc lag/running-sum. No stage ever keys
    on anything broader than (doc_id, window) — intra-doc dedup is
    embarrassingly doc-parallel and this plan keeps it that way.
    """
    L = int(min_len)
    if L < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    tt = df.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("n_tokens"))
    grams = tt.filter(F.col("n_tokens") >= L).select(
        "doc_id",
        F.explode(F.expr(f"sequence(1, n_tokens - {L} + 1)")).alias("p"),
        F.expr(f"array_join(slice(toks, p, {L}), ' ')").alias("gram"),
    )
    if hash_prune:
        seeds = grams.select("doc_id", "p", F.xxhash64("gram").alias("h"))
        cand = seeds.join(
            seeds.groupBy("doc_id", "h")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .select("doc_id", "h"),
            ["doc_id", "h"],
        ).select("doc_id", "p")
        # exact verify on the real strings, candidates only; the keep
        # policy is decided here, on string-exact groups
        verif = cand.join(tt.select("doc_id", "toks"), "doc_id").select(
            "doc_id",
            "p",
            F.expr(f"array_join(slice(toks, p, {L}), ' ')").alias("gram"),
        )
        dup = _intra_doc_dup(verif, "gram", keep)
    else:
        dup = _intra_doc_dup(grams, "gram", keep)
    return _coverage_spans(dup, L)


def intradoc_cut_corpus(
    df: DataFrame, min_len: int = 10, keep: str = "first"
) -> DataFrame:
    """APPLY step for intra-document repetition removal: every token
    covered by a within-doc duplicated span of ≥ ``min_len`` tokens
    (:func:`intradoc_duplicate_spans`) is cut, keeping the earliest
    occurrence per repeated window by default (``keep="first"``) —
    returns (doc_id, n_tokens, n_cut, clean_text) over the full corpus,
    exactly :func:`substring_cut_corpus`'s contract but doc-local.
    Shares :func:`_apply_cut`: one span explode + token posexplode +
    (doc_id, idx) anti-join + doc-bounded reassembly — linear, every
    shuffle doc_id-keyed, trivially partition-parallel at 100 TB since
    no stage crosses document boundaries.
    """
    L = int(min_len)
    return _apply_cut(df, intradoc_duplicate_spans(df, min_len=L, keep=keep), L)


def substring_gram_index(
    df: DataFrame, min_len: int = 10, digest: bool = False
) -> DataFrame:
    """Stored index for INCREMENTAL exact substring dedup: one row per
    distinct ``xxhash64`` L-gram key of the corpus — (h, min_doc,
    max_doc, n_pos). 8 bytes per distinct window instead of the L-token
    string (the same stored-artifact role as the LSH signature index and
    the PQ code table): at warehouse scale the index is written once per
    corpus snapshot and new batches probe it without re-shingling
    history. min/max doc ids are kept so the prober can distinguish
    "matches an older document" from "matches only itself" when batch
    and index doc-id sets overlap.

    ``digest=True`` additionally stores ``dg`` — a 16-hex-char md5
    slice of the gram string (8 more bytes/row) and groups by (h, dg),
    so two distinct grams colliding on the 64-bit key get separate
    index rows.  :func:`exact_substring_spans_incremental` with
    ``verify=True`` then requires BOTH keys to match before a
    cross-index hit counts, pushing the false-candidate odds from
    ~n²/2⁶⁴ to ~n²/2¹²⁸ — the verification the batch operator does
    with real strings, available without storing strings.
    """
    L = int(min_len)
    tt = df.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id", "toks", F.size("toks").alias("n_tokens")
    )
    grams = tt.filter(F.col("n_tokens") >= L).select(
        "doc_id",
        F.explode(F.expr(f"sequence(1, n_tokens - {L} + 1)")).alias("p"),
        F.expr(f"array_join(slice(toks, p, {L}), ' ')").alias("gram"),
    )
    keyed = grams.select(
        "doc_id",
        F.xxhash64("gram").alias("h"),
        *([F.substring(F.md5("gram"), 1, 16).alias("dg")] if digest else []),
    )
    return keyed.groupBy("h", *(["dg"] if digest else [])).agg(
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.count(F.lit(1)).alias("n_pos"),
    )


def exact_substring_spans_incremental(
    index: DataFrame,
    new_docs: DataFrame,
    min_len: int = 10,
    verify: bool = False,
) -> DataFrame:
    """Duplicated spans of a NEW document batch against (indexed corpus ∪
    the batch itself) — the incremental serving path of
    :func:`exact_substring_spans`, probing a stored
    :func:`substring_gram_index` instead of re-shingling history.

    A new-doc position is duplicated iff its L-gram key hits the index
    in a document OTHER than itself (the stored min_doc/max_doc decide:
    a hit whose only indexed occurrences are the probing doc_id is a
    self-match, which arises when a batch overlaps the indexed corpus —
    e.g. a re-drive — and must not flag the doc against its own indexed
    copy) OR at least two distinct new docs share it (the
    batch-internal min≠max test, same as the batch operator, computed
    with the same skew-immune groupBy + join-back).

    Matching is on the 64-bit key by default — the
    :func:`..dedup.minhash_signatures_hashed` trade, ~n²/2⁶⁴ collision
    odds.  ``verify=True`` (requires an index built with
    ``digest=True``) also matches the stored 64-bit md5 slice of the
    gram string, so a cross-index hit needs 128 independent bits —
    morally the batch operator's string verification without storing
    strings.  Output schema and the sweep stage match the batch
    operator; only new-batch doc_ids appear.
    """
    L = int(min_len)
    if verify and "dg" not in index.columns:
        raise ValueError(
            "verify=True needs an index built with substring_gram_index("
            "digest=True); this index has no 'dg' column"
        )
    tt = new_docs.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id", "toks", F.size("toks").alias("n_tokens")
    )
    grams = tt.filter(F.col("n_tokens") >= L).select(
        "doc_id",
        F.explode(F.expr(f"sequence(1, n_tokens - {L} + 1)")).alias("p"),
        F.expr(f"array_join(slice(toks, p, {L}), ' ')").alias("gram"),
    )
    keys = ["h", "dg"] if verify else ["h"]
    seeds = grams.select(
        "doc_id",
        "p",
        F.xxhash64("gram").alias("h"),
        *([F.substring(F.md5("gram"), 1, 16).alias("dg")] if verify else []),
    )
    # batch-internal cross-doc keys: partial-agg groupBy, never a window
    # over an unbounded key (see _cross_doc_keys)
    internal = _cross_doc_keys(seeds, "h").select(
        "h", F.lit(True).alias("_xb")
    )
    # index rows are unique per join key by construction (groupBy h
    # resp. (h, dg)), so this left join cannot multiply seed rows
    probed = (
        seeds.join(
            index.select(*keys, "min_doc", "max_doc"), keys, "left"
        )
        .join(internal, "h", "left")
        .filter(
            F.col("_xb").isNotNull()
            | (
                F.col("min_doc").isNotNull()
                & (
                    (F.col("min_doc") != F.col("doc_id"))
                    | (F.col("max_doc") != F.col("doc_id"))
                )
            )
        )
        .select("doc_id", "p")
    )
    wd = Window.partitionBy("doc_id").orderBy("p")
    wrun = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        probed.withColumn("_prev", F.lag("p").over(wd))
        .withColumn(
            "_brk",
            F.when(
                F.col("_prev").isNull() | (F.col("p") - F.col("_prev") > L),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_island", F.sum("_brk").over(wrun))
        .groupBy("doc_id", "_island")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max("p") + L - F.min("p")).cast("long").alias("span_len"),
        )
        .select("doc_id", "span_start", "span_len")
    )


#: Symbol sequences for BPE are each symbol wrapped in single underscores
#: and concatenated ('key' → '_k__e__y_'), so applying a merge is a plain
#: left-to-right non-overlapping substring replace ('_x__y_' → '_xy_') —
#: identical semantics in Java String.replace and external SQL engines'
#: replace(), and exactly greedy BPE merging (in '_a__a__a_' the first
#: two merge, the third survives). See queries/substring_ops.py for the
#: charset argument (corpus asserted [a-z]; the separator is unreachable).
BPE_SEQ_SQL = (
    "concat('_', array_join(transform(sequence(1, length(w)), "
    "i -> substr(w, i, 1)), '__'), '_')"
)

_BPE_PAIRS_SQL = (
    "transform(sequence(1, size(s) - 1), "
    "i -> concat(element_at(s, i), '|', element_at(s, i + 1)))"
)


def bpe_train_merges(df: DataFrame, n_merges: int = 4) -> DataFrame:
    """The BPE TRAINING LOOP (Sennrich et al. 2016) run for ``n_merges``
    iterations, emitting the learned merge table — (step, x, y, n_pairs):
    at each step the corpus-wide most frequent adjacent symbol pair
    (ties: count DESC, then pair string ASC — deterministic) is recorded
    and merged everywhere before recounting.  The merge table IS the
    tokenizer-training artifact (apply the rules in step order to encode
    text); ``bpe_merge_apply``'s single unrolled iteration is step 1 of
    this loop plus the next iteration's candidate report.

    Scale shape: every pass operates on the (word, count) VOCABULARY
    aggregate, never the raw token stream, so per-iteration cost is
    vocabulary-sized regardless of corpus size; the argmax is a bounded
    1-row collect per step (k rows total — the pagerank-fixpoint
    convention) because the winning pair must become a string literal in
    the next pass's replace expression; the shrinking sequence table is
    eagerly localCheckpointed per step so lineage stays flat (the
    iterative-operator hygiene).  At 100 TB only the initial vocabulary
    build touches the corpus — one groupBy(word) — and real tokenizer
    trainers run exactly this loop at k≈30000.
    """
    k = int(n_merges)
    if k < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    wc = (
        df.select(F.explode(F.split("text", " ")).alias("w"))
        .filter((F.length("w") >= 2) & F.col("w").rlike(r"\A[a-z]+\z"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    seqs = wc.select(F.expr(BPE_SEQ_SQL).alias("seq"), "n").localCheckpoint(
        eager=True
    )
    # lineage-cut cadence: adjacent per-step projections collapse into
    # one nested-replace expression (CollapseProject), the exact shape
    # bpe_encode_tokens' chunked fold runs at depth 100 inside codegen —
    # so the eager checkpoint only needs to fire every ~chunk steps, not
    # every step (r12: the per-step checkpoint DOUBLED the loop's job
    # count — 2 jobs/step — for a vocabulary-sized table whose recompute
    # since the last cut is a handful of narrow replaces; on a driver
    # loop the job count is the wall time, the pq_fit lesson).
    ckpt_every = max(1, BPE_ENCODE_CHUNK // 4)
    steps_since_ckpt = 0
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, k + 1):
        top = (
            seqs.select(
                F.split(F.expr("trim(BOTH '_' FROM seq)"), "__").alias("s"),
                "n",
            )
            .filter(F.size("s") >= 2)
            .select(F.explode(F.expr(_BPE_PAIRS_SQL)).alias("pair"), "n")
            .groupBy("pair")
            .agg(F.sum("n").alias("np"))
            .orderBy(F.desc("np"), F.asc("pair"))
            .limit(1)
            .collect()  # bounded: exactly one row per training step
        )
        if not top:
            break
        x, y = top[0]["pair"].split("|", 1)
        merges.append((step, x, y, int(top[0]["np"])))
        pat = f"_{x}__{y}_"
        rep = f"_{x}{y}_"
        seqs = seqs.select(
            F.expr(
                f"replace(seq, '{pat}', '{rep}')"
            ).alias("seq"),
            "n",
        )
        steps_since_ckpt += 1
        if steps_since_ckpt >= ckpt_every and step < k:
            # (never after the FINAL step: seqs is not read again)
            seqs = seqs.localCheckpoint(eager=True)
            steps_since_ckpt = 0
    return df.sparkSession.createDataFrame(
        merges, "step: bigint, x: string, y: string, n_pairs: bigint"
    )


#: Merge rules folded into one nested-``replace`` projection per pass.
#: Bounds the Catalyst expression-tree depth (and the generated Java
#: method size) regardless of how many rules the tokenizer has — a
#: production merge table (k≈30 000, GPT-2-class) would otherwise build
#: a 30 000-deep expression that fails analysis / whole-stage codegen
#: long before the JVM's 64 KB method limit.  100 replaces per pass is
#: comfortably inside codegen (verified with
#: ``spark.sql.codegen.factoryMode=CODEGEN_ONLY`` at k=1 200 in
#: tests/test_bpe_trainer.py) while keeping the pass count k/100 small.
BPE_ENCODE_CHUNK = 100


def bpe_encode_tokens(
    df: DataFrame,
    merges: DataFrame | None = None,
    n_merges: int = 4,
    chunk_size: int = BPE_ENCODE_CHUNK,
) -> DataFrame:
    """ENCODE the corpus with a learned BPE merge table — the apply half
    of the tokenizer tier (``bpe_train_merges`` is the train half):
    per document, the trainable-word count, character mass, and the
    number of BPE symbols after applying every merge rule in step order
    — (doc_id, n_words, n_chars, n_tokens).  n_chars/n_tokens is the
    compression ratio tokenizer training exists to maximize; with an
    empty merge table n_tokens == n_chars (every character its own
    symbol), and each applied rule can only shrink n_tokens.

    Scale shape, two regimes on the merge-table axis (k rules, always a
    bounded collect — the tokenizer artifact itself):

    - k <= chunk_size: the rules unroll into ONE nested-``replace``
      projection — a pure narrow map over the exploded word stream
      inside whole-stage codegen, no join, no vocabulary shuffle; the
      only shuffle is the final per-doc aggregate (map-side combines).
    - k > chunk_size (production tokenizers run k≈30 000): a single
      nested expression at that depth breaks Catalyst analysis and the
      64 KB codegen method limit, so instead the rules are applied to
      the DISTINCT-WORD VOCABULARY in ``chunk_size``-deep passes with an
      eager localCheckpoint between passes (flat lineage, and each pass
      is vocabulary-sized — independent of corpus size), then the
      (word → n_sym) encoding joins back to the per-(doc, word) counts.
      The join keys on the word type, AQE broadcast-sizes it when the
      vocabulary is small; encoding work is paid once per word TYPE
      rather than once per token — the standard production shape.

    Both regimes produce identical results (greedy left-to-right merge
    semantics are the trainer's own: underscore-wrapped symbols,
    non-overlapping ``replace``), so train→encode round-trips
    bit-identically; equality is pinned in tests/test_bpe_trainer.py.
    """
    if merges is None:
        merges = bpe_train_merges(df, n_merges=n_merges)
    if int(chunk_size) < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    # bounded collect: k merge rules — the tokenizer artifact itself
    rules = [
        (r["x"], r["y"]) for r in merges.orderBy("step").select("x", "y").collect()
    ]
    words = df.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter((F.length("w") >= 2) & F.col("w").rlike(r"\A[a-z]+\z"))

    def _fold(seq_sql: str, chunk: list[tuple[str, str]]) -> str:
        # charset is asserted [a-z]+ — literals are quote-safe
        for x, y in chunk:
            seq_sql = f"replace({seq_sql}, '_{x}__{y}_', '_{x}{y}_')"
        return seq_sql

    if len(rules) <= int(chunk_size):
        n_sym = F.size(
            F.split(F.expr(f"trim(BOTH '_' FROM {_fold(BPE_SEQ_SQL, rules)})"), "__")
        )
        return (
            words.select("doc_id", F.length("w").alias("nc"), n_sym.alias("n_sym"))
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_words"),
                F.sum("nc").cast("long").alias("n_chars"),
                F.sum("n_sym").cast("long").alias("n_tokens"),
            )
        )

    # large-k regime: encode each word TYPE once, join back to counts
    wdoc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        wdoc.select("w")
        .distinct()
        .select("w", F.expr(BPE_SEQ_SQL).alias("seq"))
        .localCheckpoint(eager=True)
    )
    for i in range(0, len(rules), int(chunk_size)):
        vocab = vocab.select(
            "w", F.expr(_fold("seq", rules[i : i + int(chunk_size)])).alias("seq")
        ).localCheckpoint(eager=True)
    enc = vocab.select(
        "w",
        F.size(F.split(F.expr("trim(BOTH '_' FROM seq)"), "__")).alias("n_sym"),
    )
    return (
        wdoc.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.length("w")).cast("long").alias("n_chars"),
            F.sum(F.col("cnt") * F.col("n_sym")).cast("long").alias("n_tokens"),
        )
    )


def bpe_encode_ids(
    df: DataFrame,
    merges: DataFrame | None = None,
    n_merges: int = 4,
    chunk_size: int = BPE_ENCODE_CHUNK,
) -> DataFrame:
    """ENCODE the corpus to actual TOKEN-ID SEQUENCES — the production
    completion of the tokenizer tier (``bpe_encode_tokens`` reports the
    compression stats; a training-data pipeline feeds the ids to the
    model): per document, (doc_id, n_tokens, token_ids) where
    ``token_ids`` is the space-joined ordered id sequence over the
    trainable words ([a-z]{2,}, the trainer's own filter) in their
    original document order.

    Id space (deterministic, engine-independent): a single base
    character ``c`` is ``ascii(c) - 97`` (0..25); the symbol created at
    merge step ``s`` is ``25 + s``.  Two merge rules can produce the
    same symbol STRING (e.g. (a,bc) and (ab,c) both yield 'abc' — the
    flat string form cannot distinguish the paths), so the mapping is
    per distinct string with FIRST-STEP-WINS (min id) — the same rule
    on both engines, hence hash-checkable.

    Scale shape: encoding is paid once per word TYPE, not per token —
    the merge rules fold over the distinct-word vocabulary in
    ``chunk_size``-deep nested-``replace`` passes (the
    ``bpe_encode_tokens`` large-k regime, eager localCheckpoint between
    passes keeps lineage flat and every pass vocabulary-sized), the
    symbol→id attach is a broadcast join against the k-row merge
    artifact at VOCABULARY scale, and the per-(doc, pos) stream only
    ever joins the finished (word → ids) table (AQE broadcast-sizes it
    when small).  Per-doc assembly is one collect_list bounded by
    document length — the id sequence IS the requested product.
    Unknown multi-char symbols raise (they cannot occur for a merge
    table produced by ``bpe_train_merges``; raising guards contract
    drift instead of silently dropping ids from the output).
    """
    if merges is None:
        merges = bpe_train_merges(df, n_merges=n_merges)
    cs = int(chunk_size)
    if cs < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    # bounded collect: k merge rules — the tokenizer artifact itself
    rule_rows = merges.orderBy("step").select("step", "x", "y").collect()
    rules = [(r["x"], r["y"]) for r in rule_rows]
    sym_id: dict[str, int] = {}
    for r in rule_rows:
        s = r["x"] + r["y"]
        if s not in sym_id:  # first-step-wins on string collisions
            sym_id[s] = 25 + int(r["step"])

    def _fold(seq_sql: str, chunk: list[tuple[str, str]]) -> str:
        for x, y in chunk:
            seq_sql = f"replace({seq_sql}, '_{x}__{y}_', '_{x}{y}_')"
        return seq_sql

    words = df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    ).filter((F.length("w") >= 2) & F.col("w").rlike(r"\A[a-z]+\z"))

    vocab = words.select("w").distinct().select(
        "w", F.expr(BPE_SEQ_SQL).alias("seq")
    )
    multi_pass = len(rules) > cs
    if multi_pass:
        vocab = vocab.localCheckpoint(eager=True)
    for i in range(0, len(rules), cs):
        vocab = vocab.select(
            "w", F.expr(_fold("seq", rules[i : i + cs])).alias("seq")
        )
        if multi_pass:
            vocab = vocab.localCheckpoint(eager=True)

    syms = vocab.select(
        "w",
        F.posexplode(
            F.split(F.expr("trim(BOTH '_' FROM seq)"), "__")
        ).alias("sp", "sym"),
    )
    if sym_id:
        symdf = df.sparkSession.createDataFrame(
            sorted(sym_id.items()), "sym: string, id: bigint"
        )
        syms = syms.join(F.broadcast(symdf), "sym", "left")
    else:
        syms = syms.withColumn("id", F.lit(None).cast("bigint"))
    tid = (
        F.when(F.length("sym") == 1, (F.ascii("sym") - 97).cast("bigint"))
        .when(F.col("id").isNotNull(), F.col("id"))
        .otherwise(
            F.expr(
                "raise_error(concat('bpe_encode_ids: symbol not in merge "
                "table: ', sym))"
            ).cast("bigint")
        )
    )
    wenc = (
        syms.select("w", "sp", tid.alias("tid"))
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sym"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "sp", F.col("tid").cast("string").alias("t")
                            )
                        )
                    ),
                    lambda x: x["t"],
                ),
                " ",
            ).alias("wids"),
        )
    )
    return (
        words.join(wenc, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("n_sym").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "wids"))),
                    lambda x: x["wids"],
                ),
                " ",
            ).alias("token_ids"),
        )
    )


def bpe_decode_ids(
    df: DataFrame,
    merges: DataFrame,
    ids_col: str = "token_ids",
    out_col: str = "decoded",
) -> DataFrame:
    """DECODE token-id sequences back to text — the inverse of
    ``bpe_encode_ids``, closing the tokenizer loop (train → encode →
    pack → DECODE): adds ``out_col``, the concatenation of the symbol
    strings the ids name, to every row of ``df``.

    Id space is the encoder's own: 0..25 are the base characters
    (``chr(97 + id)``); id ``25 + s`` is the symbol string created at
    merge step ``s``.  String collisions in the merge table are
    first-step-wins on the ENCODE side, so only the winning (minimum)
    id per symbol string can appear in encoder output — the inverse
    keeps exactly those ids and an unknown id raises (mirroring the
    encoder's unknown-symbol guard: garbage input should fail loudly,
    not decode to silently wrong text).

    Scale shape: the id→symbol table is the tokenizer artifact itself
    (k + 26 entries, bounded) baked into the plan as ONE flat
    ``map_from_arrays`` literal — two array literals, no nested
    expression depth at production k — so decoding is a purely NARROW
    ``transform`` + ``concat_ws`` projection inside whole-stage
    codegen: no join, no shuffle, no explode.  Decoding a 100 TB packed
    corpus is a map-only stage.

    Losslessness caveat (by construction of the encoder): word
    boundaries are not represented in the id stream, so the decode of a
    document's ids equals its trainable words CONCATENATED; the
    round-trip property (``bpe_decode_roundtrip``, and the packed-batch
    split test) compares against exactly that ground truth.
    """
    # bounded collect: k merge rules — the tokenizer artifact itself
    rule_rows = merges.orderBy("step").select("step", "x", "y").collect()
    sym_id: dict[str, int] = {}
    for r in rule_rows:
        s = r["x"] + r["y"]
        if s not in sym_id:  # first-step-wins, as the encoder
            sym_id[s] = 25 + int(r["step"])
    id_sym = {v: k for k, v in sym_id.items()}
    for i in range(26):
        id_sym[i] = chr(97 + i)
    ids_sorted = sorted(id_sym)
    lut = F.map_from_arrays(
        F.lit([str(i) for i in ids_sorted]),
        F.lit([id_sym[i] for i in ids_sorted]),
    )

    def to_sym(t: F.Column) -> F.Column:
        return F.when(
            F.element_at(lut, t).isNotNull(), F.element_at(lut, t)
        ).otherwise(
            F.raise_error(
                F.concat(F.lit("bpe_decode_ids: unknown token id: "), t)
            ).cast("string")
        )

    toks = F.split(F.col(ids_col), " ")
    decoded = F.concat_ws(
        "",
        F.transform(toks, lambda t: to_sym(t)),
    )
    return df.withColumn(
        out_col,
        F.when(F.col(ids_col) == "", F.lit("")).otherwise(decoded),
    )

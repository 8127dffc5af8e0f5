"""Substring-level corpus hygiene (X1/X4 extension tier): exact
duplicated-span coverage, one full BPE merge iteration, and tokenizer
vocabulary coverage.

The reference pipeline has no notion of corpus hygiene (its documents are
playlist JSON); these are the operators a training-data pipeline runs
between raw text and the tokenizer, all public algorithms:

- duplicated-span coverage is the per-document statistic behind exact
  substring deduplication (Lee et al., "Deduplicating Training Data Makes
  Language Models Better", ACL 2022 — their suffix-array dup-fraction,
  re-expressed as a fixed-width shingle statistic so it's joins +
  aggregations instead of a suffix array);
- the merge step is byte-pair encoding's training loop (Sennrich et al.
  2016), one full iteration: count pairs, pick the argmax merge, apply it
  corpus-wide, recount — the part `bpe_pair_counts` (quality_ops.py) only
  does the first third of;
- OOV rate against a frequency-built vocabulary is the standard tokenizer
  coverage report.

Everything is built-ins over (word, count) / (shingle, count) aggregates —
shuffles carry vocabulary-sized or shingle-sized keys, never all-pairs,
and nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_fixture
from .catalog import register

#: Span width for exact-duplicate coverage. The production value in the
#: suffix-array literature is ~50 tokens; the synthetic corpus plants
#: duplicated passages ≥8 tokens long (W=8 and W=5 find almost the same
#: spans, so 8 is already in the plateau where random word-bag collisions
#: have died out and only planted duplicates remain).
SPAN_W = 8

#: Vocabulary size for the OOV report. The synthetic corpus has 31
#: distinct words; 10 keeps a real OOV tail so the statistic is exercised,
#: not rubber-stamped.
VOCAB_V = 10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_fixture(spark, sf_dir, "documents")


#: Minimum duplicated-substring length (tokens) for the exact-span tier.
#: Lee et al. cut at 50 tokens on real corpora; 10 keeps the synthetic
#: fixture's duplicated tails (~2K duplicated windows at sf0.01) exercising
#: every stage while staying beyond the fixed SPAN_W=8 coverage width.
SPAN_MIN_LEN = 10


def span_ctes(src: str = "documents") -> str:
    """Shared CTE chain deriving the maximal cross-doc duplicated spans
    (doc_id, span_start, span_len) at L=SPAN_MIN_LEN over ``src`` —
    one definition so the span-extent entry, the cut-apply entry, and
    the end-to-end capstone cannot drift (the _semdedup_oracle
    convention). Ends with the `spans` CTE; callers append their own
    final SELECT (and extra CTEs after it)."""
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}),
    tt AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM t),
    g AS (
      SELECT doc_id, unnest(range(1, n_tokens - {SPAN_MIN_LEN} + 2)) AS p,
             toks
      FROM tt WHERE n_tokens >= {SPAN_MIN_LEN}
    ),
    grams AS (
      SELECT doc_id, p,
             array_to_string(list_slice(toks, p, p + {SPAN_MIN_LEN} - 1),
                             ' ') AS gram
      FROM g
    ),
    dup AS (
      SELECT doc_id, p FROM (
        SELECT doc_id, p,
               MIN(doc_id) OVER (PARTITION BY gram) AS mn,
               MAX(doc_id) OVER (PARTITION BY gram) AS mx
        FROM grams) WHERE mn <> mx
    ),
    brk AS (
      SELECT doc_id, p,
             CASE WHEN LAG(p) OVER w IS NULL
                       OR p - LAG(p) OVER w > {SPAN_MIN_LEN}
                  THEN 1 ELSE 0 END AS b
      FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY p)
    ),
    isl AS (
      SELECT doc_id, p,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY p) AS island
      FROM brk
    ),
    spans AS (
      SELECT doc_id,
             CAST(MIN(p) AS BIGINT) AS span_start,
             CAST(MAX(p) + {SPAN_MIN_LEN} - MIN(p) AS BIGINT) AS span_len
      FROM isl GROUP BY doc_id, island
    )
"""


_SPAN_CTES = span_ctes()


@register(
    "dedup_exact_substring_spans",
    oracle=_SPAN_CTES + "SELECT doc_id, span_start, span_len FROM spans",
    survey="X29",
    doc="Exact substring dedup, span-extent tier (Lee et al. ACL 2022): "
    "maximal cross-document duplicated token spans as (doc_id, "
    f"span_start, span_len) with threshold L={SPAN_MIN_LEN} — the "
    "actual cut list a Lee-style dedup pass consumes, completing the "
    "tier beyond dup_span_coverage's fixed-width per-doc totals. "
    "Window reduction replaces the suffix array: duplicated-substring "
    "membership == duplicated-L-window coverage, so the plan is one "
    "shuffle on the window key + a per-doc lag/running-sum sweep; the "
    "operator's production path shuffles 8-byte xxhash64 keys and "
    "exactly verifies only candidates (hash_prune=True), while the "
    "oracle mirrors the direct string-keyed plan the equivalence test "
    "pins to it.",
)
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import exact_substring_spans

    return exact_substring_spans(
        _docs(spark, sf_dir), min_len=SPAN_MIN_LEN, hash_prune=True
    )


@register(
    "dedup_substring_cut",
    oracle=_SPAN_CTES + """,
    cov AS (
      SELECT doc_id, unnest(range(span_start, span_start + span_len)) AS idx
      FROM spans
    ),
    tok AS (
      SELECT doc_id, unnest(range(1, len(toks) + 1)) AS idx, toks FROM tt
    ),
    tok2 AS (SELECT doc_id, idx, toks[idx] AS tok FROM tok),
    kept AS (SELECT tok2.* FROM tok2 ANTI JOIN cov USING (doc_id, idx)),
    clean AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(tok, ' ' ORDER BY idx) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT tt.doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens - COALESCE(n_kept, 0) AS BIGINT) AS n_cut,
           COALESCE(clean_text, '') AS clean_text
    FROM tt LEFT JOIN clean USING (doc_id)
    """,
    survey="X29",
    doc="The APPLY step of exact substring dedup (Lee et al. §4): every "
    "token covered by a cross-doc duplicated span from "
    "dedup_exact_substring_spans' cut list is removed; emits the full "
    "cleaned corpus — (doc_id, n_tokens, n_cut, clean_text), "
    "clean_text value-hash-checked verbatim. One explode of the merged "
    "(non-overlapping) spans + one token posexplode + an anti-join on "
    "(doc_id, idx) + one doc-bounded reassembly groupBy — linear, every "
    "shuffle keyed on doc_id. Single cutting pass like the paper "
    "(removal can splice new duplicates; iterate for a fixpoint).",
)
def dedup_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import substring_cut_corpus

    return substring_cut_corpus(_docs(spark, sf_dir), min_len=SPAN_MIN_LEN)


#: Window width for the INTRA-document tier. The synthetic corpus plants
#: its duplicates across documents, so within-doc verbatim repeats only
#: survive down at L=4 (measured: the fixture has a handful of 4-token
#: self-repeats and none at ≥5) — the entry runs where the data is;
#: production corpora run the same operator at the cross-doc L.
INTRA_L = 4

def intra_ctes(src: str = "documents") -> str:
    """Shared CTE chain for the intra-doc tier over ``src``: maximal
    WITHIN-document duplicated spans at L=INTRA_L with the keep-first
    witness exemption (p > mnp — the earliest occurrence per (doc,
    gram) survives a cut). Ends with `ispans`; callers append their
    final SELECT / extra CTEs."""
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}),
    tt AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM t),
    g AS (
      SELECT doc_id, unnest(range(1, n_tokens - {INTRA_L} + 2)) AS p,
             toks
      FROM tt WHERE n_tokens >= {INTRA_L}
    ),
    grams AS (
      SELECT doc_id, p,
             array_to_string(list_slice(toks, p, p + {INTRA_L} - 1),
                             ' ') AS gram
      FROM g
    ),
    idup AS (
      SELECT doc_id, p FROM (
        SELECT doc_id, p,
               COUNT(*) OVER (PARTITION BY doc_id, gram) AS nocc,
               MIN(p) OVER (PARTITION BY doc_id, gram) AS mnp
        FROM grams) WHERE nocc > 1 AND p > mnp
    ),
    ibrk AS (
      SELECT doc_id, p,
             CASE WHEN LAG(p) OVER w IS NULL
                       OR p - LAG(p) OVER w > {INTRA_L}
                  THEN 1 ELSE 0 END AS b
      FROM idup WINDOW w AS (PARTITION BY doc_id ORDER BY p)
    ),
    iisl AS (
      SELECT doc_id, p,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY p) AS island
      FROM ibrk
    ),
    ispans AS (
      SELECT doc_id,
             CAST(MIN(p) AS BIGINT) AS span_start,
             CAST(MAX(p) + {INTRA_L} - MIN(p) AS BIGINT) AS span_len
      FROM iisl GROUP BY doc_id, island
    )
"""


_INTRA_CTES = intra_ctes()


def cleaned_corpus_ctes(spans: str, src: str) -> str:
    """The cut-APPLY tail as reusable CTEs: removes every token covered
    by a span from ``{spans}`` and reassembles the cleaned corpus as
    ``cdocs`` (doc_id, lang, text) — the fragment the quality-mix
    capstone hash-checks, parameterized so the end-to-end chain applies
    it after BOTH the intra-doc and the cross-doc span derivations.
    Expects the caller's chain to already define ``tt`` (doc_id, toks)
    over the same corpus and ``{src}`` to carry (doc_id, lang)."""
    return f""",
    cov AS (
      SELECT doc_id, unnest(range(span_start, span_start + span_len)) AS idx
      FROM {spans}
    ),
    tok AS (
      SELECT doc_id, unnest(range(1, len(toks) + 1)) AS idx, toks FROM tt
    ),
    tok2 AS (SELECT doc_id, idx, toks[idx] AS tok FROM tok),
    kept0 AS (SELECT tok2.* FROM tok2 ANTI JOIN cov USING (doc_id, idx)),
    clean AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text
      FROM kept0 GROUP BY doc_id
    ),
    cdocs AS (
      SELECT tt.doc_id, d.lang, COALESCE(clean.clean_text, '') AS text
      FROM tt JOIN {src} d USING (doc_id)
      LEFT JOIN clean USING (doc_id)
    )"""


@register(
    "dedup_intradoc_spans",
    oracle=_INTRA_CTES + "SELECT doc_id, span_start, span_len FROM ispans",
    survey="X30",
    doc="Maximal WITHIN-document duplicated token spans — the intra-doc "
    "complement of the cross-doc X29 tier: positions whose L-window "
    "repeats verbatim inside the SAME document (page-template "
    "boilerplate, scraper echo loops — the Gopher/RefinedWeb "
    "repetition-filter target), as span EXTENTS with the earliest "
    f"occurrence exempted (keep-one policy). L={INTRA_L} because the "
    "synthetic corpus plants duplicates across docs, not within. "
    "Skew-immune duplicate test (partial-agg groupBy(doc_id, key) + "
    "join-back), hash-pruned 8-byte shuffle with string verification of "
    "candidates only; embarrassingly doc-parallel — no stage keys "
    "broader than (doc_id, window).",
)
def dedup_intradoc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import intradoc_duplicate_spans

    return intradoc_duplicate_spans(
        _docs(spark, sf_dir), min_len=INTRA_L, hash_prune=True, keep="first"
    )


@register(
    "dedup_intradoc_cut",
    oracle=_INTRA_CTES + """,
    cov AS (
      SELECT doc_id, unnest(range(span_start, span_start + span_len)) AS idx
      FROM ispans
    ),
    tok AS (
      SELECT doc_id, unnest(range(1, len(toks) + 1)) AS idx, toks FROM tt
    ),
    tok2 AS (SELECT doc_id, idx, toks[idx] AS tok FROM tok),
    kept AS (SELECT tok2.* FROM tok2 ANTI JOIN cov USING (doc_id, idx)),
    clean AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(tok, ' ' ORDER BY idx) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT tt.doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens - COALESCE(n_kept, 0) AS BIGINT) AS n_cut,
           COALESCE(clean_text, '') AS clean_text
    FROM tt LEFT JOIN clean USING (doc_id)
    """,
    survey="X30",
    doc="APPLY step for intra-document repetition removal: tokens "
    "covered by a within-doc duplicated span are cut, keeping the "
    "earliest occurrence per repeated window; emits the full cleaned "
    "corpus (doc_id, n_tokens, n_cut, clean_text), clean_text "
    "value-hash-checked verbatim — dense per-document output, so the "
    "oracle exercises corpus reassembly even where self-repeats are "
    "sparse. Shares the cut kernel with the X29 tier: span explode + "
    "token posexplode + (doc_id, idx) anti-join + doc-bounded "
    "reassembly, every shuffle doc_id-keyed.",
)
def dedup_intradoc_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import intradoc_cut_corpus

    return intradoc_cut_corpus(_docs(spark, sf_dir), min_len=INTRA_L)


def _cut_pass_ctes(src: str, pfx: str, keep: str = "all") -> str:
    """One substring-cut pass as a CTE chain: relation ``src`` (doc_id,
    text) → ``{pfx}clean`` (doc_id, text with every token covered by a
    cross-doc ≥L span removed).  ``keep="first"`` exempts the single
    earliest occurrence per duplicated gram — ``ROW(doc_id, p) <> mnk``
    where ``mnk = MIN(ROW(doc_id, p)) OVER gram`` — a strictly smaller
    cut set: the paper's keep-one-occurrence policy, exact (r8; struct
    MIN orders lexicographically in both engines, so the exempted
    occurrence is identical).  Chained by the fixpoint oracle: pass
    k+1 reads pass k's ``{pfx}clean``; a pass over an already-converged
    corpus cuts nothing, so unrolling MORE passes than needed is a
    no-op, which is what lets a fixed 3-pass unroll oracle-check the
    iterate-until-empty Spark operator (which raises if it ever needs
    more passes than the guard)."""
    L = SPAN_MIN_LEN
    dup_filter = (
        "mn <> mx AND ROW(doc_id, p) <> mnk" if keep == "first" else "mn <> mx"
    )
    return f"""
    {pfx}t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}),
    {pfx}tt AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM {pfx}t),
    {pfx}g AS (
      SELECT doc_id, unnest(range(1, n_tokens - {L} + 2)) AS p, toks
      FROM {pfx}tt WHERE n_tokens >= {L}
    ),
    {pfx}grams AS (
      SELECT doc_id, p,
             array_to_string(list_slice(toks, p, p + {L} - 1), ' ') AS gram
      FROM {pfx}g
    ),
    {pfx}dup AS (
      SELECT doc_id, p FROM (
        SELECT doc_id, p,
               MIN(doc_id) OVER (PARTITION BY gram) AS mn,
               MAX(doc_id) OVER (PARTITION BY gram) AS mx,
               MIN(ROW(doc_id, p)) OVER (PARTITION BY gram) AS mnk
        FROM {pfx}grams) WHERE {dup_filter}
    ),
    {pfx}brk AS (
      SELECT doc_id, p,
             CASE WHEN LAG(p) OVER w IS NULL
                       OR p - LAG(p) OVER w > {L}
                  THEN 1 ELSE 0 END AS b
      FROM {pfx}dup WINDOW w AS (PARTITION BY doc_id ORDER BY p)
    ),
    {pfx}isl AS (
      SELECT doc_id, p,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY p) AS island
      FROM {pfx}brk
    ),
    {pfx}spans AS (
      SELECT doc_id, MIN(p) AS span_start,
             MAX(p) + {L} - MIN(p) AS span_len
      FROM {pfx}isl GROUP BY doc_id, island
    ),
    {pfx}cov AS (
      SELECT doc_id, unnest(range(span_start, span_start + span_len)) AS idx
      FROM {pfx}spans
    ),
    {pfx}tok AS (
      SELECT doc_id, unnest(range(1, len(toks) + 1)) AS idx, toks
      FROM {pfx}tt
    ),
    {pfx}tok2 AS (SELECT doc_id, idx, toks[idx] AS tok FROM {pfx}tok),
    {pfx}kept AS (
      SELECT {pfx}tok2.* FROM {pfx}tok2
      ANTI JOIN {pfx}cov USING (doc_id, idx)
    ),
    {pfx}cl AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS ct
      FROM {pfx}kept GROUP BY doc_id
    ),
    {pfx}clean AS (
      SELECT tt.doc_id, COALESCE(ct, '') AS text
      FROM {pfx}tt tt LEFT JOIN {pfx}cl USING (doc_id)
    )"""


#: Final SELECT shared by the cut-variant entries: original token count
#: from the pass-a tt, final text from the last pass's clean relation.
def _cut_final_select(last_clean: str) -> str:
    return f"""
    SELECT att.doc_id,
           CAST(att.n_tokens AS BIGINT) AS n_tokens,
           CAST(att.n_tokens - (CASE WHEN f.text = '' THEN 0
                                     ELSE len(string_split(f.text, ' '))
                                END) AS BIGINT) AS n_cut,
           f.text AS clean_text
    FROM att JOIN {last_clean} f USING (doc_id)
    """


@register(
    "dedup_substring_cut_fixpoint",
    oracle="WITH "
    + ",".join(
        [
            _cut_pass_ctes("documents", "a"),
            _cut_pass_ctes("aclean", "b"),
            _cut_pass_ctes("bclean", "c"),
        ]
    )
    + _cut_final_select("cclean"),
    survey="X29",
    doc="Iterated substring cut to FIXPOINT: one cutting pass can splice "
    "previously-distant text into brand-new >=L duplicates across the "
    "cut boundary (substring_ops.py's one-pass caveat made executable); "
    "this repeats spans->cut until no cross-doc span survives, with ONE "
    "fused materialize-and-count job per span list (lazy localCheckpoint "
    "+ full-count emptiness probe; the graph-operator lineage hygiene). The "
    "oracle unrolls THREE passes of the same CTE chain — passes beyond "
    "convergence cut nothing, so the unroll length only needs to be >= "
    "the fixture's true pass count (1; the operator raises past its "
    "max_passes guard rather than silently under-iterating, so a "
    "pass-count surprise surfaces as an error, never a wrong hash).",
)
def dedup_substring_cut_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import substring_cut_fixpoint

    return substring_cut_fixpoint(_docs(spark, sf_dir), min_len=SPAN_MIN_LEN)


@register(
    "dedup_substring_cut_keepfirst",
    oracle="WITH " + _cut_pass_ctes("documents", "a", keep="first")
    + _cut_final_select("aclean"),
    survey="X29",
    doc="The paper-faithful witness policy for the substring cut (Lee et "
    "al.'s ExactSubstr keeps ONE occurrence of each duplicated span): "
    "keep='first' exempts the single EARLIEST occurrence — min "
    "(doc_id, p), struct MIN on string-exact groups, lexicographic in "
    "both engines — of each duplicated window, so exactly one copy "
    "survives the cut, even against the witness document's own "
    "internal repeats (r8 tightening of the formerly whole-witness-doc "
    "exemption). Complements dedup_substring_cut (keep='all', the "
    "scrub-everything default) so both deviation arms carry driver "
    "evidence.",
)
def dedup_substring_cut_keepfirst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import substring_cut_corpus

    return substring_cut_corpus(
        _docs(spark, sf_dir), min_len=SPAN_MIN_LEN, keep="first"
    )


@register(
    "dedup_substring_incremental",
    oracle=_SPAN_CTES
    + "SELECT doc_id, span_start, span_len FROM spans WHERE doc_id % 5 = 0",
    survey="X29",
    doc="Incremental serving path of the exact-substring tier: the corpus "
    "(doc_id %% 5 != 0) is indexed ONCE as 8-byte gram-hash keys "
    "(substring_gram_index — the stored artifact, same role as the LSH "
    "signature index), and a new batch (doc_id %% 5 == 0) probes it "
    "without re-shingling history; batch-internal duplicates are caught "
    "by the same min/max-doc window as the batch operator. Hash-exact "
    "semantics (64-bit keys, no stored gram strings — the "
    "minhash_signatures_hashed trade); the oracle is the BATCH span "
    "derivation over the full corpus restricted to new doc_ids, which "
    "the incremental result must reproduce exactly.",
)
def dedup_substring_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import (
        exact_substring_spans_incremental,
        substring_gram_index,
    )

    docs = _docs(spark, sf_dir)
    idx = substring_gram_index(
        docs.filter(F.col("doc_id") % 5 != 0), min_len=SPAN_MIN_LEN
    )
    return exact_substring_spans_incremental(
        idx, docs.filter(F.col("doc_id") % 5 == 0), min_len=SPAN_MIN_LEN
    )


@register(
    "dup_span_coverage",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    tt AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM t),
    s0 AS (
      SELECT doc_id, unnest(range(0, n_tokens - {SPAN_W} + 1)) AS pos, toks
      FROM tt WHERE n_tokens >= {SPAN_W}
    ),
    spans AS (
      SELECT doc_id, pos,
             array_to_string(toks[pos + 1 : pos + {SPAN_W}], ' ') AS shingle
      FROM s0
    ),
    dups AS (
      SELECT shingle FROM spans
      GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    covspan AS (SELECT s.doc_id, s.pos FROM spans s JOIN dups USING (shingle)),
    covidx AS (
      SELECT doc_id, unnest(range(pos, pos + {SPAN_W})) AS idx FROM covspan
    ),
    covd AS (SELECT DISTINCT doc_id, idx FROM covidx),
    cnt AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_tokens
      FROM covd GROUP BY doc_id
    )
    SELECT tt.doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST((COALESCE(dup_tokens, 0) * 1000) // n_tokens AS BIGINT)
               AS dup_permille
    FROM tt LEFT JOIN cnt USING (doc_id)
    """,
    survey="X1,X4,X14",
    doc="Exact duplicated-span coverage (the substring-dedup statistic of "
    "Lee et al. 2022): fraction of each document's tokens covered by an "
    f"{SPAN_W}-token span that also occurs verbatim in another document. "
    "Shingle → distinct-doc count → join back → interval-union via "
    "position explode. All shuffles key on shingle or doc_id hashes "
    "(linear, skew-free); the span explode is a constant ×W blowup of "
    "the token stream, the same cost class as the MinHash shingle pass. "
    "Integer permille output — no float comparisons.",
)
def dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import dup_span_coverage as _op

    return _op(_docs(spark, sf_dir), w=SPAN_W)


# Symbol sequences for the BPE merge are encoded as each symbol wrapped in
# single underscores and concatenated: 'key' → '_k__e__y_'. The wrapper
# makes one merge application a plain substring replace ('_x__y_' →
# '_xy_') whose matches never share characters, so left-to-right
# non-overlapping replace — the same semantics in Spark (Java
# String.replace) and DuckDB — IS greedy BPE merging: in a run 'a a a'
# ('_a__a__a_') the first two merge, the third survives. A separator the
# alphabet can produce would break this; the corpus is asserted [a-z]
# in-query on both engines (charset violations would go through untouched
# and surface as a hash mismatch, not silent corruption).
_SEQ_SQL = "concat('_', array_join(transform(sequence(1, length(w)), i -> substr(w, i, 1)), '__'), '_')"
_DUCK_SEQ = "'_' || array_to_string(list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)), '__') || '_'"


@register(
    "bpe_merge_apply",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (
      SELECT w, COUNT(*) AS n FROM words
      WHERE length(w) >= 2 AND regexp_matches(w, '^[a-z]+$')
      GROUP BY w
    ),
    p1 AS (
      SELECT unnest(list_transform(range(1, length(w)),
                    i -> substr(w, i, 1) || '|' || substr(w, i + 1, 1))) AS pair,
             n
      FROM wc
    ),
    top1 AS (
      SELECT string_split(pair, '|')[1] AS x, string_split(pair, '|')[2] AS y
      FROM (SELECT pair, SUM(n) AS np FROM p1 GROUP BY pair
            ORDER BY np DESC, pair ASC LIMIT 1)
    ),
    merged AS (
      SELECT replace({_DUCK_SEQ},
                     '_' || x || '__' || y || '_',
                     '_' || x || y || '_') AS seq,
             n
      FROM wc CROSS JOIN top1
    ),
    syms AS (
      SELECT string_split(trim(seq, '_'), '__') AS s, n FROM merged
    ),
    p2 AS (
      SELECT unnest(list_transform(range(1, len(s)),
                    i -> s[i] || '|' || s[i + 1])) AS pair,
             n
      FROM syms WHERE len(s) >= 2
    ),
    counts AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS n_pairs
               FROM p2 GROUP BY pair),
    ranked AS (
      SELECT pair, n_pairs,
             ROW_NUMBER() OVER (ORDER BY n_pairs DESC, pair ASC) AS rnk
      FROM counts
    )
    SELECT pair, n_pairs, rnk FROM ranked WHERE rnk <= 10
    """,
    survey="X4,X14",
    doc="One full BPE training iteration (Sennrich et al. 2016): count "
    "adjacent symbol pairs over the frequency-weighted word vocabulary, "
    "take the argmax merge (deterministic tie-break), apply it "
    "corpus-wide, and recount — emitting the next iteration's top-10 "
    "candidates. The merge rule is a 1-row broadcast; every data pass "
    "operates on the (word, count) vocabulary aggregate, never the raw "
    "token stream, so an iteration's cost is vocabulary-sized no matter "
    "the corpus. Demonstrates the iterative driver loop pattern "
    "(cf. kmeans/pagerank) at one unrolled step, which is what makes the "
    "whole query a single oracle-checkable statement.",
)
def bpe_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        # \A/\z anchor end-of-TEXT in Java regex ($ would also match
        # before a trailing newline, where DuckDB's RE2 '$' would not —
        # a latent cross-engine divergence if tokens ever carry one)
        .filter((F.length("w") >= 2) & F.col("w").rlike(r"\A[a-z]+\z"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pair_expr = F.expr(
        "transform(sequence(1, length(w) - 1), "
        "i -> concat(substr(w, i, 1), '|', substr(w, i + 1, 1)))"
    )
    top1 = (
        wc.select(F.explode(pair_expr).alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("np"))
        .orderBy(F.desc("np"), F.asc("pair"))
        .limit(1)
        .select(
            F.split("pair", "\\|").getItem(0).alias("x"),
            F.split("pair", "\\|").getItem(1).alias("y"),
        )
    )
    merged = wc.crossJoin(F.broadcast(top1)).select(
        F.expr(
            f"replace({_SEQ_SQL}, "
            "concat('_', x, '__', y, '_'), concat('_', x, y, '_'))"
        ).alias("seq"),
        "n",
    )
    syms = merged.select(
        F.split(F.expr("trim(BOTH '_' FROM seq)"), "__").alias("s"), "n"
    )
    p2 = syms.filter(F.size("s") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(s) - 1), "
                "i -> concat(element_at(s, i), '|', element_at(s, i + 1)))"
            )
        ).alias("pair"),
        "n",
    )
    counts = p2.groupBy("pair").agg(F.sum("n").alias("n_pairs"))
    w = Window.orderBy(F.desc("n_pairs"), F.asc("pair"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("pair", "n_pairs", "rnk")
    )


#: Training steps for the bpe_train_merges driver entry. Six is enough to
#: exercise multi-char symbols merging with each other (step 1 output
#: participating in later pairs) while the unrolled oracle stays readable.
BPE_TRAIN_K = 6


def _bpe_pass_ctes(i: int) -> str:
    """One BPE training iteration as CTEs: sequences ``s{i-1}`` →
    argmax-merge row ``t{i}`` → merged sequences ``s{i}``.  Chained
    ``BPE_TRAIN_K`` times by the trainer oracle; tie-break (count DESC,
    pair ASC) and the underscore-wrapped replace are exactly
    bpe_merge_apply's (same file, single-iteration entry).

    The apply step is ``LEFT JOIN t{i} ON TRUE`` + ``COALESCE(..., seq)``
    rather than a CROSS JOIN so an EXHAUSTED chain (``t{i}`` empty —
    fewer than k merges available) leaves the sequences unchanged instead
    of emptying the whole relation; that matches the Spark trainer's
    fewer-than-k behavior and keeps every downstream v/e chain alive.
    Same guard in ``_bpe_encode_cte`` / ``_bpe_vocab_cte``."""
    return f"""
    p{i} AS (
      SELECT unnest(list_transform(range(1, len(s)),
                    j -> s[j] || '|' || s[j + 1])) AS pair, n
      FROM (SELECT string_split(trim(seq, '_'), '__') AS s, n FROM s{i - 1})
      WHERE len(s) >= 2
    ),
    t{i} AS (
      SELECT pair, np,
             string_split(pair, '|')[1] AS x, string_split(pair, '|')[2] AS y
      FROM (SELECT pair, SUM(n) AS np FROM p{i} GROUP BY pair
            ORDER BY np DESC, pair ASC LIMIT 1)
    ),
    s{i} AS (
      SELECT COALESCE(replace(seq, '_' || x || '__' || y || '_',
                              '_' || x || y || '_'), seq) AS seq, n
      FROM s{i - 1} LEFT JOIN t{i} ON TRUE
    )"""


@register(
    "bpe_train_merges",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (
      SELECT w, COUNT(*) AS n FROM words
      WHERE length(w) >= 2 AND regexp_matches(w, '^[a-z]+$')
      GROUP BY w
    ),
    s0 AS (SELECT {_DUCK_SEQ} AS seq, n FROM wc),
    {",".join(_bpe_pass_ctes(i) for i in range(1, BPE_TRAIN_K + 1))}
    {" UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, x, y, "
        f"CAST(np AS BIGINT) AS n_pairs FROM t{i}"
        for i in range(1, BPE_TRAIN_K + 1)
    )}
    """,
    survey="X4,X14",
    doc=f"The full BPE training loop (Sennrich et al. 2016) for "
    f"k={BPE_TRAIN_K} merge iterations, emitting the learned MERGE TABLE "
    "(step, x, y, n_pairs) — the actual tokenizer-training artifact "
    "bpe_merge_apply's single unrolled iteration only previews. Each "
    "step: vocabulary-sized pair count, deterministic argmax (count "
    "DESC, pair ASC), corpus-wide merge via the underscore-wrapped "
    "replace, recount. Spark runs the driver loop (one bounded 1-row "
    "collect per step — the winning pair must become a literal in the "
    "next replace — with eager localCheckpoints keeping lineage flat); "
    "the oracle unrolls the identical k passes as chained CTEs. Only "
    "the initial vocabulary build ever touches the corpus; every "
    "iteration is vocabulary-sized, which is why real trainers run "
    "this exact loop to k~30000.",
)
def bpe_train_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bpe_train_merges

    return bpe_train_merges(_docs(spark, sf_dir), n_merges=BPE_TRAIN_K)


def _bpe_encode_cte(i: int) -> str:
    """One merge rule applied to the per-document word sequences —
    ``e{i-1}`` × the 1-row argmax ``t{i}`` (shared with the trainer CTE
    chain) → ``e{i}``.  Same underscore-wrapped replace as the trainer's
    ``s{i}`` pass, carried per (doc_id, word occurrence) instead of per
    vocabulary entry."""
    return f"""
    e{i} AS (
      SELECT doc_id, nc,
             COALESCE(replace(seq, '_' || x || '__' || y || '_',
                              '_' || x || y || '_'), seq) AS seq
      FROM e{i - 1} LEFT JOIN t{i} ON TRUE
    )"""


@register(
    "bpe_encode_corpus",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (
      SELECT w, COUNT(*) AS n FROM words
      WHERE length(w) >= 2 AND regexp_matches(w, '^[a-z]+$')
      GROUP BY w
    ),
    s0 AS (SELECT {_DUCK_SEQ} AS seq, n FROM wc),
    {",".join(_bpe_pass_ctes(i) for i in range(1, BPE_TRAIN_K + 1))},
    docw AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      )
      WHERE length(w) >= 2 AND regexp_matches(w, '^[a-z]+$')
    ),
    e0 AS (SELECT doc_id, length(w) AS nc, {_DUCK_SEQ} AS seq FROM docw),
    {",".join(_bpe_encode_cte(i) for i in range(1, BPE_TRAIN_K + 1))}
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(nc) AS BIGINT) AS n_chars,
           CAST(SUM(len(string_split(trim(seq, '_'), '__'))) AS BIGINT)
             AS n_tokens
    FROM e{BPE_TRAIN_K} GROUP BY doc_id
    """,
    survey="X4",
    doc=f"The APPLY half of the tokenizer tier: encode every document "
    f"with the k={BPE_TRAIN_K} merge table bpe_train_merges learns, "
    "emitting per-doc (n_words, n_chars, n_tokens) — n_chars/n_tokens "
    "is the compression ratio tokenizer training maximizes. The merge "
    "table is collected once (bounded: k rules, the driver-sized "
    "training artifact) and unrolled into ONE nested-replace projection, "
    "so encoding is a narrow map in whole-stage codegen — no join, no "
    "vocabulary shuffle; the only shuffle is the map-side-combining "
    "per-doc aggregate. The oracle re-trains the identical merge chain "
    "as CTEs and re-applies it per word occurrence.",
)
def bpe_encode_corpus_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bpe_encode_tokens

    return bpe_encode_tokens(_docs(spark, sf_dir), n_merges=BPE_TRAIN_K)


def _bpe_vocab_cte(i: int) -> str:
    """One merge rule applied to the distinct-word VOCABULARY sequences
    — ``v{i-1}`` × the 1-row argmax ``t{i}`` (shared with the trainer
    chain) → ``v{i}``.  The per-word-TYPE twin of ``_bpe_encode_cte``:
    encoding cost is paid once per vocabulary entry, the id-emitting
    entry joins the finished table back to (doc, pos, word)."""
    return f"""
    v{i} AS (
      SELECT w, COALESCE(replace(seq, '_' || x || '__' || y || '_',
                                 '_' || x || y || '_'), seq) AS seq
      FROM v{i - 1} LEFT JOIN t{i} ON TRUE
    )"""


def bpe_ids_prefix(src: str = "documents") -> str:
    """Shared oracle prefix for the token-ID tier over ``src``: trains
    the k-merge chain, builds the symbol→id table, encodes the
    distinct-word vocabulary, and ends at ``wenc`` (word → (n_sym,
    ordered id string)) plus ``docw`` (doc_id, pos, word).
    ``bpe_encode_ids`` appends the per-doc assembly select;
    ``packed_token_batches`` appends the packing CTEs on top; the
    end-to-end capstone instantiates it over the curated train split."""
    return f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM {src}
    ),
    wc AS (
      SELECT w, COUNT(*) AS n FROM words
      WHERE length(w) >= 2 AND regexp_matches(w, '^[a-z]+$')
      GROUP BY w
    ),
    s0 AS (SELECT {_DUCK_SEQ} AS seq, n FROM wc),
    {",".join(_bpe_pass_ctes(i) for i in range(1, BPE_TRAIN_K + 1))},
    symid AS (
      SELECT sym, MIN(id) AS id FROM (
        {" UNION ALL ".join(
            f"SELECT x || y AS sym, 25 + {i} AS id FROM t{i}"
            for i in range(1, BPE_TRAIN_K + 1)
        )}
      ) GROUP BY sym
    ),
    docw0 AS (
      SELECT doc_id, unnest(range(1, len(s) + 1)) AS pos, s
      FROM (SELECT doc_id, string_split(text, ' ') AS s FROM {src})
    ),
    docw AS (
      SELECT doc_id, pos, s[pos] AS w FROM docw0
      WHERE length(s[pos]) >= 2 AND regexp_matches(s[pos], '^[a-z]+$')
    ),
    v0 AS (SELECT w, {_DUCK_SEQ} AS seq FROM (SELECT DISTINCT w FROM docw)),
    {",".join(_bpe_vocab_cte(i) for i in range(1, BPE_TRAIN_K + 1))},
    vs0 AS (
      SELECT w, unnest(range(1, len(ss) + 1)) AS sp, ss
      FROM (SELECT w, string_split(trim(seq, '_'), '__') AS ss
            FROM v{BPE_TRAIN_K})
    ),
    vids AS (
      SELECT vs0.w, vs0.sp,
             CASE WHEN length(ss[sp]) = 1 THEN ascii(ss[sp]) - 97
                  WHEN symid.id IS NOT NULL THEN symid.id
                  ELSE error('bpe_encode_ids oracle: symbol not in merge '
                             'table: ' || ss[sp]) END AS tid
      FROM vs0 LEFT JOIN symid ON ss[sp] = symid.sym
    ),
    wenc AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sym,
             string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY sp) AS wids
      FROM vids GROUP BY w
    )"""


_BPE_IDS_PREFIX = bpe_ids_prefix()


@register(
    "bpe_encode_ids",
    oracle=_BPE_IDS_PREFIX + """
    SELECT d.doc_id,
           CAST(SUM(e.n_sym) AS BIGINT) AS n_tokens,
           string_agg(e.wids, ' ' ORDER BY d.pos) AS token_ids
    FROM docw d JOIN wenc e ON d.w = e.w
    GROUP BY d.doc_id
    """,
    survey="X4,X14,X35",
    doc=f"Encode every document to its ORDERED TOKEN-ID SEQUENCE with "
    f"the k={BPE_TRAIN_K} merge table bpe_train_merges learns — the "
    "production completion of the tokenizer tier (bpe_encode_corpus "
    "reports compression stats; the model consumes ids). Id space: "
    "base char c -> ascii(c)-97, step-s merge symbol -> 25+s, "
    "first-step-wins per symbol string — deterministic on both "
    "engines. Encoding folds the merge rules over the distinct-word "
    "VOCABULARY (paid per word type, chunk_size-deep codegen-safe "
    "passes at production k), ids attach via a broadcast join against "
    "the k-row artifact, and per-doc assembly is one "
    "document-length-bounded ordered aggregation; token_ids is "
    "value-hash-checked verbatim via array_join/string_agg.",
)
def bpe_encode_ids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bpe_encode_ids

    return bpe_encode_ids(_docs(spark, sf_dir), n_merges=BPE_TRAIN_K)


@register(
    "bpe_decode_roundtrip",
    oracle=_BPE_IDS_PREFIX + """,
    docids AS (
      SELECT d.doc_id, CAST(SUM(e.n_sym) AS BIGINT) AS n_tokens
      FROM docw d JOIN wenc e ON d.w = e.w
      GROUP BY d.doc_id
    ),
    truth AS (
      SELECT doc_id, string_agg(w, '' ORDER BY pos) AS decoded
      FROM docw GROUP BY doc_id
    )
    SELECT t.doc_id, i.n_tokens, t.decoded, TRUE AS roundtrip_ok
    FROM truth t JOIN docids i ON t.doc_id = i.doc_id
    """,
    survey="X4,X14,X35",
    doc=f"TOKENIZER LOSSLESSNESS — decode(encode(corpus)) == corpus: "
    f"every document is encoded to ids with the k={BPE_TRAIN_K} merge "
    "table (bpe_encode_ids), DECODED back via operators/text.py::"
    "bpe_decode_ids (the id->symbol tokenizer artifact baked into the "
    "plan as one flat map literal — decoding is a purely narrow "
    "transform+concat projection, no join/shuffle/explode: a map-only "
    "stage at 100 TB), and compared per document against the "
    "independently derived ground truth (the trainable words in "
    "original order, concatenated — word boundaries are not in the id "
    "stream by construction). The oracle rederives n_tokens through "
    "the full CTE merge chain and the ground-truth decoded string "
    "directly from the corpus, and pins roundtrip_ok TRUE — a decoder "
    "or encoder defect breaks the value hash on decoded AND flips "
    "roundtrip_ok. The packed-batch extension of the same property "
    "(split packed token_ids at doc_mask '1's, decode, compare) is in "
    "tests/test_packing.py.",
)
def bpe_decode_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import (
        bpe_decode_ids,
        bpe_encode_ids,
        bpe_train_merges,
    )

    docs = _docs(spark, sf_dir)
    merges = bpe_train_merges(docs, n_merges=BPE_TRAIN_K)
    ids = bpe_encode_ids(docs, merges=merges)
    dec = bpe_decode_ids(ids, merges)
    # ground truth = the trainable words concatenated in original order —
    # a pure NARROW projection (filter over the split array preserves
    # document order), r12: previously posexplode + collect_list groupBy,
    # a token-scale shuffle for a doc-local concatenation (guide §2.4)
    truth = docs.select(
        "doc_id",
        F.concat_ws(
            "",
            F.expr(
                r"filter(split(text, ' '),"
                r" w -> length(w) >= 2 AND w rlike '\\A[a-z]+\\z')"
            ),
        ).alias("truth"),
    )
    return dec.join(truth, "doc_id").select(
        "doc_id",
        "n_tokens",
        "decoded",
        (F.col("decoded") == F.col("truth")).alias("roundtrip_ok"),
    )


#: Packing dials for the packed-batch capstone. 128 tokens/sequence keeps
#: multiple full sequences AND a partial tail per (lang, shard) group at
#: fixture scale (so both regimes are hash-checked); 4 shards exercises
#: real group parallelism without shrinking groups below a sequence.
PACK_BUDGET = 128
PACK_SHARDS = 4


def packed_ctes(src: str = "documents", n_shards: int = PACK_SHARDS) -> str:
    """Shared oracle chain for the packed-batch tier over ``src``:
    :func:`bpe_ids_prefix` + per-doc id assembly + placement + token
    positions, ending at the ``packed`` CTE (one row per (lang, shard,
    seq_id) — identical to pack_token_ids' output).
    ``packed_token_batches`` selects it verbatim; ``packed_shard_
    manifest`` aggregates it per shard; the end-to-end capstone
    instantiates it over the curated train split."""
    return bpe_ids_prefix(src) + f""",
    docids AS (
      SELECT d.doc_id,
             CAST(SUM(e.n_sym) AS BIGINT) AS n_tokens,
             string_agg(e.wids, ' ' ORDER BY d.pos) AS token_ids
      FROM docw d JOIN wenc e ON d.w = e.w
      GROUP BY d.doc_id
    ),
    grp AS (
      SELECT docids.doc_id, docids.n_tokens, docids.token_ids,
             {src}.lang, docids.doc_id % {n_shards} AS shard
      FROM docids JOIN {src} ON {src}.doc_id = docids.doc_id
    ),
    placed AS (
      SELECT lang, shard, doc_id, token_ids,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS start_tok
      FROM grp
    ),
    toks AS (
      SELECT lang, shard, start_tok + i - 1 AS gpos, l[i] AS tid,
             CASE WHEN i = 1 THEN '1' ELSE '0' END AS b
      FROM (SELECT lang, shard, start_tok,
                   string_split(token_ids, ' ') AS l,
                   unnest(range(1, len(string_split(token_ids, ' ')) + 1))
                     AS i
            FROM placed)
    ),
    packed AS (
      SELECT lang, CAST(shard AS BIGINT) AS shard,
             CAST(gpos // {PACK_BUDGET} AS BIGINT) AS seq_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             string_agg(tid, ' ' ORDER BY gpos) AS token_ids,
             string_agg(b, '' ORDER BY gpos) AS doc_mask
      FROM toks
      GROUP BY lang, shard, gpos // {PACK_BUDGET}
    )"""


_PACKED_CTES = packed_ctes()


@register(
    "packed_token_batches",
    oracle=_PACKED_CTES + """
    SELECT lang, shard, seq_id, n_tokens, token_ids, doc_mask FROM packed
    """,
    survey="X4,X14,X35,X39",
    doc=f"PACKED TRAINING BATCHES — the tokenized-training-batch "
    f"capstone composing bpe_encode_ids (per-doc ordered id sequences, "
    f"k={BPE_TRAIN_K} merges) with the concat-then-chunk placement math "
    f"of pack_sequences: per (lang, doc_id%{PACK_SHARDS} shard, "
    f"seq_id), exactly-{PACK_BUDGET}-token id rows (the group's final "
    "row partial) plus a per-position '0'/'1' doc_mask with '1' at "
    "every document start — the attention-reset mask that makes "
    "document straddling safe (splitting the group stream at '1's "
    "reconstructs every per-doc sequence verbatim; property-tested in "
    "tests/test_packing.py). Both token_ids and doc_mask are "
    "hash-checked verbatim. Scale shape: placement is a DOC-level "
    "cumulative window per (lang, shard); the only token-scale stage "
    "is a groupBy keyed by the sequence id, whose groups are "
    "budget-bounded and map-side combinable (operators/packing.py::"
    "pack_token_ids).",
)
def packed_token_batches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_token_ids
    from ..operators.text import bpe_encode_ids

    docs = _docs(spark, sf_dir)
    enc = bpe_encode_ids(docs, n_merges=BPE_TRAIN_K)
    return pack_token_ids(
        enc, docs, budget=PACK_BUDGET, n_shards=PACK_SHARDS
    )


@register(
    "packed_shard_manifest",
    oracle=_PACKED_CTES + """
    SELECT lang, shard,
           CAST(COUNT(*) AS BIGINT) AS n_sequences,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN substring(doc_mask, 1, 1) = '0'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling,
           md5(string_agg(token_ids || '#' || doc_mask, '|'
                          ORDER BY seq_id)) AS checksum
    FROM packed
    GROUP BY lang, shard
    """,
    survey="X35,X39",
    doc="PACKED-SHARD MANIFEST — the trainer-side reader contract "
    "(VERDICT r10 #7): per (lang, shard) of packed_token_batches, the "
    "sequence count, token count, count of sequences opening "
    "mid-document (first mask char '0' — the rows whose attention "
    "reset depends on the mask), and an md5 CHECKSUM over the shard's "
    "(token_ids#doc_mask) content concatenated in seq_id order — a "
    "data loader can size, sample, and VERIFY a mounted shard without "
    "scanning it (the webdataset/megatron index-file shape; "
    "operators/packing.py::packed_shard_manifest). One groupBy over "
    "sequence rows (~tokens/budget); deterministic string arithmetic "
    "end-to-end, so the checksum column itself is value-hash-checked "
    "cross-engine, not just the integers. The physical layout twin "
    "(one parquet file per (split, shard) leaf via "
    "export_training_shards) is layout-tested in "
    "tests/test_maintenance.py.",
)
def packed_shard_manifest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_token_ids, packed_shard_manifest
    from ..operators.text import bpe_encode_ids

    docs = _docs(spark, sf_dir)
    enc = bpe_encode_ids(docs, n_merges=BPE_TRAIN_K)
    packed = pack_token_ids(
        enc, docs, budget=PACK_BUDGET, n_shards=PACK_SHARDS
    )
    return packed_shard_manifest(packed)


@register(
    "vocab_oov_rate",
    oracle=f"""
    WITH words AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, COUNT(*) AS n FROM words GROUP BY w
        ORDER BY n DESC, w ASC LIMIT {VOCAB_V}
      )
    ),
    tagged AS (
      SELECT source, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
      FROM words LEFT JOIN vocab v USING (w)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST((SUM(oov) * 1000) // COUNT(*) AS BIGINT) AS oov_permille
    FROM tagged GROUP BY source
    """,
    survey="X4,X14",
    doc=f"Tokenizer vocabulary coverage: build the top-{VOCAB_V} "
    "frequency vocabulary (TakeOrderedAndProject with deterministic "
    "tie-break — no global sort), broadcast it against the token stream, "
    "and report per-source OOV rates in integer permille. The vocabulary "
    "is the broadcast side by construction (V rows), so the report costs "
    "one scan + one vocabulary-sized aggregate regardless of corpus "
    "size; this is the coverage gate run before freezing a tokenizer.",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    words = docs.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(VOCAB_V)
        .select("w")
    )
    tagged = words.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "w", "left"
    )
    return tagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.expr(
            "(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) * 1000)"
            " div count(1)"
        ).alias("oov_permille"),
    )

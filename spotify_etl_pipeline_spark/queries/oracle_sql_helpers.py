"""Shared DuckDB-SQL fragments for oracle queries — the SQL twins of the
Spark-side operator formulas, defined ONCE so a formula change cannot update
one oracle and miss another.

This module registers nothing (no ``@register`` calls), so any query module
may import it without perturbing catalog registration order.
"""

from __future__ import annotations

from ..operators.text import FP_BASE, LANG_PROFILES, MOD, _token_value

# The shared corpus-curation policy (used by the corpus_curation capstone
# and its decontaminated variant — one definition so the two cannot drift).
CURATION_LANGS = ("en", "de", "fr")
CURATION_QUALITY_MIN = 6200

_STOPS = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])


def quality_sql() -> str:
    """DuckDB twin of ``operators.text.quality_score``'s integer
    milli-score over ``text``."""
    return f"""
    CAST(40 * least(greatest(len(string_split(text, ' ')), 1), 100)
       + (3000 * len(list_distinct(string_split(text, ' '))))
         // greatest(len(string_split(text, ' ')), 1)
       + 3000
       - (3000 * len(list_filter(string_split(text, ' '),
                                 t -> list_contains([{_STOPS}], t))))
         // greatest(len(string_split(text, ' ')), 1)
    AS BIGINT)
"""


def shingle_select_sql(n: int, src: str) -> str:
    """DuckDB twin of ``operators.dedup.doc_shingles`` at arbitrary n:
    distinct (doc_id, shingle) rows of '_'-joined n-gram token windows
    over ``src``'s ``text`` column."""
    terms = " || '_' || ".join(f"string_split(text,' ')[i+{j + 1}]" for j in range(n))
    return f"""
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id, unnest(
          list_transform(range(greatest(len(string_split(text,' ')) - {n - 1}, 0)),
            i -> {terms})
        ) AS shingle
        FROM {src}
      )
    """


def dedup_and_split_ctes(src: str) -> str:
    """The shared tail of both curation capstones' oracles: 3-gram-Jaccard
    (≥0.8) near-dup pairs over ``src`` → connected components via recursive
    CTE → min-id survivors → content-fingerprint 80/10/10 split buckets.

    Emits the CTE chain ``sh, cnt, inter, pairs, edges, reach, comp, surv,
    fp``; the caller's statement must open with ``WITH RECURSIVE`` and
    finish with a SELECT over ``fp`` (columns ``lang``, ``h``).
    """
    return f"""
    sh AS ({shingle_select_sql(3, src)}),
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
      FROM {src} d LEFT JOIN comp c ON d.doc_id = c.node
      WHERE COALESCE(c.component, d.doc_id) = d.doc_id
    ),
    fp AS (SELECT lang, {fingerprint_sql()} AS h FROM surv)
"""


SPLIT_SELECT_SQL = """
    SELECT CASE WHEN h % 100 < 80 THEN 'train'
                WHEN h % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs
    FROM fp
    GROUP BY 1, 2
"""


def list_rolling_hash_sql(list_expr: str) -> str:
    """DuckDB twin of ``operators.text._rolling_hash_expr``: the shared
    rolling hash folded over an arbitrary token-list expression."""
    return (
        "list_reduce("
        "list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({list_expr}, "
        f"t -> CAST({_token_value('t')} AS BIGINT))), "
        f"(acc, v) -> (acc * {FP_BASE} + v) % {MOD})"
    )


def fingerprint_sql() -> str:
    """DuckDB twin of ``operators.text.fingerprint_expr``: the rolling-hash
    content fingerprint as a scalar SQL expression over ``text``."""
    return list_rolling_hash_sql("string_split(text, ' ')")


# The md5-prefix bigint hash pair (first 60 digest bits as a non-negative
# BIGINT) — the cross-engine content-hash family of operators.dedup
# .shingle_sid, as .format(x=...) templates for oracles that need the raw
# (un-modded) value. Bit-parity between the two strings is load-bearing:
# change them together or not at all.
MD5_SID_SPARK = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"
MD5_SID_DUCK = "('0x' || substring(md5({x}), 1, 15))::BIGINT"

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


def fingerprint_sql() -> str:
    """DuckDB twin of ``operators.text.fingerprint_expr``: the rolling-hash
    content fingerprint as a scalar SQL expression over ``text``."""
    return (
        "list_reduce("
        "list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(text, ' '), "
        f"t -> CAST({_token_value('t')} AS BIGINT))), "
        f"(acc, v) -> (acc * {FP_BASE} + v) % {MOD})"
    )

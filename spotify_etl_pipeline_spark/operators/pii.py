"""PII / pattern scrubbing — the redaction stage every shipped training
corpus runs before tokenization (emails, phone numbers, IP addresses,
national-id and card-shaped numbers).

Reference scope note: the reference pipeline (rajeluqman/
spotify-etl-pipeline) has no curation tier at all — this operator is
part of the LLM-data extension surface (SURVEY.md §2.10), built from
public-knowledge regex patterns only.

Execution shape — the same recipe as ``bpe_decode_ids`` (the other
plan-guarded narrow stage): the scrub is ONE projection of chained
``regexp_replace`` calls plus per-pattern ``regexp_count`` audits, all
JVM-side built-ins inside whole-stage codegen.  Applying it to a stored
corpus adds ZERO exchanges, joins, windows, or aggregates to the scan
(plan-asserted in tests/test_plans.py) — at 100 TB it is a pure
map-only pass whose cost is the read + regex CPU, embarrassingly
parallel over file splits, with no skew surface because no key exists.

Pattern discipline: patterns are written in the common Java-regex /
RE2 subset (character classes, bounded quantifiers, ``\\b`` word
boundaries, non-capturing groups; NO lookaround or backreferences) so
the DuckDB oracle can run the byte-identical expressions — which is
also the portability contract a real pipeline wants between its Spark
pass and any sidecar tooling.

Audit semantics are SEQUENTIAL: each pattern's hit count is taken on
the text as it stands after the previous patterns' replacements (the
count of what this stage actually redacted) — e.g. digits inside an
already-redacted email are never double-counted by the phone pattern.
Replacement order is therefore part of the operator's contract and is
fixed by the ``patterns`` list order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, regex, replacement-token) — ordered; see module docstring.
#: Patterns are deliberately in the Java-regex ∩ RE2 subset.
DEFAULT_PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # ssn-shaped BEFORE phone: both are hyphenated digit runs, and the
    # fixed order makes the overlap resolution deterministic
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    ("phone", r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("card", r"\b[0-9]{13,16}\b", "<CARD>"),
)


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PII_PATTERNS,
    out_col: str = "clean_text",
) -> DataFrame:
    """Redact ``patterns`` from ``text_col`` in one narrow projection.

    Adds ``out_col`` (the scrubbed text) and one ``n_<name>`` BIGINT
    audit column per pattern — the count of redactions that pattern
    performed, evaluated sequentially (on the text after the previous
    patterns ran).  All other columns pass through unchanged.  No
    shuffle, no UDF: ``regexp_count`` / ``regexp_replace`` are
    codegen'd JVM expressions.
    """
    stage: Column = F.col(text_col)
    counts: list[Column] = []
    for name, pat, token in patterns:
        counts.append(
            F.regexp_count(stage, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        stage = F.regexp_replace(stage, pat, token)
    return df.select(
        "*", *counts, stage.alias(out_col)
    )


def pii_scrub_sql_duck(
    text_expr: str,
    patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PII_PATTERNS,
) -> tuple[list[str], str]:
    """The DuckDB twin of :func:`pii_scrub` for oracle construction:
    returns (per-pattern count SELECT expressions, scrubbed-text
    expression), built from the SAME pattern strings so the two engines
    run byte-identical regexes.  DuckDB needs the explicit ``'g'`` flag
    for global replacement (Spark's ``regexp_replace`` is global by
    default); counts use ``len(regexp_extract_all(...))``."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    stage = text_expr
    count_exprs = []
    for name, pat, token in patterns:
        count_exprs.append(
            f"CAST(len(regexp_extract_all({stage}, '{q(pat)}')) AS BIGINT)"
            f" AS n_{name}"
        )
        stage = f"regexp_replace({stage}, '{q(pat)}', '{q(token)}', 'g')"
    return count_exprs, stage

"""Order-insensitive Spark-vs-DuckDB result comparison.

Mirrors the driver's correctness gate: row count, column-name set, and an
order-insensitive comparison of values (columns sorted by name, rows sorted
by their stringified tuple). Floats are compared through a fixed-precision
string format; queries are expected to round in-query anyway (see
queries/catalog.py conventions).

:func:`frame_problems` additionally mirrors the driver's *pandas-level*
canonicalization, which this module's string normalization is blind to:
the driver hashes ``toPandas()`` / ``fetchdf()`` frames, so an int64-vs-
float64 dtype divergence (DuckDB HUGEINT) or an array-typed cell
(unhashable in pandas' sort) fails there even when stringified values
match. Round 2 shipped five driver failures that were locally green for
exactly this reason.
"""

from __future__ import annotations

import math
from typing import Any


def _norm_cell(v: Any) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_results(
    spark_cols: list[str],
    spark_rows: list[tuple],
    duck_cols: list[str],
    duck_rows: list[tuple],
) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}")
    a = normalize(spark_cols, spark_rows)
    b = normalize(duck_cols, duck_rows)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        problems.append(f"value mismatch: spark-only={diff_a} duck-only={diff_b}")
    return problems


def frame_problems(spark_pdf, duck_pdf) -> list[str]:
    """Driver-canonicalizer compatibility checks on the pandas frames.

    - dtype *kind* must match per column (int-width differences are fine —
      they stringify identically — but int64 vs float64 is exactly the
      DuckDB-HUGEINT bug class and must fail);
    - no object column may hold list/tuple/ndarray/dict cells (the
      driver's pandas sort factorizes cells; unhashable cells crash it).
    """
    problems: list[str] = []
    shared = [c for c in spark_pdf.columns if c in set(duck_pdf.columns)]
    for c in shared:
        sk = spark_pdf[c].dtype.kind
        dk = duck_pdf[c].dtype.kind
        if sk == dk or {sk, dk} <= {"i", "u"}:
            continue
        problems.append(
            f"dtype mismatch on {c}: spark={spark_pdf[c].dtype} "
            f"duck={duck_pdf[c].dtype} (driver hasher is dtype-sensitive)"
        )
    for side, pdf in (("spark", spark_pdf), ("duck", duck_pdf)):
        for c in pdf.columns:
            if pdf[c].dtype.kind != "O":
                continue
            for v in pdf[c]:
                try:
                    hash(v)
                except TypeError:
                    problems.append(
                        f"{side}.{c}: unhashable {type(v).__name__} cell — "
                        "serialize arrays (catalog convention)"
                    )
                    break
    return problems

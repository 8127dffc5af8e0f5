"""Meta-tests for the oracle-comparison harness itself.

Round 2 shipped five driver-only failures (HUGEINT->float64 dtype drift,
array-typed cells) that the string-normalizing comparator was blind to;
``frame_problems`` exists to reproduce the driver's pandas-level
canonicalization locally. These tests pin that capability: each one feeds
the harness a miniature of a real round-2 failure and asserts it goes red.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .oracle_compare import compare_results, frame_problems


def test_hugeint_float64_vs_int64_is_flagged():
    """The exact round-2 bug class: DuckDB SUM(BIGINT) -> HUGEINT ->
    float64, equal values, different dtype — must be flagged."""
    spark_pdf = pd.DataFrame({"k": ["a", "b"], "n": np.array([5, 7], dtype="int64")})
    duck_pdf = pd.DataFrame({"k": ["a", "b"], "n": np.array([5.0, 7.0], dtype="float64")})
    problems = frame_problems(spark_pdf, duck_pdf)
    assert any("dtype mismatch on n" in p for p in problems)


def test_int_width_difference_is_not_flagged():
    """int32 vs int64 stringify identically — width alone must pass."""
    spark_pdf = pd.DataFrame({"n": np.array([5], dtype="int32")})
    duck_pdf = pd.DataFrame({"n": np.array([5], dtype="int64")})
    assert frame_problems(spark_pdf, duck_pdf) == []


def test_array_typed_cells_are_flagged():
    """The embedding_quantize_int8 crash class: list cells are unhashable
    in the driver canonicalizer — must be flagged on either side."""
    spark_pdf = pd.DataFrame({"codes": [[1, 2], [3]]})
    duck_pdf = pd.DataFrame({"codes": ["1,2", "3"]})
    problems = frame_problems(spark_pdf, duck_pdf)
    assert any("unhashable list" in p for p in problems)
    # numpy arrays (Arrow-backed toPandas) are equally unhashable
    spark_np = pd.DataFrame({"codes": [np.array([1, 2]), np.array([3])]})
    problems_np = frame_problems(spark_np, duck_pdf)
    assert any("unhashable ndarray" in p for p in problems_np)


def test_matching_frames_pass_both_layers():
    spark_pdf = pd.DataFrame({"k": ["a"], "n": np.array([5], dtype="int64")})
    duck_pdf = pd.DataFrame({"k": ["a"], "n": np.array([5], dtype="int64")})
    assert frame_problems(spark_pdf, duck_pdf) == []
    assert (
        compare_results(
            list(spark_pdf.columns),
            [tuple(r) for r in spark_pdf.itertuples(index=False, name=None)],
            list(duck_pdf.columns),
            [tuple(r) for r in duck_pdf.itertuples(index=False, name=None)],
        )
        == []
    )


def test_changed_this_round_rejects_driver_false(monkeypatch):
    """ADVICE r10: a driver=False name in _CHANGED_THIS_ROUND would
    silently re-enter the driver sweep the fold-out contract removed it
    from — _ordered() must refuse it loudly."""
    from spotify_etl_pipeline_spark.queries import catalog

    catalog._load_all()
    nondriver = next(
        n for n, s in catalog.CATALOG.items() if not s.driver
    )
    monkeypatch.setattr(catalog, "_CHANGED_THIS_ROUND", (nondriver,))
    import pytest

    with pytest.raises(ValueError, match="driver=False"):
        catalog._ordered()


def test_changed_this_round_rejects_unknown_name(monkeypatch):
    from spotify_etl_pipeline_spark.queries import catalog

    monkeypatch.setattr(
        catalog, "_CHANGED_THIS_ROUND", ("no_such_query_xyz",)
    )
    import pytest

    with pytest.raises(KeyError, match="not in catalog"):
        catalog._ordered()


def test_survey_210_xids_all_greppable_in_catalog():
    """VERDICT r11 #7: every extension id in SURVEY.md §2.10's table
    must appear in at least one catalog registration's survey= tag, so
    the audit is one grep instead of a document join.  X13 (Z-order
    layout) is the lone exemption: it is a table-maintenance op with no
    query/oracle form — its evidence is the pyarrow file-stats
    skip-fraction test (SURVEY §2.10 row X13).  The id list is parsed
    from SURVEY.md itself so new rows are covered automatically."""
    import re
    from pathlib import Path

    from spotify_etl_pipeline_spark.queries.catalog import full_catalog

    survey = (Path(__file__).resolve().parents[1] / "SURVEY.md").read_text()
    xids = set(re.findall(r"^\| (X\d+) \|", survey, flags=re.M))
    assert len(xids) >= 40, sorted(xids)
    tagged = set()
    for spec in full_catalog().values():
        tagged.update(t.strip() for t in spec.survey.split(","))
    missing = sorted(xids - tagged - {"X13"}, key=lambda x: int(x[1:]))
    assert not missing, f"SURVEY §2.10 ids with no survey= tag: {missing}"

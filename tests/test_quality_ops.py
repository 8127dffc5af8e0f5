"""Unit tests for the round-3 quality tier: expectation suite violation
counting, FastSS fuzzy-match recall, and interval-overlap correctness —
each against hand-built dirty data or a naive quadratic reference, not
just the clean fixtures (where every expectation passes vacuously)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators import expectations as X
from spotify_etl_pipeline_spark.operators.fuzzy import fuzzy_match_pairs
from spotify_etl_pipeline_spark.operators.intervals import interval_overlap_join


def test_expectation_suite_counts_violations(spark):
    """Dirty synthetic batch: duplicate key, null FK, out-of-set status,
    out-of-range amount, orphan FK — every rule must count its own
    violations exactly."""
    orders = spark.createDataFrame(
        [
            (1, 10, "OPEN", 50.0),
            (1, 11, "OPEN", 60.0),      # duplicate o_id
            (2, None, "OPEN", 70.0),    # null customer
            (3, 12, "BOGUS", 80.0),     # bad status
            (4, 13, "CLOSED", -5.0),    # negative amount
        ],
        "o_id long, cust long, status string, amount double",
    )
    dim = spark.createDataFrame([(10,), (11,), (12,)], "cust_id long")
    report = X.expectation_suite(
        [
            X.unique_key(orders, "o_id"),
            X.column_rules_report(
                orders,
                [
                    X.not_null("cust"),
                    X.in_set("status", ["OPEN", "CLOSED"]),
                    X.in_range("amount", 0.0, 100.0),
                ],
            ),
            X.foreign_key_report(orders, "cust", dim, "cust_id", "cust_fk"),
        ]
    )
    got = {r["constraint"]: (r["n_violations"], r["passed"]) for r in report.collect()}
    assert got["o_id_unique"] == (1, False)
    assert got["cust_not_null"] == (1, False)
    assert got["status_in_set"] == (1, False)
    assert got["amount_in_range"] == (1, False)
    # orphans: cust=13 (absent in dim) and cust=None (null never resolves)
    assert got["cust_fk"] == (2, False)
    assert all(r["n_checked"] == 5 for r in report.collect())


def test_expectation_suite_one_scan_per_table(spark):
    """The point of the suite: k column rules must NOT re-scan the table
    k times — one scan node per column_rules_report."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("x")
    )
    report = X.column_rules_report(
        df, [X.in_range("x", 0, 6), X.not_null("x"), X.in_range("id", 0, 99)]
    )
    plan = report._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Range (0, 100") == 1, plan


def test_fuzzy_match_finds_all_edit1_pair_kinds(spark):
    """Deletion-1 blocking must catch substitution, insertion, AND
    deletion pairs — compared against the naive quadratic levenshtein
    join on a set with known structure (plus decoys at distance ≥ 2)."""
    names = [
        (0, "alpha"),
        (1, "alphb"),   # substitution of 0
        (2, "alpha7"),  # insertion into 0
        (3, "alph"),    # deletion from 0
        (4, "beta"),
        (5, "betta"),   # insertion into 4
        (6, "gamma"),   # decoy: distance >= 2 from everything
        (7, "delta"),   # decoy
    ]
    df = spark.createDataFrame(names, "id long, name string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_match_pairs(df, "id", "name").collect()
    }
    naive = df.select(F.col("id").alias("ia"), F.col("name").alias("na")).crossJoin(
        df.select(F.col("id").alias("ib"), F.col("name").alias("nb"))
    )
    want = {
        (r["ia"], r["ib"], r["d"])
        for r in naive.filter(F.col("ia") < F.col("ib"))
        .withColumn("d", F.levenshtein("na", "nb"))
        .filter(F.col("d") <= 1)
        .collect()
    }
    assert got == want
    assert (0, 1, 1) in got and (0, 2, 1) in got and (0, 3, 1) in got


def test_fuzzy_match_variant_cap_bounds_hot_buckets(spark):
    """max_variant_df must (a) never invent pairs, (b) keep pairs whose
    strings still share a sub-cap variant, and (c) drop pairs reachable
    only through hot variants — the documented recall trade."""
    # ten 2-char strings all sharing deletion variant "a" (hot bucket),
    # plus an isolated distance-1 pair with rare variants
    rows = [(i, "a" + c) for i, c in enumerate("bcdefghijk")] + [
        (100, "xyzzy"),
        (101, "xyzziy"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    plain = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_match_pairs(df, "id", "name").collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_match_pairs(df, "id", "name", max_variant_df=3).collect()
    }
    assert capped <= plain
    assert (100, 101) in capped  # rare-variant pair survives the cap
    # the ab/ac/... clique is reachable only via the hot "a" variant
    assert not any(a < 100 and b < 100 for a, b in capped)
    assert any(a < 100 and b < 100 for a, b in plain)


def test_fuzzy_match_rejects_unsupported_radius(spark):
    import pytest

    df = spark.createDataFrame([(0, "a")], "id long, name string")
    with pytest.raises(ValueError):
        fuzzy_match_pairs(df, "id", "name", max_dist=2)


def _intervals(spark, rows):
    return spark.createDataFrame(rows, "id long, start_us long, end_us long")


def test_interval_overlap_matches_naive_join(spark):
    """Bucketed overlap join == naive quadratic join, on intervals placed
    to cross bucket boundaries, nest, touch, and miss."""
    w = 10  # seconds; bucket width = 10s
    a = _intervals(
        spark,
        [
            (1, 0, 10_000_000),            # exactly one bucket
            (2, 5_000_000, 15_000_000),    # straddles buckets 0/1
            (3, 40_000_000, 50_000_000),
        ],
    )
    b = _intervals(
        spark,
        [
            (10, 9_000_000, 19_000_000),   # overlaps 1 (1s) and 2 (6s)
            (11, 15_000_000, 25_000_000),  # touches 2 at a point
            (12, 26_000_000, 36_000_000),  # overlaps nothing
            (13, 41_000_000, 45_000_000),  # nested inside 3
        ],
    )
    got = {
        (r["a_id"], r["b_id"], r["overlap_sec"])
        for r in interval_overlap_join(a, b, max_len_sec=w).collect()
    }
    naive = (
        a.crossJoin(
            b.select(
                F.col("id").alias("bid"),
                F.col("start_us").alias("bs"),
                F.col("end_us").alias("be"),
            )
        )
        .filter((F.col("start_us") <= F.col("be")) & (F.col("bs") <= F.col("end_us")))
        .select(
            F.col("id").alias("a_id"),
            F.col("bid").alias("b_id"),
            F.expr(
                "(least(end_us, be) - greatest(start_us, bs)) div 1000000"
            ).alias("overlap_sec"),
        )
    )
    want = {(r["a_id"], r["b_id"], r["overlap_sec"]) for r in naive.collect()}
    assert got == want
    assert (2, 11, 0) in got  # touching endpoints count with overlap 0
    assert (1, 10, 1) in got and (3, 13, 4) in got
    assert all(r[1] != 12 for r in got)


def test_interval_overlap_no_duplicate_pairs(spark):
    """A pair co-residing in two buckets must be emitted exactly once
    (the greatest-start ownership filter, not a DISTINCT)."""
    a = _intervals(spark, [(1, 5_000_000, 15_000_000)])
    b = _intervals(spark, [(2, 6_000_000, 14_000_000)])
    rows = interval_overlap_join(a, b, max_len_sec=10).collect()
    assert len(rows) == 1 and rows[0]["overlap_sec"] == 8


def test_snapshot_diff_classifies_and_handles_nulls(spark):
    """added/removed/changed classification with null-safe comparison:
    null→value and value→null are changes, null→null is not."""
    from spotify_etl_pipeline_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "a", 1.0),
            (2, "b", None),   # value appears in new → changed
            (3, None, 3.0),   # null→null on x, value→null on y → changed(y)
            (4, "d", 4.0),    # identical → absent from output
            (5, "e", 5.0),    # missing from new → removed
        ],
        "k long, x string, y double",
    )
    new = spark.createDataFrame(
        [
            (1, "a2", 1.5),   # both columns changed
            (2, "b", 2.0),
            (3, None, None),
            (4, "d", 4.0),
            (6, "f", 6.0),    # missing from old → added
        ],
        "k long, x string, y double",
    )
    got = {
        r["k"]: (r["change_type"], r["changed_cols"])
        for r in snapshot_diff(old, new, "k", ["x", "y"]).collect()
    }
    assert got == {
        1: ("changed", "x,y"),
        2: ("changed", "y"),
        3: ("changed", "y"),
        5: ("removed", ""),
        6: ("added", ""),
    }


def test_heavy_hitters_sketch_captures_exact(spark, sf_dir):
    """freqItems' documented guarantee, checked end-to-end on the fixture:
    every exact heavy hitter is in the sketch result."""
    from spotify_etl_pipeline_spark.queries.catalog import queries

    rows = queries()["heavy_hitters_check"](spark, sf_dir).collect()
    assert rows, "support 0.2 should produce at least one heavy hitter"
    assert all(r["found_by_sketch"] for r in rows)


def test_hll_sketches_merge_across_persisted_shards(spark, sf_dir, tmp_path):
    """Sketches-as-data: the 100 TB pattern is to PERSIST per-partition /
    per-day HLL sketches and answer later cardinality questions by merging
    the stored bytes — never rescanning raw keys. Round-trip the binary
    sketch column through parquet and assert (a) the merged estimate
    matches the estimate from a single-pass sketch exactly (HLL union is
    lossless over disjoint register sets of the same lgConfigK), and
    (b) it lands within the configured error band of the exact count."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.schemas import load_fixture

    cust = load_fixture(spark, sf_dir, "customer")
    shard_path = str(tmp_path / "daily_sketches")
    (
        cust.groupBy("c_nationkey")
        .agg(F.hll_sketch_agg("c_custkey", F.lit(14)).alias("sk"))
        .write.parquet(shard_path)
    )
    merged = (
        spark.read.parquet(shard_path)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    single_pass = cust.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey", F.lit(14))).alias("est")
    ).first()["est"]
    exact = cust.select("c_custkey").distinct().count()
    assert merged == single_pass
    assert abs(merged - exact) <= 0.02 * exact


def test_ngram_diversity_planted_extremes(spark):
    """All-repeat doc -> minimum diversity; all-unique doc -> 1000."""
    from spotify_etl_pipeline_spark.queries.text_queries import (
        text_ngram_diversity,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture  # noqa: F401

    import spotify_etl_pipeline_spark.queries.text_queries as tq

    docs = spark.createDataFrame(
        [
            (0, " ".join(["x"] * 30)),  # 28 identical trigrams
            (1, " ".join(f"u{i}" for i in range(30))),  # all distinct
            (2, "a b"),  # shorter than one trigram -> excluded
        ],
        ["doc_id", "text"],
    )
    # call the entry's body over a custom frame via the same expressions
    import types

    def run(df):
        from pyspark.sql import functions as F

        g = df.select(
            "doc_id",
            F.expr(
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

    got = {r["doc_id"]: r for r in run(docs).collect()}
    assert set(got) == {0, 1}
    assert got[0]["n_distinct"] == 1 and got[0]["diversity_permille"] == 1000 // 28
    assert got[1]["diversity_permille"] == 1000


def test_source_overlap_matrix_planted_pair(spark, sf_dir):
    """The overlap audit must count exactly the distinct shared 5-grams
    per source pair, and the fixture's replicated boilerplate must
    surface as nonzero cross-source overlap."""
    from spotify_etl_pipeline_spark.queries.quality_ops import (
        source_overlap_matrix,
    )

    rows = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in source_overlap_matrix(spark, sf_dir).collect()
    }
    assert rows and all(a < b for a, b in rows)  # strict upper triangle
    assert all(n > 0 for n in rows.values())


def test_source_overlap_sketched_tolerance_and_determinism(spark, sf_dir):
    """The fixed-threshold sampled estimator must sit inside the 6*sqrt
    band against the exact matrix for EVERY pair (the entry's in-query
    boolean), be a pure content function (re-run identical), and be
    unbiased enough that the mean signed error is well under one sigma."""
    import math

    from spotify_etl_pipeline_spark.queries.quality_ops import (
        source_overlap_sketched,
    )

    rows = source_overlap_sketched(spark, sf_dir).collect()
    assert rows
    assert all(r["within_tol"] for r in rows)
    errs = [r["n_shared_est"] - r["n_shared"] for r in rows]
    sigma = max(math.sqrt(4 * r["n_shared"]) for r in rows)
    assert abs(sum(errs) / len(errs)) <= sigma
    again = {
        (r["source_a"], r["source_b"]): r["n_shared_est"]
        for r in source_overlap_sketched(spark, sf_dir).collect()
    }
    assert again == {
        (r["source_a"], r["source_b"]): r["n_shared_est"] for r in rows
    }


def test_source_overlap_sampled_rate_one_is_exact(spark, sf_dir):
    """rate_denom=1 samples everything — the sketch must reproduce the
    exact matrix bit-for-bit (the estimator's degenerate-exact anchor)."""
    from spotify_etl_pipeline_spark.operators.dedup import (
        source_overlap_sampled,
    )
    from spotify_etl_pipeline_spark.queries.quality_ops import (
        source_overlap_matrix,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, sf_dir, "documents")
    est = {
        (r["source_a"], r["source_b"]): r["n_shared_est"]
        for r in source_overlap_sampled(docs, n=5, rate_denom=1).collect()
    }
    exact = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in source_overlap_matrix(spark, sf_dir).collect()
    }
    assert est == exact


def test_source_overlap_sampled_xxhash_default_in_band(spark, sf_dir):
    """The xxhash64 production default (a different but equally pure
    content sample) must also sit inside the 6*sqrt band vs exact
    (measured worst 5.3*sqrt across sf0.01/sf0.1)."""
    import math

    from spotify_etl_pipeline_spark.operators.dedup import (
        source_overlap_sampled,
    )
    from spotify_etl_pipeline_spark.queries.quality_ops import (
        source_overlap_matrix,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, sf_dir, "documents")
    ex = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in source_overlap_matrix(spark, sf_dir).collect()
    }
    es = {
        (r["source_a"], r["source_b"]): r["n_shared_est"]
        for r in source_overlap_sampled(docs, n=5, rate_denom=4).collect()
    }
    assert ex
    for k, v in ex.items():
        assert abs(es.get(k, 0) - v) <= max(16, 6 * math.sqrt(v)), (k, v, es.get(k))

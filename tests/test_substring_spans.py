"""operators/text.py::exact_substring_spans — the exact substring-dedup
span tier (Lee et al. 2022): planted duplicates with known extents, the
hash-pruned/string-keyed path equivalence, and the coverage differential
against dup_span_coverage at the same width."""

from __future__ import annotations

import pytest

from spotify_etl_pipeline_spark.operators.text import (
    dup_span_coverage,
    exact_substring_spans,
)
from spotify_etl_pipeline_spark.schemas import load_fixture


def _spans(df):
    return {(r["doc_id"], r["span_start"], r["span_len"]) for r in df.collect()}


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_planted_duplicate_exact_extents(spark):
    # docs 0 and 1 share tokens d1..d12 verbatim; everything else is unique.
    shared = " ".join(f"d{i}" for i in range(1, 13))  # 12 tokens
    docs = _mkdocs(
        spark,
        [
            "a1 a2 a3 " + shared + " a4 a5",  # shared at 1-based pos 4..15
            shared + " b1 b2 b3 b4 b5 b6 b7",  # shared at pos 1..12
            "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14",  # no dup
        ],
    )
    got = _spans(exact_substring_spans(docs, min_len=10))
    assert got == {(0, 4, 12), (1, 1, 12)}


def test_shorter_than_threshold_is_invisible(spark):
    shared = " ".join(f"d{i}" for i in range(1, 10))  # 9 tokens < L=10
    docs = _mkdocs(
        spark,
        ["x1 x2 " + shared + " x3", shared + " y1 y2 y3"],
    )
    assert _spans(exact_substring_spans(docs, min_len=10)) == set()


def test_two_islands_stay_separate(spark):
    # two shared runs separated by >L unique tokens -> two maximal spans
    s1 = " ".join(f"p{i}" for i in range(1, 12))  # 11 tokens
    s2 = " ".join(f"q{i}" for i in range(1, 12))  # 11 tokens
    gap = " ".join(f"u{i}" for i in range(1, 16))  # 15 unique tokens
    docs = _mkdocs(
        spark,
        [s1 + " " + gap + " " + s2, s1 + " z1 z2 z3 z4 z5 " + s2],
    )
    got = _spans(exact_substring_spans(docs, min_len=10))
    # doc 0: s1 at 1..11, s2 at 27..37; doc 1: s1 at 1..11, s2 at 17..27
    assert got == {(0, 1, 11), (0, 27, 11), (1, 1, 11), (1, 17, 11)}


def test_within_doc_repeat_is_not_cross_doc(spark):
    # the same phrase twice in ONE doc only: cross-doc test must not fire
    s = " ".join(f"r{i}" for i in range(1, 12))
    docs = _mkdocs(
        spark,
        [s + " m1 m2 m3 " + s, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10 n11 n12"],
    )
    assert _spans(exact_substring_spans(docs, min_len=10)) == set()


def test_hash_pruned_equals_string_keyed(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents")
    fast = _spans(exact_substring_spans(docs, min_len=10, hash_prune=True))
    slow = _spans(exact_substring_spans(docs, min_len=10, hash_prune=False))
    assert fast == slow and fast


def test_span_totals_match_dup_span_coverage_at_same_width(spark, sf_dir):
    """Differential closure: per doc, the summed extent of the maximal
    spans must equal dup_span_coverage's covered-token count when both
    run at the same width — two independent plans (islands-of-positions
    vs fixed-width sweep-line) deriving the same union."""
    from pyspark.sql import functions as F

    docs = load_fixture(spark, sf_dir, "documents")
    w = 10
    spans = exact_substring_spans(docs, min_len=w)
    per_doc = {
        r["doc_id"]: r["tot"]
        for r in spans.groupBy("doc_id").agg(F.sum("span_len").alias("tot")).collect()
    }
    cov = {
        r["doc_id"]: r["dup_tokens"]
        for r in dup_span_coverage(docs, w=w).filter(F.col("dup_tokens") > 0).collect()
    }
    assert per_doc == cov and per_doc


def test_rejects_degenerate_width(spark):
    docs = _mkdocs(spark, ["a b c"])
    with pytest.raises(ValueError, match="min_len"):
        exact_substring_spans(docs, min_len=1)


def test_cut_removes_exactly_the_planted_span(spark):
    from spotify_etl_pipeline_spark.operators.text import substring_cut_corpus

    shared = " ".join(f"d{i}" for i in range(1, 13))  # 12 tokens
    docs = _mkdocs(
        spark,
        [
            "a1 a2 a3 " + shared + " a4 a5",
            shared + " b1 b2 b3 b4 b5 b6 b7",
            "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14",
        ],
    )
    got = {r["doc_id"]: r for r in substring_cut_corpus(docs, min_len=10).collect()}
    assert got[0]["clean_text"] == "a1 a2 a3 a4 a5"
    assert got[1]["clean_text"] == "b1 b2 b3 b4 b5 b6 b7"
    assert (got[0]["n_tokens"], got[0]["n_cut"]) == (17, 12)
    assert (got[1]["n_tokens"], got[1]["n_cut"]) == (19, 12)
    # untouched doc survives verbatim with zero cut
    assert got[2]["n_cut"] == 0 and got[2]["clean_text"].startswith("c1 c2")


def test_cut_fully_duplicated_doc_empties(spark):
    s = " ".join(f"d{i}" for i in range(1, 13))
    from spotify_etl_pipeline_spark.operators.text import substring_cut_corpus

    docs = _mkdocs(spark, [s, s + " tail1 tail2"])
    got = {r["doc_id"]: r for r in substring_cut_corpus(docs, min_len=10).collect()}
    assert got[0]["clean_text"] == "" and got[0]["n_cut"] == 12
    assert got[1]["clean_text"] == "tail1 tail2"


def test_cut_totals_match_span_extents(spark, sf_dir):
    """n_cut must equal the summed span extents per doc — the apply step
    consumes exactly the cut list the extent entry publishes."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.text import substring_cut_corpus

    docs = load_fixture(spark, sf_dir, "documents")
    spans_tot = {
        r["doc_id"]: r["tot"]
        for r in exact_substring_spans(docs, min_len=10)
        .groupBy("doc_id")
        .agg(F.sum("span_len").alias("tot"))
        .collect()
    }
    cut = {
        r["doc_id"]: r["n_cut"]
        for r in substring_cut_corpus(docs, min_len=10)
        .filter(F.col("n_cut") > 0)
        .collect()
    }
    assert cut == spans_tot and cut


def test_incremental_prober_matches_batch_on_new_docs(spark, sf_dir):
    """The stored-index serving path: probing substring_gram_index with a
    new batch must reproduce the batch operator's spans for exactly the
    new doc_ids (hash-exact semantics; the fixture has no 64-bit
    collisions)."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.text import (
        exact_substring_spans_incremental,
        substring_gram_index,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = substring_gram_index(old, min_len=10)
    inc = _spans(exact_substring_spans_incremental(idx, new, min_len=10))
    batch = {
        s
        for s in _spans(exact_substring_spans(docs, min_len=10))
        if s[0] % 5 == 0
    }
    assert inc == batch and inc


def test_incremental_prober_index_hit_and_batch_internal(spark):
    from spotify_etl_pipeline_spark.operators.text import (
        exact_substring_spans_incremental,
        substring_gram_index,
    )

    shared_old = " ".join(f"d{i}" for i in range(1, 13))
    shared_new = " ".join(f"e{i}" for i in range(1, 13))
    idx = substring_gram_index(
        _mkdocs(spark, [shared_old + " o1 o2 o3"]), min_len=10
    )
    new = spark.createDataFrame(
        [
            (10, "x1 x2 " + shared_old),  # index hit (cross-corpus)
            (11, shared_new + " y1"),  # batch-internal pair member
            (12, "z1 z2 z3 " + shared_new),  # batch-internal pair member
            (13, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"),  # unique
        ],
        ["doc_id", "text"],
    )
    got = _spans(exact_substring_spans_incremental(idx, new, min_len=10))
    assert got == {(10, 3, 12), (11, 1, 12), (12, 4, 12)}


# ---- round 7: skew-immune cross-doc test, witness policy, fixpoint,
# ---- self-match guard, verified probing


def test_cross_doc_test_is_partial_agg_not_window(spark, sf_dir):
    """The cross-doc min/max must be a partial-aggregating groupBy (+
    join-back), never Window.partitionBy over the unbounded gram/hash
    key: WindowExec materializes every occurrence of a key in one task,
    the hot spot a boilerplate gram would hit at 100 TB.  The only
    window allowed is the per-doc sweep (partitioned by doc_id)."""
    from spotify_etl_pipeline_spark.plans import executed_plan

    docs = load_fixture(spark, sf_dir, "documents")
    for hp in (True, False):
        plan = executed_plan(exact_substring_spans(docs, min_len=10, hash_prune=hp))
        assert "partial_min" in plan, plan  # map-side combine exists
        for ln in plan.splitlines():
            if "windowspecdefinition" in ln.lower() or ln.strip().startswith("Window "):
                assert "doc_id" in ln, f"window not keyed on doc_id: {ln}"


def test_keep_first_exempts_lowest_doc_witness(spark):
    shared = " ".join(f"d{i}" for i in range(1, 13))  # 12 tokens
    docs = _mkdocs(
        spark,
        [
            "a1 a2 a3 " + shared + " a4 a5",
            shared + " b1 b2 b3 b4 b5 b6 b7",
        ],
    )
    got = _spans(exact_substring_spans(docs, min_len=10, keep="first"))
    assert got == {(1, 1, 12)}  # doc 0 is the kept witness
    from spotify_etl_pipeline_spark.operators.text import substring_cut_corpus

    cut = {
        r["doc_id"]: r
        for r in substring_cut_corpus(docs, min_len=10, keep="first").collect()
    }
    assert cut[0]["n_cut"] == 0 and shared in cut[0]["clean_text"]
    assert cut[1]["clean_text"] == "b1 b2 b3 b4 b5 b6 b7"


def test_keep_first_cuts_witness_docs_internal_repeats(spark):
    """Lee et al.'s keep-one policy, exact (r8): when the witness
    document ITSELF repeats the duplicated window, only the single
    earliest occurrence — min (doc_id, p) — survives; the witness
    doc's later internal copy is cut like any other occurrence (the
    pre-r8 policy exempted the whole witness document)."""
    shared = " ".join(f"d{i}" for i in range(1, 13))  # 12 tokens
    docs = _mkdocs(
        spark,
        [
            shared + " x1 x2 " + shared,  # witness doc, internal repeat
            shared + " b1 b2 b3 b4 b5 b6 b7",
        ],
    )
    got = _spans(exact_substring_spans(docs, min_len=10, keep="first"))
    assert got == {(0, 15, 12), (1, 1, 12)}
    from spotify_etl_pipeline_spark.operators.text import substring_cut_corpus

    cut = {
        r["doc_id"]: r
        for r in substring_cut_corpus(docs, min_len=10, keep="first").collect()
    }
    assert cut[0]["n_cut"] == 12 and cut[0]["clean_text"] == shared + " x1 x2"
    assert cut[1]["clean_text"] == "b1 b2 b3 b4 b5 b6 b7"


def test_keep_rejects_unknown_policy(spark):
    docs = _mkdocs(spark, ["a b c d e f g h i j k l"])
    with pytest.raises(ValueError, match="keep"):
        exact_substring_spans(docs, min_len=10, keep="last").collect()


def test_fixpoint_removes_splice_created_duplicate(spark):
    """Cutting 'a1 a2 a3' from doc 0 splices 'u1 B u2' — which doc 2
    already contains verbatim — into existence; pass 1 misses it by
    construction, pass 2 removes it."""
    from spotify_etl_pipeline_spark.operators.text import (
        substring_cut_corpus,
        substring_cut_fixpoint,
    )

    docs = _mkdocs(
        spark,
        [
            "u1 a1 a2 a3 B u2",  # cut a1 a2 a3 -> "u1 B u2"
            "z1 a1 a2 a3 z2",  # the pass-1 partner
            "u1 B u2",  # untouched in pass 1; duplicated after the splice
        ],
    )
    # establish a clean cache baseline (the session is shared; some tests
    # leave deliberate session-lifetime caches — the graph-test protocol)
    spark.catalog.clearCache()
    one = {r["doc_id"]: r for r in substring_cut_corpus(docs, min_len=3).collect()}
    assert one[0]["clean_text"] == "u1 B u2"  # the spliced duplicate SURVIVES
    assert one[2]["clean_text"] == "u1 B u2"
    fix = {r["doc_id"]: r for r in substring_cut_fixpoint(docs, min_len=3).collect()}
    assert fix[0]["clean_text"] == "" and fix[0]["n_cut"] == 6
    assert fix[2]["clean_text"] == "" and fix[2]["n_cut"] == 3
    assert fix[1]["clean_text"] == "z1 z2" and fix[1]["n_cut"] == 3
    # hygiene (the graph-operator convention): nothing left in the session
    # DataFrame cache; localCheckpoint blocks are lineage-free and freed by
    # the ContextCleaner when the per-pass handles go out of scope
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_fixpoint_is_identity_on_converged_corpus(spark, sf_dir):
    """The synthetic fixture converges in one pass (no splice dups), so
    fixpoint == one-pass cut there — the differential that lets the
    driver entry's oracle be the iterated CTE."""
    from pyspark.sql import functions as F
    from spotify_etl_pipeline_spark.operators.text import (
        substring_cut_corpus,
        substring_cut_fixpoint,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    one = substring_cut_corpus(docs, min_len=10)
    fix = substring_cut_fixpoint(docs, min_len=10)
    assert one.exceptAll(fix).count() == 0 and fix.exceptAll(one).count() == 0


def test_fixpoint_raises_on_max_passes(spark):
    from spotify_etl_pipeline_spark.operators.text import substring_cut_fixpoint

    docs = _mkdocs(
        spark,
        [
            "u1 a1 a2 a3 B u2",
            "z1 a1 a2 a3 z2",
            "u1 B u2",
        ],
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        substring_cut_fixpoint(docs, min_len=3, max_passes=1)


def test_incremental_self_match_guard(spark):
    """A batch overlapping the indexed corpus must not flag a document
    against its own indexed copy — the stored min_doc/max_doc decide."""
    from spotify_etl_pipeline_spark.operators.text import (
        exact_substring_spans_incremental,
        substring_gram_index,
    )

    t10 = " ".join(f"s{i}" for i in range(1, 13))
    t11 = " ".join(f"e{i}" for i in range(1, 13))
    idx = substring_gram_index(
        _mkdocs_ids(spark, [(10, t10), (11, t11), (12, "q1 " + t11 + " q2")]),
        min_len=10,
    )
    # doc 10 re-probes ITSELF: no other doc shares its text -> no span;
    # doc 11 also self-matches BUT doc 12 shares its text -> flagged
    got = _spans(
        exact_substring_spans_incremental(
            idx,
            _mkdocs_ids(spark, [(10, t10), (11, t11)]),
            min_len=10,
        )
    )
    assert got == {(11, 1, 12)}


def _mkdocs_ids(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_verified_probing_rejects_engineered_collision(spark):
    """An index row carrying the RIGHT 64-bit key but the WRONG gram
    digest (a forged/corrupt entry shaped like a 64-bit collision) is a
    hit under default hash-exact probing and is REJECTED under
    verify=True — the digest plays the batch operator's string-verify
    role."""
    from pyspark.sql import functions as F
    from spotify_etl_pipeline_spark.operators.text import (
        exact_substring_spans_incremental,
    )

    gram = " ".join(f"g{i}" for i in range(1, 11))  # exactly L=10 tokens
    batch = _mkdocs_ids(spark, [(50, gram)])
    (h_val,) = (
        spark.range(1)
        .select(F.xxhash64(F.lit(gram)).alias("h"))
        .collect()[0]
    )
    forged = spark.createDataFrame(
        [(h_val, "0" * 16, 1, 1, 1)],
        ["h", "dg", "min_doc", "max_doc", "n_pos"],
    )
    unverified = _spans(
        exact_substring_spans_incremental(forged, batch, min_len=10)
    )
    assert unverified == {(50, 1, 10)}  # hash-exact mode is fooled
    verified = _spans(
        exact_substring_spans_incremental(forged, batch, min_len=10, verify=True)
    )
    assert verified == set()  # digest mismatch kills the forgery
    # and a GENUINE digest index still matches under verify=True
    from spotify_etl_pipeline_spark.operators.text import substring_gram_index

    real_idx = substring_gram_index(
        _mkdocs_ids(spark, [(1, "x0 " + gram)]), min_len=10, digest=True
    )
    assert _spans(
        exact_substring_spans_incremental(real_idx, batch, min_len=10, verify=True)
    ) == {(50, 1, 10)}


def test_verify_requires_digest_index(spark):
    from spotify_etl_pipeline_spark.operators.text import (
        exact_substring_spans_incremental,
        substring_gram_index,
    )

    idx = substring_gram_index(_mkdocs(spark, ["a b c"]), min_len=2)
    with pytest.raises(ValueError, match="digest=True"):
        exact_substring_spans_incremental(idx, _mkdocs(spark, ["a b"]), min_len=2, verify=True)


# --- intradoc_duplicate_spans / intradoc_cut_corpus (the X30 tier) ---


def test_intradoc_planted_repeat_extents(spark):
    from spotify_etl_pipeline_spark.operators.text import (
        intradoc_duplicate_spans,
    )

    # R (10 tokens) appears twice INSIDE doc 0, nowhere else
    rep = " ".join(f"r{i}" for i in range(1, 11))
    docs = _mkdocs(
        spark,
        [
            "u1 u2 u3 u4 u5 " + rep + " v1 v2 v3 v4 v5 " + rep + " w1 w2",
            "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12",
        ],
    )
    # keep="first": only the SECOND occurrence (pos 21..30) is cut-listed
    assert _spans(intradoc_duplicate_spans(docs, min_len=10)) == {(0, 21, 10)}
    # keep="all": both occurrences, two islands (gap 15 > L)
    assert _spans(
        intradoc_duplicate_spans(docs, min_len=10, keep="all")
    ) == {(0, 6, 10), (0, 21, 10)}


def test_intradoc_blind_to_cross_doc_duplicates(spark):
    from spotify_etl_pipeline_spark.operators.text import (
        intradoc_duplicate_spans,
    )

    shared = " ".join(f"d{i}" for i in range(1, 13))
    docs = _mkdocs(spark, [shared + " a1 a2", shared + " b1 b2"])
    # duplicated ACROSS docs but never within one -> intra-doc sees nothing
    assert _spans(intradoc_duplicate_spans(docs, min_len=10)) == set()


def test_intradoc_run_collapses_to_first_window(spark):
    from spotify_etl_pipeline_spark.operators.text import (
        intradoc_cut_corpus,
        intradoc_duplicate_spans,
    )

    docs = _mkdocs(spark, [" ".join(["x"] * 30)])
    # all 27 windows of L=4 are identical; keep-first exempts p=1 so the
    # covered run is positions 2..30 -> one span, and the cut collapses
    # the whole repetition to its first window's surviving token prefix
    assert _spans(intradoc_duplicate_spans(docs, min_len=4)) == {(0, 2, 29)}
    row = intradoc_cut_corpus(docs, min_len=4).collect()[0]
    assert (row["n_tokens"], row["n_cut"], row["clean_text"]) == (30, 29, "x")


def test_intradoc_hash_prune_equals_string_path(spark, sf_dir):
    from spotify_etl_pipeline_spark.operators.text import (
        intradoc_duplicate_spans,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    a = _spans(intradoc_duplicate_spans(docs, min_len=4, hash_prune=True))
    b = _spans(intradoc_duplicate_spans(docs, min_len=4, hash_prune=False))
    assert a == b


def test_intradoc_cut_keep_all_removes_every_copy(spark):
    from spotify_etl_pipeline_spark.operators.text import intradoc_cut_corpus

    rep = " ".join(f"r{i}" for i in range(1, 6))  # 5 tokens
    docs = _mkdocs(spark, ["a1 " + rep + " b1 " + rep + " c1"])
    row = intradoc_cut_corpus(docs, min_len=5, keep="all").collect()[0]
    assert (row["n_cut"], row["clean_text"]) == (10, "a1 b1 c1")
    row = intradoc_cut_corpus(docs, min_len=5, keep="first").collect()[0]
    assert row["clean_text"] == "a1 " + rep + " b1 c1"


def test_intradoc_production_L_planted_extents(spark):
    """X30 at PRODUCTION extent (r8): Lee et al. cut spans of >=50
    tokens; the catalog runs the tier at L=4 only because the fixture
    self-repeats nowhere longer — this pins the operator at L=50 on
    planted within-doc blocks.  Doc layout: B(60) F(30) B(60) — the
    60-token block B repeats inside the doc with doc-unique tokens, so
    every duplicated window is strictly intra-doc.  Expected under
    keep='first': the second copy's full 60-token extent, exactly."""
    from spotify_etl_pipeline_spark.operators.text import (
        intradoc_cut_corpus,
        intradoc_duplicate_spans,
    )

    L = 50
    rows = []
    for d in range(20):
        block = " ".join(f"b{d}x{i}" for i in range(60))
        filler = " ".join(f"f{d}w{j}" for j in range(30))
        if d % 2 == 0:  # planted repeat
            rows.append((d, block + " " + filler + " " + block))
        else:  # control: no repetition
            rows.append((d, block + " " + filler))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = _spans(intradoc_duplicate_spans(docs, min_len=L))
    # second block starts at position 60 + 30 + 1 = 91, extends 60 tokens
    assert got == {(d, 91, 60) for d in range(20) if d % 2 == 0}
    cut = {r["doc_id"]: r for r in intradoc_cut_corpus(docs, min_len=L).collect()}
    for d in range(20):
        if d % 2 == 0:
            assert cut[d]["n_cut"] == 60
            block = " ".join(f"b{d}x{i}" for i in range(60))
            assert cut[d]["clean_text"].startswith(block)
            assert cut[d]["clean_text"].count(f"b{d}x0 ") == 1
        else:
            assert cut[d]["n_cut"] == 0

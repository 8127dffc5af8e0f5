"""Curation-operator properties: decontamination must catch copies, and
mixture sampling must be a pure content function with rates near targets."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.curation import (
    benchmark_ngram_hits,
    mixture_sample,
)
from spotify_etl_pipeline_spark.schemas import load_fixture


def test_decontamination_flags_exact_and_partial_copies(spark):
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            # exact copy → every 5-gram shared
            (10, "the quick brown fox jumps over the lazy dog tonight"),
            # shares one 5-gram window
            (11, "she saw the quick brown fox jumps nearby yesterday evening"),
            # clean
            (12, "completely unrelated words about spark dataframes and parquet"),
        ],
        ["doc_id", "text"],
    )
    hits = {r.doc_id: r.n_hits for r in benchmark_ngram_hits(corpus, bench, n=5).collect()}
    assert hits[10] == 6  # 10 tokens → 6 five-grams, all shared
    assert hits[11] == 1  # exactly the "the quick brown fox jumps" window
    assert 12 not in hits


def test_mixture_sample_is_deterministic_and_near_target(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents")
    fractions = {f"src{i}": (i % 4 + 1) / 4 for i in range(20)}
    # perturbed lineage, not the same plan twice: the stability claim is
    # about re-ingestion/reordering, so the second sample runs over a
    # repartitioned (different physical layout) input
    kept_a = mixture_sample(docs, fractions).select("doc_id")
    kept_b = mixture_sample(docs.repartition(7, "lang"), fractions).select("doc_id")
    assert kept_a.exceptAll(kept_b).count() == 0
    assert kept_b.exceptAll(kept_a).count() == 0
    # full-keep sources survive whole; quarter-keep sources shrink
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = {
        r.source: r.n
        for r in mixture_sample(docs, fractions)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    full = [s for s, f in fractions.items() if f == 1.0 and s in totals]
    assert full and all(kept.get(s, 0) == totals[s] for s in full)
    quarter = [s for s, f in fractions.items() if f == 0.25 and s in totals]
    assert quarter and sum(kept.get(s, 0) for s in quarter) < sum(totals[s] for s in quarter)


def test_decontamination_empty_benchmark_flags_nothing(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents").limit(50)
    empty_bench = docs.filter(F.lit(False))
    assert benchmark_ngram_hits(docs, empty_bench, n=5).count() == 0


def test_decontamination_short_docs_cannot_match(spark):
    """Documents shorter than n tokens produce no shingles — neither side
    can match, and neither side crashes."""
    bench = spark.createDataFrame([(1, "too short")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(10, "too short"), (11, ""), (12, "one two three four five")],
        ["doc_id", "text"],
    )
    assert benchmark_ngram_hits(corpus, bench, n=5).count() == 0


def test_lsh_ann_handles_empty_and_single_vector(spark, sf_dir):
    from spotify_etl_pipeline_spark.operators.similarity import lsh_bucketed_ann

    emb = load_fixture(spark, sf_dir, "embeddings")
    assert lsh_bucketed_ann(emb.filter(F.lit(False))).count() == 0
    assert lsh_bucketed_ann(emb.limit(1)).count() == 0  # no pair from one vector


def test_mixture_sample_unlisted_sources_kept_whole(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents")
    kept = mixture_sample(docs, {"src0": 0.0})
    assert kept.filter(F.col("source") == "src0").count() == 0
    others = docs.filter(F.col("source") != "src0")
    assert kept.count() == others.count()


def test_budget_sample_caps_and_clamps(spark, sf_dir):
    from spotify_etl_pipeline_spark.operators.curation import (
        budget_mixture_sample,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    totals = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
        .collect()
    }
    budget = 4_000
    kept = budget_mixture_sample(docs, stratum="lang", token_budget=budget)
    got = {
        r["lang"]: (r["n"], r["t"])
        for r in kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_nt").alias("t"))
        .collect()
    }
    n_by_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, total in totals.items():
        if total <= budget:
            # under budget -> clamped keep-whole: every doc survives
            assert got[lang] == (n_by_lang[lang], total)
        else:
            # over budget -> realized tokens near the cap (fingerprint
            # buckets are ~uniform; fixture-scale binomial slack)
            assert got[lang][1] <= budget * 1.5
            assert got[lang][1] >= budget * 0.5
            assert got[lang][0] < n_by_lang[lang]


def test_budget_sample_deterministic_under_repartition(spark, sf_dir):
    from spotify_etl_pipeline_spark.operators.curation import (
        budget_mixture_sample,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    a = {
        r["doc_id"]
        for r in budget_mixture_sample(docs, token_budget=4000)
        .select("doc_id")
        .collect()
    }
    b = {
        r["doc_id"]
        for r in budget_mixture_sample(
            docs.repartition(7, "source"), token_budget=4000
        )
        .select("doc_id")
        .collect()
    }
    assert a == b and a


def test_temperature_sample_flattens_toward_sqrt_shares(spark, sf_dir):
    from spotify_etl_pipeline_spark.operators.curation import (
        temperature_mixture_sample,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    totals = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
        .collect()
    }
    kept = temperature_mixture_sample(docs, total_token_budget=22_000)
    got = {
        r["lang"]: r["t"]
        for r in kept.groupBy("lang").agg(F.sum("_nt").alias("t")).collect()
    }
    # keep FRACTION must be anti-monotone in stratum size: bigger
    # languages are downsampled harder (kept tokens ~ sqrt share)
    fracs = {lang: got[lang] / totals[lang] for lang in totals}
    ordered = sorted(totals, key=totals.get)  # small -> large
    assert fracs[ordered[0]] >= fracs[ordered[-1]]
    big = ordered[-1]
    assert fracs[big] < 0.8  # the dominant stratum is really downsampled
    # and kept tokens never exceed the stratum itself
    assert all(got[lang] <= totals[lang] for lang in totals)


def test_temperature_sample_deterministic_under_repartition(spark, sf_dir):
    from spotify_etl_pipeline_spark.operators.curation import (
        temperature_mixture_sample,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    a = {
        r["doc_id"]
        for r in temperature_mixture_sample(docs, total_token_budget=22_000)
        .select("doc_id")
        .collect()
    }
    b = {
        r["doc_id"]
        for r in temperature_mixture_sample(
            docs.repartition(5, "lang"), total_token_budget=22_000
        )
        .select("doc_id")
        .collect()
    }
    assert a == b and a


def test_temperature_sample_driver_mode_matches_plan(spark, sf_dir):
    """thresholds_mode='driver' (bounded |strata| collect, Python-int
    exact arithmetic) must keep the EXACT same documents as the default
    in-plan BIGINT arithmetic inside the shared headroom domain."""
    from spotify_etl_pipeline_spark.operators.curation import (
        temperature_mixture_sample,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    plan = {
        r["doc_id"]
        for r in temperature_mixture_sample(docs, total_token_budget=22_000)
        .select("doc_id")
        .collect()
    }
    driver = {
        r["doc_id"]
        for r in temperature_mixture_sample(
            docs, total_token_budget=22_000, thresholds_mode="driver"
        )
        .select("doc_id")
        .collect()
    }
    assert plan == driver and plan


def test_temperature_sample_overflow_guard_raises(spark):
    """The r8 BIGINT headroom audit: at adversarial magnitudes the
    in-plan arithmetic must RAISE (clear message) strictly before
    wraparound, and thresholds_mode='driver' must compute the correct
    (budget >> corpus, keep-everything) answer on the same tile."""
    import pytest

    from spotify_etl_pipeline_spark.operators.curation import (
        temperature_mixture_sample,
    )

    docs = spark.createDataFrame(
        [(i, "en", "tok " * 50) for i in range(4)], ["doc_id", "lang", "text"]
    )
    # gran*budget*w ~ 1e4 * 1e13 * ~1.4e4 ~ 1.4e21 >> 2^63
    huge = 10_000_000_000_000
    with pytest.raises(Exception, match="overflow|thresholds_mode"):
        temperature_mixture_sample(docs, total_token_budget=huge).collect()
    kept = temperature_mixture_sample(
        docs, total_token_budget=huge, thresholds_mode="driver"
    )
    assert kept.count() == 4  # budget dwarfs the corpus -> keep whole


def test_temperature_sample_rejects_bad_mode(spark):
    import pytest

    from spotify_etl_pipeline_spark.operators.curation import (
        temperature_mixture_sample,
    )

    docs = spark.createDataFrame([(0, "en", "a b")], ["doc_id", "lang", "text"])
    with pytest.raises(ValueError, match="thresholds_mode"):
        temperature_mixture_sample(docs, thresholds_mode="collect")


def test_quality_mix_capstone_invariants(spark, sf_dir):
    """The composed chain must respect its stages: output strata are the
    input languages, kept tokens per language never exceed the cleaned
    survivor mass, and the global kept total lands at-or-under the
    temperature budget plus fingerprint-bucket slack."""
    from spotify_etl_pipeline_spark.queries.curation_ops import (
        _QMIX_BUDGET,
        corpus_curation_quality_mix,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    out = {
        r["lang"]: (r["n_docs_kept"], r["n_tokens_kept"])
        for r in corpus_curation_quality_mix(spark, sf_dir).collect()
    }
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert set(out) <= langs and out
    totals = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
        .collect()
    }
    for lang, (nd, nt) in out.items():
        assert 0 < nt <= totals[lang]  # never more than the raw stratum
    # binomial slack on the fingerprint buckets at fixture scale
    assert sum(nt for _, nt in out.values()) <= _QMIX_BUDGET * 1.5


def test_quality_mix_capstone_approx_close_to_exact(spark, sf_dir):
    """The capstone's approx=True arm (percentile_approx tier cutoffs —
    the 100 TB path, no per-language single-task ntile sort) must land
    within tier-boundary slack of the exact composition: same language
    set, per-language kept docs/tokens close (tier-edge documents can
    flip sides of a sketch cutoff, shifting the survivor set and with
    it the mixture thresholds — bounded drift, not divergence)."""
    from spotify_etl_pipeline_spark.queries.curation_ops import (
        corpus_curation_quality_mix,
    )

    exact = {
        r["lang"]: (r["n_docs_kept"], r["n_tokens_kept"])
        for r in corpus_curation_quality_mix(spark, sf_dir).collect()
    }
    approx = {
        r["lang"]: (r["n_docs_kept"], r["n_tokens_kept"])
        for r in corpus_curation_quality_mix(spark, sf_dir, approx=True).collect()
    }
    assert set(exact) == set(approx)
    for lang, (nd, nt) in exact.items():
        nda, nta = approx[lang]
        assert abs(nda - nd) <= max(3, 0.25 * nd), (lang, nd, nda)
        assert abs(nta - nt) <= max(60, 0.25 * nt), (lang, nt, nta)


def test_stratified_exact_n_sample_sizes_and_determinism(spark, sf_dir):
    from spotify_etl_pipeline_spark.operators.curation import (
        stratified_exact_n_sample,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = stratified_exact_n_sample(docs, n_per_stratum=30)
    sizes = {
        r["lang"]: r["n"]
        for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # exactly N per stratum, whole stratum when smaller
    assert sizes == {la: min(30, t) for la, t in totals.items()}
    # bit-stable under repartitioning (content-derived order, no RNG)
    a = {(r["lang"], r["doc_id"]) for r in got.collect()}
    b = {
        (r["lang"], r["doc_id"])
        for r in stratified_exact_n_sample(
            docs.repartition(7), n_per_stratum=30
        ).collect()
    }
    assert a == b


def test_stratified_exact_n_prefilter_arm_is_exact(spark, sf_dir):
    """The 100 TB arm (fingerprint-bucket prefilter + verified
    admission) must select the IDENTICAL set as the full-window arm —
    exactness by construction, not approximation."""
    from spotify_etl_pipeline_spark.operators.curation import (
        stratified_exact_n_sample,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    full = {
        (r["lang"], r["doc_id"])
        for r in stratified_exact_n_sample(docs, n_per_stratum=20).collect()
    }
    pre = {
        (r["lang"], r["doc_id"])
        for r in stratified_exact_n_sample(
            docs, n_per_stratum=20, prefilter=True, prefilter_margin=6
        ).collect()
    }
    assert pre == full and len(full) > 0


def test_stratified_exact_n_prefilter_underfill_raises(spark):
    """A margin too small to admit N rows must RAISE with the dial
    named, never silently return a short sample."""
    import pytest

    from spotify_etl_pipeline_spark.operators.curation import (
        stratified_exact_n_sample,
    )

    from spotify_etl_pipeline_spark.operators.curation import (
        content_fingerprint,
    )

    # deterministic underfill: keep only docs whose fingerprint bucket
    # is in the TOP half of the space, then size the threshold into the
    # bottom sixth (t = ceil(1*3*10000/20) = 1500 < 5000) — zero rows
    # can be admitted, so the verification MUST fire
    cand = spark.createDataFrame(
        [(i, "en", f"tok{i} alpha beta gamma delta") for i in range(200)],
        ["doc_id", "lang", "text"],
    )
    docs = (
        cand.withColumn("_b", content_fingerprint() % 10_000)
        .filter(F.col("_b") >= 5_000)
        .drop("_b")
        .limit(20)
        .localCheckpoint(eager=True)
    )
    n_docs = docs.count()
    # t = ceil(1*3*10000/T) must land strictly below every bucket (all
    # are >= 5000 by construction), i.e. T must exceed 6
    assert 6 < n_docs <= 20
    with pytest.raises(ValueError, match="prefilter_margin"):
        stratified_exact_n_sample(
            docs, n_per_stratum=3, prefilter=True, prefilter_margin=1,
            granularity=10_000,
        )
    with pytest.raises(ValueError, match="n_per_stratum"):
        stratified_exact_n_sample(docs, n_per_stratum=0)


def test_budget_sample_constant_overflow_guard(spark):
    import pytest

    from spotify_etl_pipeline_spark.operators.curation import (
        budget_mixture_sample,
    )

    docs = spark.createDataFrame([(0, "en", "a b")], ["doc_id", "lang", "text"])
    with pytest.raises(ValueError, match="granularity"):
        budget_mixture_sample(
            docs, token_budget=10**16, granularity=10_000
        )


# --- leak_free_split (carve -> decontaminate composition) ---


def test_leak_free_split_planted_contamination(spark):
    """Within lang 'xx' every doc shares the planted 5-gram, so after
    carving 1 eval doc the rest MUST be cut (zero train survivors);
    lang 'yy' docs are pairwise 5-gram-disjoint, so the rest MUST all
    stay train (zero cuts)."""
    from spotify_etl_pipeline_spark.operators.curation import leak_free_split

    planted = "alpha beta gamma delta epsilon"
    xx = [
        (i, "xx", f"{planted} filler{i} more{i} words{i} here{i}")
        for i in range(4)
    ]
    yy = [
        (10 + i, "yy", " ".join(f"w{10 + i}t{j}" for j in range(8)))
        for i in range(4)
    ]
    docs = spark.createDataFrame(xx + yy, ["doc_id", "lang", "text"])
    res = {
        r["doc_id"]: r["split"]
        for r in leak_free_split(docs, n_per_stratum=1, n=5).collect()
    }
    assert len(res) == 8  # every doc labeled exactly once
    xx_splits = sorted(res[i] for i in range(4))
    assert xx_splits == ["cut", "cut", "cut", "eval"]
    yy_splits = sorted(res[10 + i] for i in range(4))
    assert yy_splits == ["eval", "train", "train", "train"]


def test_leak_free_split_zero_eval_ngrams_survive(spark, sf_dir):
    """The capstone guarantee on the real fixture corpus: the exact
    5-gram intersection between the eval split and the KEPT train split
    is empty (Bloom has no false negatives, so every sharer was cut)."""
    from spotify_etl_pipeline_spark.operators.curation import leak_free_split
    from spotify_etl_pipeline_spark.operators.dedup import doc_shingles

    docs = load_fixture(spark, sf_dir, "documents")
    res = leak_free_split(docs, n_per_stratum=5, n=5).persist()
    n_docs = docs.count()
    counts = {r["split"]: r["n"] for r in
              res.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n_docs and counts.get("eval", 0) > 0
    ev = docs.join(res.filter("split = 'eval'").select("doc_id"), "doc_id")
    tr = docs.join(res.filter("split = 'train'").select("doc_id"), "doc_id")
    ev_sh = doc_shingles(ev, n=5).select("shingle").distinct()
    tr_sh = doc_shingles(tr, n=5).select("shingle").distinct()
    assert ev_sh.join(tr_sh, "shingle").count() == 0


def test_leak_free_split_prefilter_arm_identical(spark, sf_dir):
    """The 100 TB carve arm (prefilter=True threads through to
    stratified_exact_n_sample) must produce the IDENTICAL split
    assignment — the carve is provably exact, so the downstream scrub
    sees the same eval set."""
    from spotify_etl_pipeline_spark.operators.curation import leak_free_split

    docs = load_fixture(spark, sf_dir, "documents")
    a = {
        r["doc_id"]: r["split"]
        for r in leak_free_split(docs, n_per_stratum=5, n=5).collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in leak_free_split(
            docs, n_per_stratum=5, n=5, prefilter=True
        ).collect()
    }
    assert a == b and len(a) > 0

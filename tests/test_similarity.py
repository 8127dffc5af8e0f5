"""Approximate-operator quality gates: IVF recall, LSH candidate recall."""

from __future__ import annotations

from spotify_etl_pipeline_spark.queries.catalog import full_catalog

ALL = {n: sp.fn for n, sp in full_catalog().items()}


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    """IVF with n_probe == n_clusters searches everything → must reproduce
    the exact brute-force top-k (validates the routing/scoring machinery)."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.similarity import ivf_topk
    from spotify_etl_pipeline_spark.schemas import load_fixture

    emb = load_fixture(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    exact = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ALL["knn_brute_force"](spark, sf_dir).collect()
    }
    n_clusters = emb.select("label").distinct().count()
    full = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_topk(emb, queries, k=5, n_probe=n_clusters).collect()
    }
    assert full == exact


def test_ivf_partial_probe_recall(spark, sf_dir):
    """The fixture embeddings are geometrically unclustered (labels are
    random), so n_probe=3/10 can only reach ~30% of the corpus — recall
    should sit near the searched fraction, not collapse below it."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL["knn_brute_force"](spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in ALL["knn_ivf"](spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"IVF recall below searched fraction: {recall:.2f}"


def test_lsh_candidates_cover_high_jaccard_pairs(spark, sf_dir):
    """LSH banding must surface (nearly) every pair with Jaccard ≥ 0.9;
    banding theory: P(candidate) = 1-(1-j^3)^4 ≈ 0.995 at j=0.9."""
    true_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in ALL["dedup_ngram_jaccard"](spark, sf_dir).collect()
        if r["jaccard"] >= 0.9
    }
    cands = {
        (r["doc_a"], r["doc_b"]) for r in ALL["dedup_lsh_candidates"](spark, sf_dir).collect()
    }
    if true_pairs:
        recall = len(true_pairs & cands) / len(true_pairs)
        assert recall >= 0.9, f"LSH recall {recall:.2f} over {len(true_pairs)} pairs"


def test_simhash_close_for_near_dups(spark, sf_dir):
    """Near-duplicate pairs (Jaccard ≥ 0.9) should have small SimHash
    Hamming distance (≤ 6 of 16 bits on average)."""
    sims = {r["doc_id"]: r["simhash"] for r in ALL["dedup_simhash"](spark, sf_dir).collect()}
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in ALL["dedup_ngram_jaccard"](spark, sf_dir).collect()
        if r["jaccard"] >= 0.9
    ]
    if pairs:
        dists = [bin(sims[a] ^ sims[b]).count("1") for a, b in pairs]
        assert sum(dists) / len(dists) <= 6, dists


def test_lsh_bucketed_ann_recall_floor(spark, sf_dir):
    """The blocked embedding near-dup must recover ≥ 90% of the exact
    threshold pairs (10 bands × 3 bits targets ~96% catch at cosine 0.45;
    measured 1.0 / 0.97 at sf0.01 / sf0.1), and — because every candidate
    is exact-verified — must emit NO pair below the threshold."""
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in ALL["dedup_embedding_cosine"](spark, sf_dir).collect()
    }
    blocked_rows = ALL["embedding_lsh_neardup"](spark, sf_dir).collect()
    blocked = {(r["vec_a"], r["vec_b"]) for r in blocked_rows}
    assert all(r["cosine"] >= 0.45 for r in blocked_rows)
    assert blocked <= exact, "blocked path emitted a pair the exact op rejects"
    if exact:
        recall = len(blocked & exact) / len(exact)
        assert recall >= 0.9, f"LSH-ANN recall {recall:.2f} over {len(exact)} pairs"


def test_lsh_deep_bands_block_hard(spark, sf_dir):
    """At production near-dup thresholds the banding must actually BLOCK:
    8 bands × 8 bits must generate well under half the brute-force pair
    count (measured ~27× reduction at sf0.1; the shallow default trades
    this away for recall at the fixture's low 0.45 threshold)."""
    from spotify_etl_pipeline_spark.operators.similarity import lsh_ann_candidates
    from spotify_etl_pipeline_spark.schemas import load_fixture

    emb = load_fixture(spark, sf_dir, "embeddings")
    n = emb.count()
    brute_pairs = n * (n - 1) // 2
    cand = lsh_ann_candidates(emb, n_planes=64, n_bands=8).count()
    assert cand < brute_pairs * 0.5, (
        f"deep banding generated {cand} of {brute_pairs} brute-force pairs"
    )


def test_quantized_ivf_matches_quantized_exact_on_probed_clusters(spark, sf_dir):
    """knn_quantized_ivf restricts the int8 scan to probed clusters; within
    what it scans the ranking must agree with the exact quantized baseline,
    and overall top-5 recall must clear the same searched-fraction floor as
    float IVF (labels are geometrically random → ~30% reachable)."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL["knn_quantized_topk"](spark, sf_dir).collect()
    }
    approx_rows = ALL["knn_quantized_ivf"](spark, sf_dir).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"quantized-IVF recall below searched fraction: {recall:.2f}"
    # per-query sanity: 20 queries × exactly 5 ranked neighbors each
    from collections import Counter

    per_q = Counter(r["query_id"] for r in approx_rows)
    assert len(per_q) == 20 and set(per_q.values()) == {5}


def test_prefix_filtered_jaccard_equals_plain(spark, sf_dir):
    """The PPJoin-style prefix filter must be EXACT: identical pair set and
    scores to the plain shingle-blocked join."""
    from spotify_etl_pipeline_spark.operators import dedup as D
    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, sf_dir, "documents")
    plain = D.ngram_jaccard_pairs(docs, n=3, threshold=0.7, prefix_filter=False)
    pref = D.ngram_jaccard_pairs(docs, n=3, threshold=0.7, prefix_filter=True)
    diff = plain.exceptAll(pref).count() + pref.exceptAll(plain).count()
    assert diff == 0


def test_pq_adc_exact_when_corpus_equals_codebook(spark):
    """If every corpus vector IS a codeword (k = n, k-means converges to
    identity), ADC distance == exact L2 distance — validates the whole
    encode → LUT → join → sum machinery with zero quantization error."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.pq import (
        brute_force_l2_topk,
        pq_adc_topk,
        pq_encode,
        pq_fit,
    )

    emb = spark.createDataFrame(
        [(i, [((i * 11 + j * 5) % 17 - 8) / 8.0 for j in range(8)])
         for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    books = pq_fit(emb, m=2, k=12, max_iter=2)
    codes = pq_encode(emb, books)
    qs = emb.filter(F.col("vec_id") < 4).select("vec_id", "embedding")
    adc = {
        (r["query_id"], r["neighbor_id"], r["adc_d2_micro"])
        for r in pq_adc_topk(codes, qs, books, k=5).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"], r["d2_micro"])
        for r in brute_force_l2_topk(emb, qs, k=5).collect()
    }
    assert adc == exact


def test_pq_codes_within_codebook_range(spark, sf_dir):
    """Every encoded vector yields exactly m codes, each in [0, k)."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.pq import pq_encode, pq_fit
    from spotify_etl_pipeline_spark.schemas import load_fixture

    emb = load_fixture(spark, sf_dir, "embeddings")
    books = pq_fit(emb, m=4, k=16)
    codes = pq_encode(emb, books)
    bad = codes.filter(
        (F.size("pq_codes") != 4)
        | F.exists("pq_codes", lambda c: (c < 0) | (c >= 16))
    ).count()
    assert bad == 0
    assert codes.count() == emb.count()


def test_pq_rerank_recall_floor(spark, sf_dir):
    """ADC+rerank (the catalog query) must clear a 0.5 recall floor vs the
    exact L2 baseline (measured ~0.75 at sf0.001/sf0.01), and pure ADC —
    16 bits/vector on geometrically unstructured fixture vectors — must
    still land well above random (floor 0.1; measured 0.22–0.3). Rerank
    distances are exact, so every reranked hit carries the true d2."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        pq_fit,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture

    exact_rows = ALL["knn_l2_brute_force"](spark, sf_dir).collect()
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    exact_d2 = {
        (r["query_id"], r["neighbor_id"]): r["d2_micro"] for r in exact_rows
    }
    rerank_rows = ALL["knn_pq_topk"](spark, sf_dir).collect()
    rerank = {(r["query_id"], r["neighbor_id"]) for r in rerank_rows}
    assert len(exact & rerank) / len(exact) >= 0.5
    for r in rerank_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_d2:
            assert r["d2_micro"] == exact_d2[key]

    emb = load_fixture(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    books = pq_fit(emb, m=4, k=16)
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_adc_topk(pq_encode(emb, books), qs, books, k=5).collect()
    }
    assert len(exact & adc) / len(exact) >= 0.1


def test_ivfadc_full_probe_equals_exhaustive_adc(spark, sf_dir):
    """IVFADC with n_probe == n_clusters probes everything, so its
    candidate set is exactly exhaustive ADC's (all pairs minus self) and
    the whole output — shortlist AND rerank — must match
    pq_adc_rerank_topk tuple-for-tuple. Validates the routing/candidate
    plumbing carries zero scoring drift; the scale win is then purely the
    n_probe/n_clusters candidate fraction."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.pq import (
        pq_adc_rerank_topk,
        pq_encode,
        pq_fit,
        pq_ivfadc_topk,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture

    emb = load_fixture(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    books = pq_fit(emb, m=4, k=16)
    codes = pq_encode(emb, books).persist()
    n_clusters = emb.select("label").distinct().count()
    exhaustive = {
        tuple(r)
        for r in pq_adc_rerank_topk(
            emb, codes, qs, books, k=5, shortlist=50
        ).collect()
    }
    full_probe = {
        tuple(r)
        for r in pq_ivfadc_topk(
            emb, codes, qs, books, k=5, shortlist=50, n_probe=n_clusters
        ).collect()
    }
    codes.unpersist()
    assert full_probe == exhaustive


def test_ivfadc_partial_probe_recall(spark, sf_dir):
    """n_probe=3/10 over random-label clusters reaches ~30% of the corpus;
    recall vs exact L2 must clear the searched-fraction floor (measured
    0.32–0.34 at sf0.01/sf0.1) — the gate knn_ivfadc_recall drives."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL["knn_l2_brute_force"](spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL["knn_ivfadc_topk"](spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"IVFADC recall below searched fraction: {recall:.2f}"


def test_pq_fit_zero_iter_is_exact_init(spark, sf_dir):
    """max_iter=0 must return exactly the deterministic init — each
    subspace's k lowest-vec_id subvector slices — because the
    knn_pq_pinned_topk oracle rederives THESE codebooks in SQL; any
    drift here silently breaks the pinned value-hash contract."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.pq import pq_fit
    from spotify_etl_pipeline_spark.schemas import load_fixture

    emb = load_fixture(spark, sf_dir, "embeddings")
    books = pq_fit(emb, m=4, k=16, max_iter=0)
    first = (
        emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .orderBy("vec_id")
        .limit(16)
        .collect()
    )
    for sub in range(4):
        for code, row in enumerate(first):
            assert books[sub][code] == list(row["v"][sub * 16 : (sub + 1) * 16])


def test_fused_band_buckets_match_reference_bits(spark):
    """The fused single-expression signature stage must produce exactly the
    (id, band, bucket) tuples of the per-plane reference formulation —
    same coefficient family, same fold order, bit-identical sign decisions."""
    import pyspark.sql.functions as F

    from spotify_etl_pipeline_spark.operators.similarity import (
        _as_double,
        _band_buckets_expr,
        _hyperplane_bit,
    )

    emb = spark.createDataFrame(
        [(i, [((i * 7 + j * 13) % 29 - 14) / 14.0 for j in range(16)])
         for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    n_planes, n_bands = 16, 4
    rows_per_band = n_planes // n_bands
    d = _as_double(emb)
    fused = {
        (r["vec_id"], r["band"], r["bucket"])
        for r in d.select(
            "vec_id",
            F.posexplode(F.expr(_band_buckets_expr(n_planes, n_bands))).alias(
                "band", "bucket"
            ),
        ).collect()
    }
    bits = d.select(
        "vec_id", *[_hyperplane_bit("v", p).alias(f"b{p}") for p in range(n_planes)]
    ).collect()
    ref = {
        (r["vec_id"], band,
         sum(r[f"b{band * rows_per_band + i}"] << i for i in range(rows_per_band)))
        for r in bits
        for band in range(n_bands)
    }
    assert fused == ref


def test_arrow_brute_force_matches_jvm_exact(spark, sf_dir):
    """Both kernels are exact; on the fixture no cosine gap sits within a
    ulp of another, so the full (query, neighbor, rank) sets must agree —
    stronger than the 0.9 driver gate."""
    exact = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ALL["knn_brute_force"](spark, sf_dir).collect()
    }
    arrow = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ALL["knn_brute_force_arrow"](spark, sf_dir).collect()
    }
    assert arrow == exact


def test_arrow_brute_force_zero_norm_and_guard(spark, sf_dir):
    """Zero-norm corpus rows never appear as neighbors (cosine undefined),
    and the bounded-|Q| contract raises instead of collecting unbounded."""
    import pytest
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.arrow_knn import (
        brute_force_topk_arrow,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture

    emb = load_fixture(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    zero = spark.range(1).select(
        F.lit(999_999).alias("vec_id"),
        F.array(*[F.lit(0.0)] * dim).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(zero)
    queries = corpus.filter(F.col("vec_id") < 3).select("vec_id", "embedding")
    out = brute_force_topk_arrow(corpus, queries, k=5).collect()
    assert all(r["neighbor_id"] != 999_999 for r in out)
    assert {r["query_id"] for r in out} == {0, 1, 2}
    with pytest.raises(ValueError, match="max_queries"):
        brute_force_topk_arrow(corpus, queries, k=5, max_queries=2)


def test_arrow_brute_force_all_zero_queries_raise(spark, sf_dir):
    """All-zero query batch fails fast at submit time, not with an opaque
    numpy error inside an executor."""
    import pytest
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.arrow_knn import (
        brute_force_topk_arrow,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture

    emb = load_fixture(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    zq = spark.range(2).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.0)] * dim).alias("embedding"),
    )
    with pytest.raises(ValueError, match="zero norm"):
        brute_force_topk_arrow(emb, zq, k=3)


def test_prefix_filter_auto_routes_by_corpus_count(spark, sf_dir, monkeypatch):
    """prefix_filter="auto" is a pure cost decision: below the measured
    crossover it must plan the shingle-blocked join, above it the PPJoin
    prefix-filtered path — and both emit identical rows (the filter is
    lossless), so routing is observable only through which generator ran."""
    import spotify_etl_pipeline_spark.operators.dedup as D

    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, sf_dir, "documents")
    calls: list[bool] = []
    real = D._jaccard_prefix_filtered

    def spy(df, n, threshold, max_shingle_df):
        calls.append(True)
        return real(df, n, threshold, max_shingle_df)

    monkeypatch.setattr(D, "_jaccard_prefix_filtered", spy)

    # fixture corpora sit far below the 10^4-doc crossover -> blocked plan
    small = D.ngram_jaccard_pairs(docs, n=3, threshold=0.7, prefix_filter="auto")
    rows_small = {tuple(r) for r in small.collect()}
    assert calls == [], "auto routed to prefix filter below the crossover"

    # drop the crossover beneath the fixture -> filtered plan, same rows
    monkeypatch.setattr(D, "PREFIX_FILTER_AUTO_MIN_DOCS", 1)
    big = D.ngram_jaccard_pairs(docs, n=3, threshold=0.7, prefix_filter="auto")
    rows_big = {tuple(r) for r in big.collect()}
    assert calls, "auto did not route to prefix filter above the crossover"
    assert rows_small == rows_big


def test_prefix_filter_rejects_bad_value(spark, sf_dir):
    import pytest as _pytest

    import spotify_etl_pipeline_spark.operators.dedup as D
    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, sf_dir, "documents")
    with _pytest.raises(ValueError, match="prefix_filter"):
        D.ngram_jaccard_pairs(docs, prefix_filter="bogus")

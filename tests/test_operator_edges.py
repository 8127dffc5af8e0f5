"""Edge-case regressions from operator review: zero-norm vectors, row-level
dedup survivors, salted-join/how validation, kmeans k>n, frame boundaries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
)
from spotify_etl_pipeline_spark.operators.kmeans import kmeans_fit
from spotify_etl_pipeline_spark.operators.multimodal import sample_frames
from spotify_etl_pipeline_spark.operators.similarity import brute_force_topk
from spotify_etl_pipeline_spark.operators.skew import salted_join


def test_zero_norm_vector_neither_crashes_nor_ranks(spark):
    """A zero embedding must not throw ANSI DIVIDE_BY_ZERO and must never
    appear as a neighbor or near-dup (its cosine is undefined)."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 0.0]),  # zero vector
            (3, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    topk = brute_force_topk(emb, emb.filter("vec_id = 0"), k=3).collect()
    assert {r["neighbor_id"] for r in topk} == {1, 3}  # 2 excluded, no crash
    pairs = embedding_neardup_pairs(emb, threshold=0.1).collect()
    assert all(2 not in (r["vec_a"], r["vec_b"]) for r in pairs)


def test_exact_dedup_survivor_is_a_real_row(spark):
    """All output columns must come from the SAME (min-order) row, never a
    per-column min mixture."""
    df = spark.createDataFrame(
        [
            ("k", 3, "web", 10),
            ("k", 5, "book", 1),  # smaller 'n' but larger doc_id — must lose
        ],
        "key string, doc_id long, source string, n long",
    )
    (row,) = exact_dedup(df, keys=["key"]).collect()
    assert (row["doc_id"], row["source"], row["n"]) == (3, "web", 10)


def test_salted_join_rejects_outer(spark, sf_dir):
    li = spark.range(5).withColumnRenamed("id", "k")
    sm = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(li, sm, key="k", unique_col="k", how="full")


def test_kmeans_k_exceeding_n_raises(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "vec_id long, v array<double>"
    )
    with pytest.raises(ValueError, match="exceeds the number of input vectors"):
        kmeans_fit(vecs, k=5)


def test_sample_frames_no_phantom_frame_on_exact_multiple(spark):
    docs = spark.createDataFrame(
        [(1, b"x" * 64), (2, b"y" * 63), (3, b"")],
        "doc_id long, payload binary",
    ).withColumn("meta", F.struct(F.lit("text/plain").alias("media_type")))
    frames = sample_frames(docs, every_n_bytes=64, max_frames=4)
    counts = {
        r["doc_id"]: r["n"]
        for r in frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # 64 bytes = exactly 1 stride → 1 frame (no empty frame at offset 64);
    # empty payload still yields its single (empty) frame
    assert counts == {1: 1, 2: 1, 3: 1}


def test_chunk_windows_short_doc_single_chunk(spark):
    """A doc shorter than one window yields exactly one (possibly short)
    chunk at offset 0; boundaries are a pure function of token count."""
    from spotify_etl_pipeline_spark.operators.text import chunk_windows

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = chunk_windows(df, size=64, stride=48).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["chunk_id"], r["start_tok"], r["n_toks"]) == (0, 0, 3)


def test_chunk_windows_exact_multiple_no_phantom_chunk(spark):
    """Token count an exact multiple of stride must not emit an empty
    trailing window (starts stop at n-1, not n)."""
    from spotify_etl_pipeline_spark.operators.text import chunk_windows

    text = " ".join(f"t{i}" for i in range(96))  # 96 = 2 * stride
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_windows(df, size=64, stride=48).collect(),
                  key=lambda r: r["chunk_id"])
    assert [(r["start_tok"], r["n_toks"]) for r in rows] == [(0, 64), (48, 48)]


def test_chunk_windows_overlap_region_hashes_consistent(spark):
    """Two docs sharing a window's token content produce the same
    chunk_hash for that window (hash is content-only)."""
    from spotify_etl_pipeline_spark.operators.text import chunk_windows

    base = " ".join(f"w{i}" for i in range(64))
    df = spark.createDataFrame(
        [(1, base), (2, base)], "doc_id long, text string"
    )
    rows = chunk_windows(df, size=64, stride=48).collect()
    first = {r["doc_id"]: r["chunk_hash"] for r in rows if r["chunk_id"] == 0}
    assert first[1] == first[2]


def test_prefix_clusters_short_docs_cluster_on_full_prefix(spark):
    """Docs shorter than prefix_len hash their full token list (slice
    clamps); identical short docs still cluster, distinct ones don't."""
    from spotify_etl_pipeline_spark.operators.text import (
        prefix_duplicate_clusters,
    )

    df = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "x z")], "doc_id long, text string"
    )
    rows = prefix_duplicate_clusters(df, prefix_len=16).collect()
    assert {r["doc_id"] for r in rows} == {1, 2}
    assert all(r["cluster_size"] == 2 for r in rows)


def test_filtered_topk_unmatched_label_yields_no_rows_for_query(spark):
    """A query whose label no candidate shares simply produces no result
    rows — never an error, never cross-label neighbors."""
    from spotify_etl_pipeline_spark.operators.similarity import filtered_topk

    rows = [
        (0, "a", [1.0, 0.0]),
        (1, "b", [1.0, 0.1]),
        (2, "b", [0.9, 0.2]),
        (3, "zzz", [0.5, 0.5]),  # lone label: no same-label candidates
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    out = filtered_topk(df, df, k=2, match_cols=("label",)).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert 3 not in by_query  # lone label -> no rows
    assert 0 not in by_query  # label 'a' has one vector -> no candidates
    assert sorted(by_query[1]) == [2] and sorted(by_query[2]) == [1]


def test_zorder_constant_column_degenerates_gracefully(spark, tmp_path):
    """A zero-span dimension collapses to bucket 0 everywhere: the write
    must still succeed and preserve rows (layout quality degrades to the
    1-D case, correctness does not)."""
    from spotify_etl_pipeline_spark.sources.maintenance import (
        write_zorder_clustered,
    )

    df = spark.createDataFrame(
        [(i, 7.0, float(i)) for i in range(100)], "id long, const double, x double"
    )
    out = str(tmp_path / "zconst")
    write_zorder_clustered(df, out, "const", "x", n_files=4)
    assert spark.read.parquet(out).count() == 100


def test_pagerank_self_loop_only_graph(spark):
    """A single node with a self-loop keeps all rank mass on itself."""
    from spotify_etl_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame([("a", "a")], ["src", "dst"])
    r = pagerank(edges, iterations=3).collect()
    assert len(r) == 1 and abs(r[0]["rank"] - 1.0) < 1e-12


def test_chunk_windows_keep_tokens_matches_hash(spark):
    """keep_tokens adds the token array WITHOUT perturbing the contract
    columns, and the carried array re-hashes to the emitted chunk_hash."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.text import (
        _rolling_hash_expr,
        chunk_windows,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y")], "doc_id long, text string"
    )
    plain = chunk_windows(df, size=4, stride=3).collect()
    kept = chunk_windows(df, size=4, stride=3, keep_tokens=True)
    assert kept.columns == [c for c in kept.columns if c != "chunk"] + ["chunk"]
    rehashed = kept.withColumn("h2", F.expr(_rolling_hash_expr("chunk")))
    assert rehashed.filter("h2 != chunk_hash").count() == 0
    assert sorted(r["chunk_hash"] for r in plain) == sorted(
        r["chunk_hash"] for r in rehashed.collect()
    )


def test_asof_negative_tolerance_raises(spark):
    """A negative tolerance can never match (gap >= 0 always), so it must
    fail loudly like pandas merge_asof, not return an all-null join."""
    from spotify_etl_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame([(1, 9, 99)], "k long, ts long, v long")
    with pytest.raises(ValueError, match="non-negative"):
        asof_join(
            left,
            right,
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            right_values=["v"],
            tolerance=-1,
        )


# --- gopher_gates rule boundaries -------------------------------------------
def _gates_one(spark, text: str, **kw) -> dict:
    from spotify_etl_pipeline_spark.operators.text import gopher_gates

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_gates(df, **kw).collect()[0].asDict()


def test_gopher_gates_boundaries(spark):
    # exactly min_words all-stopword words: words+stop pass, wlen fails
    # (mean length 3000 needs >= 3.0 chars; 'a of to' averages under)
    r = _gates_one(spark, " ".join(["a", "of", "to"] * 17), min_words=51)
    assert r["n_words"] == 51 and r["pass_words"]
    assert r["n_stop"] == 51 and r["pass_stop"]
    assert r["wlen_milli"] < 3000 and not r["pass_wlen"]
    assert not r["pass_all"]


def test_gopher_gates_symbol_and_alpha(spark):
    r = _gates_one(
        spark,
        "the data of #### pipeline to scan12 …… table row agg",
        min_words=5,
    )
    # 11 words, 6 symbol chars -> (1000*6) div 11 = 545 > 100
    assert r["n_words"] == 11
    assert r["symbol_milli"] == 545 and not r["pass_symbol"]
    # '####', '……', 'scan12' are non-alphabetic: 8/11 alpha = 727 < 800
    assert r["alpha_milli"] == 727 and not r["pass_alpha"]
    assert r["pass_stop"] and not r["pass_all"]


def test_gopher_gates_clean_doc_passes_all(spark):
    words = ["the", "of", "table", "partition", "shuffle", "broadcast"] * 10
    r = _gates_one(spark, " ".join(words), min_words=50)
    assert r["pass_words"] and r["pass_wlen"] and r["pass_stop"]
    assert r["pass_alpha"] and r["pass_symbol"] and r["pass_all"]

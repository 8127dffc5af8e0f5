"""Incremental LSH index maintenance: signatures are growth-stable and the
incremental pair set equals the full recompute restricted to new docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.dedup import (
    _band_buckets,
    lsh_candidates_incremental,
    minhash_signatures_hashed,
)
from spotify_etl_pipeline_spark.schemas import load_fixture


def _split(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    return docs, old, new


def test_hashed_signatures_stable_under_growth(spark, sf_dir):
    """A document's signature must not change when the corpus grows —
    the property the sorted-vocab variant lacks and the one that makes
    incremental maintenance sound."""
    docs, old, _ = _split(spark, sf_dir)
    from_subset = minhash_signatures_hashed(old)
    from_full = minhash_signatures_hashed(docs).join(
        old.select("doc_id"), "doc_id"
    )
    diff = (
        from_subset.exceptAll(from_full).count()
        + from_full.exceptAll(from_subset).count()
    )
    assert diff == 0


def test_incremental_pairs_equal_full_recompute_on_new_docs(spark, sf_dir):
    docs, old, new = _split(spark, sf_dir)
    old_sigs = minhash_signatures_hashed(old)
    new_sigs, inc_pairs = lsh_candidates_incremental(old_sigs, new)

    # full recompute over the whole corpus, restricted to pairs with a new doc
    full_b = _band_buckets(minhash_signatures_hashed(docs))
    full_pairs = (
        full_b.alias("a")
        .join(
            full_b.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    expected = {
        (r["doc_a"], r["doc_b"])
        for r in full_pairs.collect()
        if r["doc_a"] in new_ids or r["doc_b"] in new_ids
    }
    got = {(r["doc_a"], r["doc_b"]) for r in inc_pairs.collect()}
    assert got == expected
    # appending new_sigs keeps the index complete for the next batch
    assert old_sigs.unionByName(new_sigs).count() == docs.count()


def test_streaming_index_equals_full_recompute(spark, sf_dir, tmp_path):
    """Two document files arriving as separate micro-batches: the emitted
    pair union must equal a full-corpus LSH recompute, and the index must
    end complete. Re-running the stream must be a no-op (exactly-once)."""
    from spotify_etl_pipeline_spark.streaming.dedup_index import (
        run_dedup_index_stream,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    docs_dir = str(tmp_path / "docs_in")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(docs_dir)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(
        docs_dir
    )
    index = str(tmp_path / "sig_index")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    run_dedup_index_stream(spark, docs_dir, index, pairs, ckpt)

    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(pairs).collect()
    }
    # full recompute with the same hash family — via the incremental path
    # seeded with an empty index is already covered; compare against the
    # vocab-free full pipeline by rebuilding buckets over everything
    from spotify_etl_pipeline_spark.operators.dedup import (
        _band_buckets,
        minhash_signatures_hashed,
    )

    fb = _band_buckets(minhash_signatures_hashed(docs))
    expected = {
        (r["doc_a"], r["doc_b"])
        for r in (
            fb.alias("a")
            .join(
                fb.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
            .collect()
        )
    }
    assert got == expected
    assert spark.read.parquet(index).count() == docs.count()

    # replay: checkpoint remembers both files — nothing new happens
    run_dedup_index_stream(spark, docs_dir, index, pairs, ckpt)
    assert spark.read.parquet(index).count() == docs.count()

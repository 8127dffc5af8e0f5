"""End-to-end corpus capstone (X42): composition invariants the
per-stage tests cannot see — split coverage of exactly the mixture-kept
corpus, leak-freedom THROUGH the composition (no eval n-gram survives in
the packed train batches), packed-mass conservation across the
encode→pack boundary, and the approx-tier arm staying close to the
exact chain.  The cross-engine value hash lives in the driver sweep
(`llm_corpus_end_to_end`); these pin the properties a hash can't name.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.text import bpe_decode_ids, bpe_train_merges
from spotify_etl_pipeline_spark.queries.endtoend import (
    E2E_EVAL_N,
    curate_encode_pack,
    llm_corpus_end_to_end,
)
from spotify_etl_pipeline_spark.queries.substring_ops import BPE_TRAIN_K
from spotify_etl_pipeline_spark.schemas import load_fixture


@pytest.fixture(scope="module")
def chain(spark, sf_dir):
    docs = load_fixture(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    packed, split, train = curate_encode_pack(docs)
    return docs, packed.cache(), split.cache(), train.cache()


def test_split_partitions_exactly_the_mixture_kept_corpus(chain):
    docs, packed, split, train = chain
    # the split labels every kept doc exactly once, with nothing else
    per = split.groupBy("lang").pivot(
        "split", ["eval", "cut", "train"]
    ).count().na.fill(0).collect()
    for r in per:
        assert r["eval"] == E2E_EVAL_N, (
            f"{r['lang']}: carved {r['eval']} eval docs, want {E2E_EVAL_N}"
        )
        assert r["train"] >= 1
    # train artifact == the docs the split labels 'train'
    labeled = split.filter(F.col("split") == "train").select("doc_id")
    assert train.select("doc_id").exceptAll(labeled).count() == 0
    assert labeled.exceptAll(train.select("doc_id")).count() == 0
    # every split doc_id is a real corpus doc
    assert split.join(docs, "doc_id", "left_anti").count() == 0


def test_packed_mass_conserves_train_encoding(chain, spark, sf_dir):
    _docs, packed, _split, train = chain
    from spotify_etl_pipeline_spark.operators.text import bpe_encode_ids

    enc = bpe_encode_ids(train, n_merges=BPE_TRAIN_K)
    enc_tokens = enc.agg(F.sum("n_tokens")).collect()[0][0]
    packed_tokens = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert enc_tokens == packed_tokens
    # exactly one document start per encoded doc across all masks
    starts = packed.agg(
        F.sum(
            F.length("doc_mask")
            - F.length(F.regexp_replace("doc_mask", "1", ""))
        )
    ).collect()[0][0]
    assert starts == enc.count()


def test_composition_is_leak_free_end_to_end(chain, spark):
    """The property the COMPOSITION must preserve: (a) the curated
    train corpus shares ZERO 5-grams with the carved eval set — the
    split stage's guarantee still holding over mixture-kept, cut-
    rewritten text — and (b) the tokenizer round-trips that exact
    corpus losslessly (decode(encode(train)) == the trainable words in
    order), so the packed batches contain nothing the leak check did
    not see.  Together: no eval n-gram reaches the training artifact."""
    docs, packed, split, train = chain
    from spotify_etl_pipeline_spark.operators.dedup import doc_shingles
    from spotify_etl_pipeline_spark.operators.text import bpe_encode_ids

    eval_docs = docs.join(
        split.filter(F.col("split") == "eval").select("doc_id"), "doc_id"
    )
    train_sh = doc_shingles(train, n=5).select("shingle").distinct()
    eval_sh = doc_shingles(eval_docs, n=5).select("shingle").distinct()
    assert train_sh.join(eval_sh, "shingle").count() == 0
    merges = bpe_train_merges(train, n_merges=BPE_TRAIN_K)
    decoded = bpe_decode_ids(bpe_encode_ids(train, merges=merges), merges)
    truth = (
        train.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
        )
        .filter((F.length("w") >= 2) & F.col("w").rlike(r"\A[a-z]+\z"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda x: x["w"],
                ),
                "",
            ).alias("truth")
        )
    )
    bad = (
        decoded.join(truth, "doc_id")
        .filter(F.col("decoded") != F.col("truth"))
        .count()
    )
    assert bad == 0


def test_entry_is_deterministic_under_repartition(spark, sf_dir):
    a = llm_corpus_end_to_end(spark, sf_dir).collect()
    b = llm_corpus_end_to_end(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_approx_tier_arm_stays_close(spark, sf_dir):
    """The 100 TB dial (percentile_approx cutoffs instead of per-lang
    ntile) must keep the chain's OUTPUT close: same langs, shard token
    masses within a tolerance band — the qmix capstone convention
    applied at the composition level."""
    docs = load_fixture(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    exact, _, _ = curate_encode_pack(docs, approx=False)
    approx, _, _ = curate_encode_pack(docs, approx=True)
    ex = {
        (r["lang"]): r["t"]
        for r in exact.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    ap = {
        (r["lang"]): r["t"]
        for r in approx.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert set(ex) == set(ap)
    for lang, t in ex.items():
        assert abs(ap[lang] - t) <= max(0.35 * t, 200), (
            f"{lang}: exact {t} vs approx {ap[lang]}"
        )


def test_fully_duplicated_corpus_refuses_loudly(spark, sf_dir):
    """A verbatim-replicated corpus is cut to nothing by the cross-doc
    substring stage; the chain must refuse with a stage-localizing
    error, never silently emit an empty training set."""
    docs = load_fixture(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    dup = docs.unionAll(
        docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    ).unionAll(docs.withColumn("doc_id", F.col("doc_id") + 2_000_000))
    with pytest.raises(ValueError, match="train split is EMPTY"):
        curate_encode_pack(dup)

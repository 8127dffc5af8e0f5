"""Sequence packing: hand-computed placements, boundary straddles, summary
arithmetic, and the determinism/scale properties the operator advertises."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.packing import (
    pack_sequences,
    packing_summary,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, lang string, text string")


def test_placements_hand_computed(spark):
    # One packing group (single lang, n_shards=1): docs ordered by doc_id
    # with 3, 4, 2 tokens against budget 5 → starts 0, 3, 7.
    df = _docs(
        spark,
        [
            ("a", "en", "t1 t2 t3"),
            ("b", "en", "t1 t2 t3 t4"),
            ("c", "en", "t1 t2"),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in pack_sequences(df, budget=5, n_shards=1).collect()
    }
    assert out["a"]["seq_id"] == 0 and out["a"]["offset_in_seq"] == 0
    assert not out["a"]["crosses_boundary"]  # ends at token 2 < 5
    assert out["b"]["seq_id"] == 0 and out["b"]["offset_in_seq"] == 3
    assert out["b"]["crosses_boundary"]  # spans tokens 3..6 across the cut
    assert out["c"]["seq_id"] == 1 and out["c"]["offset_in_seq"] == 2
    assert not out["c"]["crosses_boundary"]


def test_exact_fit_does_not_straddle(spark):
    df = _docs(spark, [("a", "en", "t1 t2 t3 t4 t5"), ("b", "en", "t1")])
    out = {
        r["doc_id"]: r.asDict()
        for r in pack_sequences(df, budget=5, n_shards=1).collect()
    }
    # doc a fills sequence 0 exactly: its last token is index 4, same seq
    assert not out["a"]["crosses_boundary"]
    assert out["b"]["seq_id"] == 1 and out["b"]["offset_in_seq"] == 0


def test_groups_pack_independently(spark):
    df = _docs(spark, [("a", "en", "t1 t2 t3"), ("b", "fr", "t1 t2 t3")])
    out = pack_sequences(df, budget=5, n_shards=1).collect()
    # each lang starts its own token stream at offset 0
    assert all(r["offset_in_seq"] == 0 and r["seq_id"] == 0 for r in out)


def test_reingestion_stable(spark):
    rows = [(f"d{i}", "en", "tok " * (i % 7 + 1)) for i in range(40)]
    a = pack_sequences(_docs(spark, rows), budget=16).collect()
    b = pack_sequences(_docs(spark, list(reversed(rows))), budget=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_summary_matches_placements(spark):
    rows = [(f"d{i}", "en" if i % 2 else "fr", "tok " * (i % 5 + 1)) for i in range(30)]
    placements = pack_sequences(_docs(spark, rows), budget=8, n_shards=2)
    summary = {
        (r["lang"], r["shard"]): r.asDict()
        for r in packing_summary(placements, budget=8).collect()
    }
    manual = (
        placements.groupBy("lang", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.col("crosses_boundary").cast("long")).alias("n_straddling"),
            (F.max(F.col("seq_id")) + 1).alias("n_seqs_from_rows"),
        )
        .collect()
    )
    for r in manual:
        s = summary[(r["lang"], r["shard"])]
        assert s["n_docs"] == r["n_docs"]
        assert s["total_tokens"] == r["total_tokens"]
        assert s["n_straddling"] == r["n_straddling"]
        # ceil-div sequence count agrees with the max seq_id actually used
        # (the last doc may END inside the final sequence without a new one)
        assert s["n_sequences"] >= r["n_seqs_from_rows"]
        assert 1 <= s["last_seq_fill_permille"] <= 1000


def test_rejects_nonpositive_budget(spark):
    import pytest

    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [("a", "en", "x")]), budget=0)


def test_seeded_shuffle_reproducible_and_seed_sensitive(spark):
    from spotify_etl_pipeline_spark.operators.packing import seeded_shuffle

    df = _docs(spark, [(f"d{i}", "en", "x") for i in range(200)])
    a = sorted(map(tuple, seeded_shuffle(df, n_shards=4, seed=1).collect()))
    b = sorted(map(tuple, seeded_shuffle(df, n_shards=4, seed=1).collect()))
    c = sorted(map(tuple, seeded_shuffle(df, n_shards=4, seed=2).collect()))
    assert a == b  # same seed → same epoch
    assert a != c  # new seed → new permutation
    # every doc placed exactly once, positions contiguous from 1 per shard
    assert len(a) == 200
    by_shard = {}
    for _, shard, pos in a:
        by_shard.setdefault(shard, []).append(pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_seeded_shuffle_shards_roughly_even(spark):
    from spotify_etl_pipeline_spark.operators.packing import seeded_shuffle

    df = _docs(spark, [(f"d{i}", "en", "x") for i in range(400)])
    sizes = [
        r["n"]
        for r in seeded_shuffle(df, n_shards=4, seed=0)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) == 4
    assert min(sizes) > 400 / 4 * 0.5  # hash balance, loose bound


# --- packed_token_batches (encode -> pack composition) ----------------------


def _packed(spark, sf_dir, budget=64, n_shards=2):
    from spotify_etl_pipeline_spark.operators.packing import pack_token_ids
    from spotify_etl_pipeline_spark.operators.text import bpe_encode_ids
    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, sf_dir, "documents")
    enc = bpe_encode_ids(docs, n_merges=3)
    return enc, pack_token_ids(enc, docs, budget=budget, n_shards=n_shards)


def test_packed_batches_fixed_length_except_group_tail(spark, sf_dir):
    """Every sequence holds exactly `budget` ids except the FINAL one of
    its (lang, shard) group; ids and mask have identical lengths."""
    budget = 64
    _, packed = _packed(spark, sf_dir, budget=budget)
    rows = packed.collect()
    assert rows
    last_seq = {}
    for r in rows:
        key = (r["lang"], r["shard"])
        last_seq[key] = max(last_seq.get(key, -1), r["seq_id"])
    for r in rows:
        ids = r["token_ids"].split(" ")
        assert len(ids) == r["n_tokens"] == len(r["doc_mask"])
        if r["seq_id"] != last_seq[(r["lang"], r["shard"])]:
            assert r["n_tokens"] == budget, r
        else:
            assert 0 < r["n_tokens"] <= budget, r


def test_packed_batches_mask_reconstructs_documents(spark, sf_dir):
    """The document-boundary property: concatenating a group's sequences
    in seq_id order and splitting at mask='1' positions must reproduce
    every per-document id sequence VERBATIM and in doc_id order — i.e.
    the mask marks exactly the document starts, so no attention window
    that resets at '1' ever crosses a document boundary."""
    from pyspark.sql import functions as F
    from spotify_etl_pipeline_spark.schemas import load_fixture

    enc, packed = _packed(spark, sf_dir, budget=64, n_shards=2)
    docs = load_fixture(spark, sf_dir, "documents")
    want = {}  # (lang, shard) -> [per-doc id strings, doc_id-ordered]
    for r in (
        enc.join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn("shard", F.pmod("doc_id", F.lit(2)))
        .orderBy("lang", "shard", "doc_id")
        .collect()
    ):
        want.setdefault((r["lang"], r["shard"]), []).append(r["token_ids"])

    streams = {}  # (lang, shard) -> (ids list, mask string)
    for r in sorted(
        packed.collect(), key=lambda r: (r["lang"], r["shard"], r["seq_id"])
    ):
        ids, mask = streams.setdefault((r["lang"], r["shard"]), ([], []))
        ids.extend(r["token_ids"].split(" "))
        mask.extend(r["doc_mask"])

    assert set(streams) == set(want)
    for key, (ids, mask) in streams.items():
        assert len(ids) == len(mask) and mask[0] == "1"
        got_docs, cur = [], []
        for tid, m in zip(ids, mask):
            if m == "1" and cur:
                got_docs.append(" ".join(cur))
                cur = []
            cur.append(tid)
        got_docs.append(" ".join(cur))
        assert got_docs == want[key], key


def test_packed_batches_straddles_exist_and_are_masked_zero(spark, sf_dir):
    """The concat-then-chunk policy must actually straddle at fixture
    scale (otherwise the mask property is vacuous), and a straddling
    continuation (first position of a sequence that continues a doc)
    carries mask '0'."""
    _, packed = _packed(spark, sf_dir, budget=64, n_shards=2)
    rows = sorted(
        packed.collect(), key=lambda r: (r["lang"], r["shard"], r["seq_id"])
    )
    continuations = [
        r for r in rows if r["seq_id"] > 0 and r["doc_mask"][0] == "0"
    ]
    assert continuations  # some doc straddles a cut


def test_packing_stream_matches_batch_including_replay(spark, sf_dir, tmp_path):
    """Epoch-keyed packing with cross-batch sequence stitching: three
    doc_id-range micro-batches under a frozen merge table must serve
    EXACTLY the one-shot pack of the whole corpus (sequences straddling
    batch boundaries included), a forced replay of both epoch artifacts
    must change nothing, and a no-op stream rerun must be idempotent."""
    from pyspark.sql import functions as F
    from spotify_etl_pipeline_spark.operators.packing import pack_token_ids
    from spotify_etl_pipeline_spark.operators.text import (
        bpe_encode_ids,
        bpe_train_merges,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture
    from spotify_etl_pipeline_spark.streaming.packing_stream import (
        read_packed_batches,
        run_packing_stream,
    )

    BUDGET, SHARDS = 64, 2
    docs = load_fixture(spark, sf_dir, "documents")
    merges = bpe_train_merges(docs, n_merges=3)  # the frozen artifact
    n = docs.count()
    cuts = (n // 3, 2 * n // 3)
    src = str(tmp_path / "docs_in")
    # doc_id-RANGE split: within every (lang, shard) group the stream
    # arrives in doc_id order across epochs — the packing stream's
    # stated ordering contract
    docs.filter(F.col("doc_id") < cuts[0]).coalesce(1).write.parquet(src)
    docs.filter(
        (F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])
    ).coalesce(1).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id") >= cuts[1]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out = str(tmp_path / "packed")
    ckpt = str(tmp_path / "ckpt")
    run_packing_stream(spark, src, merges, out, ckpt, budget=BUDGET,
                       n_shards=SHARDS, max_files_per_trigger=1)

    def served_set():
        return {
            tuple(r) for r in read_packed_batches(spark, out).collect()
        }

    want = {
        tuple(r)
        for r in pack_token_ids(
            bpe_encode_ids(docs, merges=merges), docs,
            budget=BUDGET, n_shards=SHARDS,
        ).collect()
    }
    got = served_set()
    assert got == want and len(want) > 0

    # the interesting rows really exist: some sequence was stitched from
    # partials of different epochs (straddles a batch boundary)
    parts = spark.read.parquet(f"{out}/parts")
    multi = (
        parts.groupBy("lang", "shard", "seq_id")
        .agg(F.countDistinct("epoch").alias("ne"))
        .filter(F.col("ne") >= 2)
        .count()
    )
    assert multi > 0

    # forced replay: rewrite epoch 0's parts AND counts with identical
    # content — serving must not change (exactly-once for both artifacts)
    for part in ("parts", "counts"):
        rows = spark.read.parquet(f"{out}/{part}/epoch=0").collect()
        sch = spark.read.parquet(f"{out}/{part}/epoch=0").schema
        spark.createDataFrame(rows, sch).write.mode("overwrite").parquet(
            f"{out}/{part}/epoch=0"
        )
        spark.catalog.refreshByPath(f"{out}/{part}")
    assert served_set() == want

    # no-op rerun: checkpoint remembers all three files
    run_packing_stream(spark, src, merges, out, ckpt, budget=BUDGET,
                       n_shards=SHARDS, max_files_per_trigger=1)
    assert served_set() == want


def test_packed_batches_decode_roundtrip_to_text(spark, sf_dir):
    """The full tokenize->pack->DECODE loop (VERDICT r10 #4): splitting
    each (lang, shard) packed stream at doc_mask '1' positions and
    decoding every per-doc id slice with bpe_decode_ids must reproduce
    each document's trainable words verbatim (concatenated — word
    boundaries are not in the id stream by construction), in doc_id
    order within the group.  This is the property a trainer relies on:
    the packed artifact is a lossless re-arrangement of the corpus."""
    from pyspark.sql import functions as F
    from spotify_etl_pipeline_spark.operators.text import (
        bpe_decode_ids,
        bpe_train_merges,
    )
    from spotify_etl_pipeline_spark.schemas import load_fixture

    docs = load_fixture(spark, sf_dir, "documents")
    merges = bpe_train_merges(docs, n_merges=3)  # _packed's n_merges
    _, packed = _packed(spark, sf_dir, budget=64, n_shards=2)

    # ground truth: per doc, the trainable words concatenated, grouped
    # by (lang, shard) in doc_id order
    words = docs.select(
        "doc_id", "lang",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    ).filter((F.length("w") >= 2) & F.col("w").rlike(r"\A[a-z]+\z"))
    truth_rows = (
        words.groupBy("doc_id", "lang")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda x: x["w"],
                ),
                "",
            ).alias("truth")
        )
        .withColumn("shard", F.pmod("doc_id", F.lit(2)))
        .orderBy("lang", "shard", "doc_id")
        .collect()
    )
    want = {}
    for r in truth_rows:
        want.setdefault((r["lang"], r["shard"]), []).append(r["truth"])

    # split each packed stream at mask '1's into per-doc id strings
    streams = {}
    for r in sorted(
        packed.collect(), key=lambda r: (r["lang"], r["shard"], r["seq_id"])
    ):
        ids, mask = streams.setdefault((r["lang"], r["shard"]), ([], []))
        ids.extend(r["token_ids"].split(" "))
        mask.extend(r["doc_mask"])
    slices = []  # (lang, shard, doc_index_in_group, id string)
    for (lang, shard), (ids, mask) in streams.items():
        cur, idx = [], 0
        for tid, m in zip(ids, mask):
            if m == "1" and cur:
                slices.append((lang, int(shard), idx, " ".join(cur)))
                cur, idx = [], idx + 1
            cur.append(tid)
        slices.append((lang, int(shard), idx, " ".join(cur)))

    # decode all slices in one distributed pass
    sliced = spark.createDataFrame(
        slices, "lang string, shard long, idx long, token_ids string"
    )
    decoded = {
        (r["lang"], r["shard"], r["idx"]): r["decoded"]
        for r in bpe_decode_ids(sliced, merges).collect()
    }
    assert decoded
    for (lang, shard), truths in want.items():
        for idx, truth in enumerate(truths):
            assert decoded[(lang, shard, idx)] == truth, (lang, shard, idx)
    # every decoded slice is accounted for (no phantom documents)
    assert len(decoded) == sum(len(v) for v in want.values())

"""Epoch-store compaction (streaming/compaction.py): folding epoch
partitions into one base partition must be invisible to serving — for
sketch stores (cell-wise SUM), row stores (plain union), and the LSH
signature index — and exactly-once must survive appends that happen
AFTER a compaction (fresh epochs keep arriving from the checkpoint and
never collide with the epoch=-1 base)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.streaming.compaction import (
    BASE_EPOCH,
    compact_cms_store,
    compact_epoch_store,
)
from spotify_etl_pipeline_spark.schemas import load_fixture


def _epochs(path: str) -> set[str]:
    return {d for d in os.listdir(path) if d.startswith("epoch=")}


def test_cms_store_compaction_preserves_estimates_and_marker(
    spark, sf_dir, tmp_path
):
    """Sketch store: estimates (and the hash-family marker) must be
    bit-identical before/after compaction, after a POST-compaction
    append epoch, and after a second compaction folding old base + new
    epochs together."""
    from spotify_etl_pipeline_spark.operators.cms import (
        count_min_build,
        count_min_estimate,
    )
    from spotify_etl_pipeline_spark.streaming.cms_stream import (
        read_merged_sketch,
        run_cms_stream,
    )

    D, W = 4, 1024
    docs = load_fixture(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    for part in (0, 1):
        docs.filter(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")
    run_cms_stream(spark, src, out, ckpt, d=D, w=W, max_files_per_trigger=1)

    def cells():
        m = read_merged_sketch(spark, out, expect_hash_fn="xxhash64")
        return {(r["row"], r["bucket"], r["n"]) for r in m.collect()}

    before = cells()
    folded = compact_cms_store(spark, out)
    assert folded == 2 and _epochs(out) == {f"epoch={BASE_EPOCH}"}
    assert cells() == before  # serve-equality through the SUM fold

    # post-compaction append: the checkpoint keeps numbering epochs past
    # the folded ones — no collision with the base partition
    docs.filter(F.col("doc_id") % 3 == 2).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_cms_stream(spark, src, out, ckpt, d=D, w=W, max_files_per_trigger=1)
    assert f"epoch={BASE_EPOCH}" in _epochs(out) and len(_epochs(out)) == 2

    words = docs.select(F.explode(F.split("text", " ")).alias("k"))
    whole = {
        (r["row"], r["bucket"], r["n"])
        for r in count_min_build(words, "k", d=D, w=W).collect()
    }
    assert cells() == whole

    # second compaction folds base + the new epoch; estimates unchanged
    compact_cms_store(spark, out)
    assert _epochs(out) == {f"epoch={BASE_EPOCH}"}
    assert cells() == whole
    probes = words.groupBy("k").count().orderBy(F.desc("count"), "k").limit(5)
    merged = read_merged_sketch(spark, out, expect_hash_fn="xxhash64")
    est = {
        r["k"]: r["cms_n"]
        for r in count_min_estimate(
            merged, probes.select("k"), "k", D, W
        ).collect()
    }
    true = {r["k"]: r["count"] for r in probes.collect()}
    assert all(est[k] >= true[k] for k in true)

    # a no-op stream rerun after compaction must change nothing
    run_cms_stream(spark, src, out, ckpt, d=D, w=W, max_files_per_trigger=1)
    assert cells() == whole


def test_pq_code_store_compaction_preserves_serving(spark, sf_dir, tmp_path):
    """Row store: the streamed code table must be row-identical before /
    after compaction, and a post-compaction append stream must leave the
    union equal to the batch append encode of everything streamed."""
    from spotify_etl_pipeline_spark.operators.pq import (
        pq_encode,
        pq_encode_append,
        pq_fit,
        pq_ivfadc_topk,
    )
    from spotify_etl_pipeline_spark.streaming.pq_index_stream import (
        read_streamed_codes,
        run_pq_index_stream,
    )

    emb = load_fixture(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    d1 = emb.filter(F.col("vec_id") % 10 == 4)
    d2 = emb.filter(F.col("vec_id") % 10 == 9)
    books = pq_fit(base, m=4, k=16, max_iter=0)

    src = str(tmp_path / "delta_src")
    d1.repartition(2).write.parquet(src)
    out = str(tmp_path / "codes")
    ckpt = str(tmp_path / "ckpt")
    run_pq_index_stream(spark, src, base, books, out, ckpt,
                        max_files_per_trigger=1)

    def code_set():
        return {
            (r["vec_id"], r["label"], tuple(r["pq_codes"]))
            for r in read_streamed_codes(spark, out).collect()
        }

    before = code_set()
    folded = compact_epoch_store(spark, out)  # identity fold: row store
    assert folded >= 2 and _epochs(out) == {f"epoch={BASE_EPOCH}"}
    assert code_set() == before

    # post-compaction append stream
    d2.coalesce(1).write.mode("append").parquet(src)
    run_pq_index_stream(spark, src, base, books, out, ckpt,
                        max_files_per_trigger=1)
    want = {
        (r["vec_id"], r["label"], tuple(r["pq_codes"]))
        for r in pq_encode_append(
            d1.unionByName(d2), base, books
        ).collect()
    }
    assert code_set() == want

    # serving over base ∪ compacted-then-appended store == batch serve
    base_codes = pq_encode(base, books, keep_cols=("label",))
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")

    def serve(codes):
        return sorted(
            tuple(r)
            for r in pq_ivfadc_topk(
                emb, codes, queries, books, k=5, shortlist=50, n_probe=3,
                probe_mode="pinned", int_units=True, route_corpus=base,
            ).collect()
        )

    got = serve(base_codes.unionByName(read_streamed_codes(spark, out)))
    ref = serve(
        base_codes.unionByName(
            pq_encode_append(d1.unionByName(d2), base, books)
        )
    )
    assert got == ref and len(got) == 50

    compact_epoch_store(spark, out)  # fold base + appended epochs again
    assert code_set() == want


def test_tombstone_store_compaction_preserves_delete_set(
    spark, sf_dir, tmp_path
):
    """The tombstone feed is a row store too: compaction must preserve
    the distinct delete set exactly."""
    from spotify_etl_pipeline_spark.streaming.pq_index_stream import (
        read_tombstones,
        run_pq_delete_stream,
    )

    emb = load_fixture(spark, sf_dir, "embeddings")
    dead = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    src = str(tmp_path / "deletes")
    for part in range(2):
        dead.filter(F.col("vec_id") % 2 == part).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out = str(tmp_path / "tombs")
    run_pq_delete_stream(spark, src, out, str(tmp_path / "ckpt"),
                         max_files_per_trigger=1)
    want = {r["vec_id"] for r in dead.collect()}
    assert {r["vec_id"] for r in read_tombstones(spark, out).collect()} == want
    compact_epoch_store(spark, out)
    assert _epochs(out) == {f"epoch={BASE_EPOCH}"}
    assert {r["vec_id"] for r in read_tombstones(spark, out).collect()} == want


def test_dedup_index_compaction_preserves_appends(spark, sf_dir, tmp_path):
    """LSH signature index: compacting the epoch store must keep the
    index complete AND keep subsequent incremental appends correct (the
    post-compaction batch joins against the folded base; the final pair
    union still equals a full-corpus recompute)."""
    from spotify_etl_pipeline_spark.operators.dedup import (
        _band_buckets,
        minhash_signatures_hashed,
    )
    from spotify_etl_pipeline_spark.streaming.dedup_index import (
        run_dedup_index_stream,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    docs_dir = str(tmp_path / "docs_in")
    docs.filter(F.col("doc_id") % 3 == 0).coalesce(1).write.parquet(docs_dir)
    docs.filter(F.col("doc_id") % 3 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(docs_dir)
    index = str(tmp_path / "sig_index")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    run_dedup_index_stream(spark, docs_dir, index, pairs, ckpt)

    compact_epoch_store(spark, index)
    compact_epoch_store(spark, pairs)
    assert _epochs(index) == {f"epoch={BASE_EPOCH}"}
    assert spark.read.parquet(index).count() == docs.filter(
        F.col("doc_id") % 3 != 2
    ).count()

    # post-compaction append: the third batch joins against the base
    docs.filter(F.col("doc_id") % 3 == 2).coalesce(1).write.mode(
        "append"
    ).parquet(docs_dir)
    run_dedup_index_stream(spark, docs_dir, index, pairs, ckpt)
    assert spark.read.parquet(index).count() == docs.count()

    got = {
        (r["doc_a"], r["doc_b"]) for r in spark.read.parquet(pairs).collect()
    }
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
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
            .collect()
        )
    }
    assert got == expected


def test_physical_delete_compaction_and_reinsert(spark, sf_dir, tmp_path):
    """compact_index_with_tombstones: the physical-delete maintenance
    job must (a) serve bit-identically to the logical anti-join serve it
    replaces, (b) truncate the tombstone store — REQUIRED so a later
    re-append of a deleted id serves again (delete -> re-add semantics),
    and (c) leave both stores fully functional for subsequent append and
    delete epochs."""
    from spotify_etl_pipeline_spark.operators.pq import (
        index_apply_tombstones,
        pq_encode,
        pq_encode_append,
        pq_fit,
        pq_ivfadc_topk,
    )
    from spotify_etl_pipeline_spark.streaming.compaction import (
        compact_index_with_tombstones,
    )
    from spotify_etl_pipeline_spark.streaming.pq_index_stream import (
        read_live_index,
        read_streamed_codes,
        read_tombstones,
        run_pq_delete_stream,
        run_pq_index_stream,
    )

    emb = load_fixture(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    delta = emb.filter(F.col("vec_id") % 5 == 4)
    books = pq_fit(base, m=4, k=16, max_iter=0)
    base_codes = pq_encode(base, books, keep_cols=("label",))
    queries = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")

    def serve(codes):
        return sorted(
            tuple(r)
            for r in pq_ivfadc_topk(
                emb, codes, queries, books, k=5, shortlist=50, n_probe=3,
                probe_mode="pinned", int_units=True, route_corpus=base,
            ).collect()
        )

    # PRODUCTION LAYOUT: the base build bootstraps the epoch store as
    # its base partition — the physical-delete job's contract is that
    # the store holds ALL code rows (otherwise truncating tombstones
    # would lose the deletes against rows living elsewhere)
    codes_path = str(tmp_path / "codes")
    base_codes.write.parquet(f"{codes_path}/epoch=-1")
    src = str(tmp_path / "delta_src")
    delta.repartition(2).write.parquet(src)
    run_pq_index_stream(spark, src, base, books, codes_path,
                        str(tmp_path / "ck_codes"), max_files_per_trigger=1)
    dead = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    dsrc = str(tmp_path / "del_src")
    for part in range(2):
        dead.filter(F.col("vec_id") % 2 == part).coalesce(1).write.mode(
            "append"
        ).parquet(dsrc)
    tombs_path = str(tmp_path / "tombs")
    run_pq_delete_stream(spark, dsrc, tombs_path, str(tmp_path / "ck_del"),
                         max_files_per_trigger=1)

    def live_codes():
        # the packaged serving view (anti-join composition inside)
        return read_live_index(spark, codes_path, tombs_path)

    # the helper must equal the hand-rolled composition it packages
    hand = index_apply_tombstones(
        read_streamed_codes(spark, codes_path),
        read_tombstones(spark, tombs_path),
    )
    assert live_codes().exceptAll(hand).count() == 0
    logical = serve(live_codes())
    pre_rows = read_streamed_codes(spark, codes_path).count()
    assert pre_rows == emb.count()

    n_codes, n_tombs = compact_index_with_tombstones(
        spark, codes_path, tombs_path
    )
    assert n_codes >= 3 and n_tombs >= 2
    # tombstone store truncated but readable; dead rows physically gone
    assert read_tombstones(spark, tombs_path).count() == 0
    n_dead = dead.count()
    assert n_dead > 0
    assert read_streamed_codes(spark, codes_path).count() == pre_rows - n_dead
    # serving over the compacted pair == the logical serve it replaced
    assert serve(live_codes()) == logical

    # re-insert: previously deleted vectors arrive again — with the
    # tombstones truncated they must serve as neighbors again
    reinsert = delta.join(dead, "vec_id", "left_semi").limit(20)
    assert reinsert.count() > 0
    reinsert.coalesce(1).write.mode("append").parquet(src)
    run_pq_index_stream(spark, src, base, books, codes_path,
                        str(tmp_path / "ck_codes"), max_files_per_trigger=1)
    got = serve(live_codes())
    dead_pred = F.col("vec_id") % 7 == 3
    want = serve(
        pq_encode(base.filter(~dead_pred), books, keep_cols=("label",))
        .unionByName(
            pq_encode_append(
                delta.filter(~dead_pred).unionByName(reinsert), base, books
            )
        )
    )
    assert got == want

    # and a fresh delete epoch after compaction still works
    newdead = delta.join(dead, "vec_id", "left_anti").select(
        "vec_id"
    ).limit(10)
    newdead.coalesce(1).write.mode("append").parquet(dsrc)
    run_pq_delete_stream(spark, dsrc, tombs_path, str(tmp_path / "ck_del"),
                         max_files_per_trigger=1)
    nd = {r["vec_id"] for r in newdead.collect()}
    assert {
        r["vec_id"] for r in read_tombstones(spark, tombs_path).collect()
    } == nd
    served_after = serve(live_codes())
    assert not {r[1] for r in served_after} & nd


def test_packing_stores_compact_and_appends_continue_offsets(
    spark, sf_dir, tmp_path
):
    """The packing stream's two stores are epoch stores like every
    other: compacting parts (partial sequence rows keep their min_gpos
    merge keys) and counts (the offset basis is a SUM — fold-invariant)
    must leave serving identical, and a POST-compaction append must
    continue each group's token offset from the folded base exactly —
    the final serve still equals the one-shot pack of everything."""
    from spotify_etl_pipeline_spark.operators.packing import pack_token_ids
    from spotify_etl_pipeline_spark.operators.text import (
        bpe_encode_ids,
        bpe_train_merges,
    )
    from spotify_etl_pipeline_spark.streaming.packing_stream import (
        read_packed_batches,
        run_packing_stream,
    )

    BUDGET, SHARDS = 64, 2
    docs = load_fixture(spark, sf_dir, "documents")
    merges = bpe_train_merges(docs, n_merges=3)
    n = docs.count()
    src = str(tmp_path / "docs_in")
    docs.filter(F.col("doc_id") < n // 3).coalesce(1).write.parquet(src)
    docs.filter(
        (F.col("doc_id") >= n // 3) & (F.col("doc_id") < 2 * n // 3)
    ).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "packed")
    ckpt = str(tmp_path / "ckpt")
    run_packing_stream(spark, src, merges, out, ckpt, budget=BUDGET,
                       n_shards=SHARDS, max_files_per_trigger=1)

    def served():
        return {tuple(r) for r in read_packed_batches(spark, out).collect()}

    before = served()
    assert compact_epoch_store(spark, f"{out}/parts") == 2
    assert compact_epoch_store(spark, f"{out}/counts") == 2
    assert served() == before

    # post-compaction append: the third doc_id-range batch must pick up
    # its offsets from the folded counts base
    docs.filter(F.col("doc_id") >= 2 * n // 3).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_packing_stream(spark, src, merges, out, ckpt, budget=BUDGET,
                       n_shards=SHARDS, max_files_per_trigger=1)
    want = {
        tuple(r)
        for r in pack_token_ids(
            bpe_encode_ids(docs, merges=merges), docs,
            budget=BUDGET, n_shards=SHARDS,
        ).collect()
    }
    assert served() == want


def test_snapshot_limited_compaction_spares_midflight_epoch(
    spark, tmp_path
):
    """ADVICE r10: compact_epoch_store(parts=snapshot) must fold ONLY
    the snapshotted partitions — an epoch written between the snapshot
    and the swap (a live feed racing the maintenance job) survives
    untouched, and the folded base holds exactly the snapshot's rows."""
    from spotify_etl_pipeline_spark.streaming.compaction import (
        list_epoch_partitions,
    )

    store = str(tmp_path / "store")
    for e, ids in ((0, [1, 2]), (1, [3])):
        spark.createDataFrame(
            [(i,) for i in ids], "vec_id long"
        ).write.parquet(f"{store}/epoch={e}")
    snapshot = list_epoch_partitions(spark, store)
    assert sorted(snapshot) == ["epoch=0", "epoch=1"]
    # the race: a new delete epoch lands after the snapshot
    spark.createDataFrame([(99,)], "vec_id long").write.parquet(
        f"{store}/epoch=2"
    )
    folded = compact_epoch_store(
        spark, store, fold=lambda df: df.limit(0), parts=snapshot
    )
    assert folded == 2
    assert _epochs(store) == {f"epoch={BASE_EPOCH}", "epoch=2"}
    # base is empty (truncation fold); the mid-flight epoch still serves
    spark.catalog.refreshByPath(store)
    left = spark.read.parquet(store)
    assert [r["vec_id"] for r in left.collect()] == [99]


def test_snapshot_omitting_existing_base_raises(spark, tmp_path):
    """A partition snapshot that folds around an existing epoch=-1 base
    would install a second base — must refuse."""
    import pytest

    store = str(tmp_path / "store")
    spark.createDataFrame([(1,)], "vec_id long").write.parquet(
        f"{store}/epoch={BASE_EPOCH}"
    )
    spark.createDataFrame([(2,)], "vec_id long").write.parquet(
        f"{store}/epoch=0"
    )
    with pytest.raises(ValueError, match="omits the existing"):
        compact_epoch_store(spark, store, parts=["epoch=0"])


def test_tombstone_reads_guard_empty_store(spark, sf_dir, tmp_path):
    """ADVICE r10: a serve configured with a delete feed BEFORE the
    first delete epoch arrives must serve unscrubbed, not raise — for
    both the PQ code index and the LSH signature index."""
    from spotify_etl_pipeline_spark.streaming.pq_index_stream import (
        read_live_index,
        read_tombstones,
    )
    from spotify_etl_pipeline_spark.streaming.dedup_index import read_index

    never_written = str(tmp_path / "tombs_never")
    assert read_tombstones(spark, never_written).count() == 0
    # an mkdir'd-but-empty store (feed configured, no epoch yet) too
    os.makedirs(str(tmp_path / "tombs_empty"))
    assert read_tombstones(spark, str(tmp_path / "tombs_empty")).count() == 0

    codes_path = str(tmp_path / "codes")
    spark.createDataFrame(
        [(1, 0, [0, 0]), (2, 1, [1, 1])],
        "vec_id long, cell int, pq_codes array<int>",
    ).write.parquet(f"{codes_path}/epoch=-1")
    live = read_live_index(spark, codes_path, never_written)
    assert live.count() == 2  # unscrubbed

    sig_path = str(tmp_path / "sigs")
    spark.createDataFrame(
        [(1, 0, 7)], "doc_id long, band int, bucket long"
    ).write.parquet(f"{sig_path}/epoch=0")
    idx = read_index(spark, sig_path, str(tmp_path / "doc_tombs_never"))
    assert idx.count() == 1  # unscrubbed


def test_crashed_swap_before_install_refuses_then_rolls_back(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11 (medium): a crash between the rename-away loop and
    the base install used to leave a store whose only visible contents
    were dot-prefixed dirs — store_has_epochs then read it as "no
    epochs yet" and read_tombstones silently served an EMPTY delete
    set, resurrecting deleted rows.  Now every listing REFUSES the
    crashed store loudly, and recover_swap restores the pre-compaction
    state."""
    import pytest

    from spotify_etl_pipeline_spark.streaming import stores
    from spotify_etl_pipeline_spark.streaming.compaction import recover_swap
    from spotify_etl_pipeline_spark.streaming.pq_index_stream import (
        read_tombstones,
    )

    store = str(tmp_path / "tombs")
    for e, ids in ((0, [1, 2]), (1, [3])):
        spark.createDataFrame(
            [(i,) for i in ids], "vec_id long"
        ).write.parquet(f"{store}/epoch={e}")

    real_rename = stores.rename

    def crash_on_install(spark_, src, dst):
        if src.endswith(".compact_tmp"):
            raise OSError("simulated crash before base install")
        real_rename(spark_, src, dst)

    monkeypatch.setattr(stores, "rename", crash_on_install)
    with pytest.raises(OSError, match="simulated crash"):
        compact_epoch_store(spark, store)
    monkeypatch.undo()

    # every consumer of the listing now fails loudly instead of serving
    # a partial (here: empty) store
    with pytest.raises(RuntimeError, match="interrupted compaction swap"):
        stores.store_has_epochs(spark, store)
    with pytest.raises(RuntimeError, match="interrupted compaction swap"):
        read_tombstones(spark, store)
    with pytest.raises(RuntimeError, match="interrupted compaction swap"):
        compact_epoch_store(spark, store)  # no re-swap over artifacts

    assert recover_swap(spark, store) == "rolled_back"
    assert _epochs(store) == {"epoch=0", "epoch=1"}
    assert stores.swap_artifacts(spark, store) == []
    assert {r["vec_id"] for r in read_tombstones(spark, store).collect()} == {
        1, 2, 3,
    }
    # and the recovered store compacts cleanly
    assert compact_epoch_store(spark, store) == 2
    assert {r["vec_id"] for r in read_tombstones(spark, store).collect()} == {
        1, 2, 3,
    }


def test_crashed_swap_after_install_rolls_forward(
    spark, tmp_path, monkeypatch
):
    """A crash AFTER the base install (before the .old_* deletes) must
    roll FORWARD: recover_swap finishes the deletes and the store
    serves the folded base."""
    import pytest

    from spotify_etl_pipeline_spark.streaming import stores
    from spotify_etl_pipeline_spark.streaming.compaction import recover_swap

    store = str(tmp_path / "rows")
    for e, ids in ((0, [1, 2]), (1, [3])):
        spark.createDataFrame(
            [(i,) for i in ids], "vec_id long"
        ).write.parquet(f"{store}/epoch={e}")

    real_delete = stores.delete

    def crash_on_cleanup(spark_, path):
        if "/.old_epoch=" in path:
            raise OSError("simulated crash during cleanup")
        real_delete(spark_, path)

    monkeypatch.setattr(stores, "delete", crash_on_cleanup)
    with pytest.raises(OSError, match="simulated crash"):
        compact_epoch_store(spark, store)
    monkeypatch.undo()

    with pytest.raises(RuntimeError, match="interrupted compaction swap"):
        stores.epoch_partitions(spark, store)

    assert recover_swap(spark, store) == "completed"
    assert _epochs(store) == {f"epoch={BASE_EPOCH}"}
    assert stores.swap_artifacts(spark, store) == []
    spark.catalog.refreshByPath(store)
    assert {r["vec_id"] for r in spark.read.parquet(store).collect()} == {
        1, 2, 3,
    }
    assert recover_swap(spark, store) == "clean"


def test_crash_before_any_rename_on_compacted_store_rolls_back(
    spark, tmp_path, monkeypatch
):
    """A crash AFTER the marker touch but BEFORE the first rename, on a
    store that was ALREADY compacted (so an ORIGINAL epoch=-1 base is
    still in place), must roll BACK — the old classifier keyed on "a
    base exists" and reported this state 'completed', abandoning the
    fold while leaking .compact_tmp.  The tmp-presence classifier gets
    it right: the install IS the tmp→base rename, so a surviving tmp
    means it never happened."""
    import pytest

    from spotify_etl_pipeline_spark.streaming import stores
    from spotify_etl_pipeline_spark.streaming.compaction import recover_swap

    store = str(tmp_path / "rows")
    for e, ids in ((0, [1, 2]), (1, [3])):
        spark.createDataFrame(
            [(i,) for i in ids], "vec_id long"
        ).write.parquet(f"{store}/epoch={e}")
    assert compact_epoch_store(spark, store) == 2  # pre-existing base

    spark.createDataFrame([(4,)], "vec_id long").write.parquet(
        f"{store}/epoch=2"
    )

    real_rename = stores.rename

    def crash_on_first_rename(spark_, src, dst):
        raise OSError("simulated crash before any rename")

    monkeypatch.setattr(stores, "rename", crash_on_first_rename)
    with pytest.raises(OSError, match="simulated crash"):
        compact_epoch_store(spark, store)
    monkeypatch.undo()

    # marker present, NO .old_* dirs, original base still in place
    assert stores.swap_artifacts(spark, store) == [stores.SWAP_MARKER]
    with pytest.raises(RuntimeError, match="interrupted compaction swap"):
        stores.epoch_partitions(spark, store)

    assert recover_swap(spark, store) == "rolled_back"
    assert _epochs(store) == {f"epoch={BASE_EPOCH}", "epoch=2"}
    assert stores.swap_artifacts(spark, store) == []
    spark.catalog.refreshByPath(store)
    assert {r["vec_id"] for r in spark.read.parquet(store).collect()} == {
        1, 2, 3, 4,
    }
    # the abandoned fold is gone and a clean re-compaction succeeds
    assert compact_epoch_store(spark, store) == 2
    assert {r["vec_id"] for r in spark.read.parquet(store).collect()} == {
        1, 2, 3, 4,
    }


def test_whole_path_reads_refuse_mid_swap_store(
    spark, tmp_path, monkeypatch
):
    """Whole-path serves (read_merged_sketch all-history arm,
    read_streamed_codes) have no listing of their own, so a crashed
    swap — some epochs dot-prefixed, invisible to Spark — would make
    them silently UNDERCOUNT / serve a partial index (code-review
    r12).  Both must refuse the mid-swap store loudly instead."""
    import pytest

    from spotify_etl_pipeline_spark.streaming import stores
    from spotify_etl_pipeline_spark.streaming.cms_stream import (
        read_merged_sketch,
    )
    from spotify_etl_pipeline_spark.streaming.pq_index_stream import (
        read_streamed_codes,
    )

    store = str(tmp_path / "sketch")
    for e in (0, 1):
        spark.createDataFrame(
            [(0, 0, 10 + e, "xxhash64")],
            "row int, bucket int, n long, hash_fn string",
        ).write.parquet(f"{store}/epoch={e}")

    real_rename = stores.rename

    def crash_on_install(spark_, src, dst):
        if src.endswith(".compact_tmp"):
            raise OSError("simulated crash before base install")
        real_rename(spark_, src, dst)

    monkeypatch.setattr(stores, "rename", crash_on_install)
    with pytest.raises(OSError, match="simulated crash"):
        compact_epoch_store(spark, store)
    monkeypatch.undo()

    with pytest.raises(RuntimeError, match="interrupted compaction swap"):
        read_merged_sketch(spark, store)
    with pytest.raises(RuntimeError, match="interrupted compaction swap"):
        read_streamed_codes(spark, store)

    from spotify_etl_pipeline_spark.streaming.compaction import recover_swap

    assert recover_swap(spark, store) == "rolled_back"
    assert {
        r["n"] for r in read_merged_sketch(spark, store).collect()
    } == {21}  # 10 + 11 summed cell-wise: the FULL store, nothing lost


def test_tombstone_compaction_snapshots_code_partitions(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11: a code epoch landing between the physical-delete
    job's listing and the fold's file index must survive as a LIVE
    partition and appear exactly once — the unsnapshotted whole-path
    read could fold it into the base AND leave it live (duplicates)."""
    import spotify_etl_pipeline_spark.streaming.compaction as comp

    codes = str(tmp_path / "codes")
    tombs = str(tmp_path / "tombs")
    spark.createDataFrame(
        [(1, 0, [0, 0]), (2, 1, [1, 1])],
        "vec_id long, cell int, pq_codes array<int>",
    ).write.parquet(f"{codes}/epoch=-1")
    spark.createDataFrame([(2,)], "vec_id long").write.parquet(
        f"{tombs}/epoch=0"
    )

    real = comp.compact_epoch_store
    fired = []

    def racing(spark_, path, fold=None, parts=None):
        if not fired:  # first call folds the code store — inject here
            fired.append(1)
            spark.createDataFrame(
                [(42, 0, [2, 2])],
                "vec_id long, cell int, pq_codes array<int>",
            ).write.parquet(f"{codes}/epoch=7")
        return real(spark_, path, fold=fold, parts=parts)

    monkeypatch.setattr(comp, "compact_epoch_store", racing)
    comp.compact_index_with_tombstones(spark, codes, tombs)
    monkeypatch.undo()

    # the post-snapshot epoch is still a live partition, not folded
    assert _epochs(codes) == {f"epoch={BASE_EPOCH}", "epoch=7"}
    spark.catalog.refreshByPath(codes)
    rows = spark.read.parquet(codes).groupBy("vec_id").count().collect()
    counts = {r["vec_id"]: r["count"] for r in rows}
    assert counts == {1: 1, 42: 1}  # 2 deleted; 42 exactly once

"""Incremental IVFADC maintenance: frozen-artifact appends must be
indistinguishable from a one-shot encode of the union, batch AND
streamed (epoch-replay exactly-once), and serving must route against
the BASE representatives only."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.operators.pq import (
    index_apply_tombstones,
    ivf_assign_cells,
    pq_encode,
    pq_encode_append,
    pq_fit,
    pq_ivfadc_topk,
)
from spotify_etl_pipeline_spark.schemas import load_fixture

K, SHORTLIST, NPROBE, NQ = 5, 50, 3, 10


def _split(spark, sf_dir):
    emb = load_fixture(spark, sf_dir, "embeddings")
    return (
        emb,
        emb.filter(F.col("vec_id") % 5 != 4),
        emb.filter(F.col("vec_id") % 5 == 4),
    )


def _serve(emb, base, codes, books):
    queries = emb.filter(F.col("vec_id") < NQ).select("vec_id", "embedding")
    return pq_ivfadc_topk(
        emb, codes, queries, books, k=K, shortlist=SHORTLIST, n_probe=NPROBE,
        probe_mode="pinned", int_units=True, route_corpus=base,
    )


def test_incremental_equals_oneshot_frozen_build(spark, sf_dir):
    """Appending with frozen artifacts must serve EXACTLY what a
    one-shot encode of the union (same frozen books, same cells) serves
    — the maintenance path changes nothing but when rows were added."""
    emb, base, delta = _split(spark, sf_dir)
    books = pq_fit(base, m=4, k=16, max_iter=0)

    incr_codes = pq_encode(base, books, keep_cols=("label",)).unionByName(
        pq_encode_append(delta, base, books)
    )
    cells = base.select("vec_id", "label").unionByName(
        ivf_assign_cells(delta.select("vec_id", "embedding"), base)
    )
    union_corpus = emb.select("vec_id", "embedding").join(cells, "vec_id")
    oneshot_codes = pq_encode(union_corpus, books, keep_cols=("label",))

    a = sorted(
        (r["vec_id"], r["label"], tuple(r["pq_codes"]))
        for r in incr_codes.collect()
    )
    b = sorted(
        (r["vec_id"], r["label"], tuple(r["pq_codes"]))
        for r in oneshot_codes.collect()
    )
    assert a == b and len(a) == emb.count()

    sa = sorted(tuple(r) for r in _serve(emb, base, incr_codes, books).collect())
    sb = sorted(tuple(r) for r in _serve(emb, base, oneshot_codes, books).collect())
    assert sa == sb and len(sa) == NQ * K


def test_delta_assignment_routes_to_frozen_cells_only(spark, sf_dir):
    """Every appended vector must land in an EXISTING base cell."""
    _, base, delta = _split(spark, sf_dir)
    base_cells = {r["label"] for r in base.select("label").distinct().collect()}
    assigned = ivf_assign_cells(delta.select("vec_id", "embedding"), base)
    got = {r["label"] for r in assigned.select("label").distinct().collect()}
    assert got and got <= base_cells
    assert assigned.count() == delta.count()


def test_pq_index_stream_matches_batch_including_replay(spark, sf_dir, tmp_path):
    """The epoch-keyed maintenance stream must produce EXACTLY the batch
    append codes (union over epochs), serve the same top-k as the batch
    incremental entry, and a forced epoch replay (partition rewritten)
    must leave both unchanged (exactly-once)."""
    from spotify_etl_pipeline_spark.streaming.pq_index_stream import (
        read_streamed_codes,
        run_pq_index_stream,
    )

    emb, base, delta = _split(spark, sf_dir)
    books = pq_fit(base, m=4, k=16, max_iter=0)

    src = str(tmp_path / "delta_src")
    delta.repartition(3).write.parquet(src)
    out = str(tmp_path / "codes")
    ckpt = str(tmp_path / "ckpt")
    run_pq_index_stream(
        spark, src, base, books, out, ckpt, max_files_per_trigger=1
    )

    def code_set(df):
        return {
            (r["vec_id"], r["label"], tuple(r["pq_codes"]))
            for r in df.collect()
        }

    streamed = read_streamed_codes(spark, out)
    want = code_set(pq_encode_append(delta, base, books))
    assert code_set(streamed) == want and len(want) == delta.count()

    base_codes = pq_encode(base, books, keep_cols=("label",))
    serve_stream = sorted(
        tuple(r)
        for r in _serve(
            emb, base, base_codes.unionByName(streamed), books
        ).collect()
    )
    serve_batch = sorted(
        tuple(r)
        for r in _serve(
            emb, base,
            base_codes.unionByName(pq_encode_append(delta, base, books)),
            books,
        ).collect()
    )
    assert serve_stream == serve_batch and len(serve_stream) == NQ * K

    # forced replay: rewrite epoch 0 with identical content — overwrite,
    # refresh, and the merged index must be unchanged
    ep0 = spark.read.parquet(f"{out}/epoch=0").collect()
    spark.createDataFrame(
        ep0, spark.read.parquet(f"{out}/epoch=0").schema
    ).write.mode("overwrite").parquet(f"{out}/epoch=0")
    spark.catalog.refreshByPath(out)
    streamed2 = read_streamed_codes(spark, out)
    assert code_set(streamed2) == want
    serve_replay = sorted(
        tuple(r)
        for r in _serve(
            emb, base, base_codes.unionByName(streamed2), books
        ).collect()
    )
    assert serve_replay == serve_batch


def test_tombstoned_serve_equals_survivor_only_frozen_encode(spark, sf_dir):
    """The delete invariant, bit-for-bit: (base codes ∪ appended codes)
    ∖ tombstones must equal a one-shot frozen-artifact encode of the
    SURVIVING vectors alone — same frozen books, same frozen
    representatives (deletion shrinks inverted lists, moves nothing) —
    and serving over either must agree exactly.  Deletion must also be
    MATERIAL (the served ranking actually changes) and complete (no
    tombstoned id ever surfaces as a neighbor)."""
    emb, base, delta = _split(spark, sf_dir)
    books = pq_fit(base, m=4, k=16, max_iter=0)
    codes = pq_encode(base, books, keep_cols=("label",)).unionByName(
        pq_encode_append(delta, base, books)
    )
    dead_pred = F.col("vec_id") % 7 == 3
    tombs = emb.filter(dead_pred).select("vec_id")
    live = index_apply_tombstones(codes, tombs)

    surv_codes = pq_encode(
        base.filter(~dead_pred), books, keep_cols=("label",)
    ).unionByName(pq_encode_append(delta.filter(~dead_pred), base, books))

    def code_set(df):
        return {
            (r["vec_id"], r["label"], tuple(r["pq_codes"]))
            for r in df.collect()
        }

    want = code_set(surv_codes)
    assert code_set(live) == want
    assert len(want) == emb.filter(~dead_pred).count()

    serve_live = sorted(tuple(r) for r in _serve(emb, base, live, books).collect())
    serve_surv = sorted(
        tuple(r) for r in _serve(emb, base, surv_codes, books).collect()
    )
    assert serve_live == serve_surv and len(serve_live) == NQ * K

    dead_ids = {r["vec_id"] for r in tombs.collect()}
    assert not {r[1] for r in serve_live} & dead_ids  # neighbor_id col
    serve_full = sorted(tuple(r) for r in _serve(emb, base, codes, books).collect())
    assert serve_live != serve_full  # ~14% deleted must move some top-5

    # duplicate tombstones are a no-op (idempotent delete)
    twice = index_apply_tombstones(live, tombs.unionByName(tombs))
    assert code_set(twice) == want


def test_pq_delete_stream_matches_batch_including_replay(spark, sf_dir, tmp_path):
    """Epoch-keyed tombstone maintenance: delete ids arriving across
    THREE micro-batches (hitting base vectors and appended vectors
    alike — cross-epoch deletes) must serve exactly the batch anti-join
    with the same id set; a forced replay of a tombstone epoch and a
    later re-delete feed of already-dead ids must both change nothing."""
    from spotify_etl_pipeline_spark.streaming.pq_index_stream import (
        read_tombstones,
        run_pq_delete_stream,
    )

    emb, base, delta = _split(spark, sf_dir)
    books = pq_fit(base, m=4, k=16, max_iter=0)
    codes = pq_encode(base, books, keep_cols=("label",)).unionByName(
        pq_encode_append(delta, base, books)
    )
    dead = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")

    src = str(tmp_path / "deletes")
    for part in range(3):  # one file per epoch
        dead.filter(F.col("vec_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out = str(tmp_path / "tombs")
    ckpt = str(tmp_path / "ckpt")
    run_pq_delete_stream(spark, src, out, ckpt, max_files_per_trigger=1)

    ts = read_tombstones(spark, out)
    assert {r["vec_id"] for r in ts.collect()} == {
        r["vec_id"] for r in dead.collect()
    }

    def serve_set(tombstones):
        return sorted(
            tuple(r)
            for r in _serve(
                emb, base, index_apply_tombstones(codes, tombstones), books
            ).collect()
        )

    want = serve_set(dead)
    assert serve_set(ts) == want and len(want) == NQ * K

    # forced replay: rewrite tombstone epoch 0 with identical content
    ep0 = spark.read.parquet(f"{out}/epoch=0").collect()
    spark.createDataFrame(ep0, "vec_id: bigint").write.mode(
        "overwrite"
    ).parquet(f"{out}/epoch=0")
    spark.catalog.refreshByPath(out)
    assert serve_set(read_tombstones(spark, out)) == want

    # re-delete feed: a later batch repeating already-dead ids is a no-op
    dead.limit(5).coalesce(1).write.mode("append").parquet(src)
    run_pq_delete_stream(spark, src, out, ckpt, max_files_per_trigger=1)
    assert serve_set(read_tombstones(spark, out)) == want


def test_assign_cells_nondefault_id_col_round_trips(spark, sf_dir):
    """ADVICE r9: id_col used to rename only the OUTPUT column while the
    routing stage hard-required vec_id on the input — a non-default
    id_col failed with a missing-column AnalysisException.  It must now
    produce the identical assignment under the renamed id."""
    _, base, delta = _split(spark, sf_dir)
    renamed = delta.select(
        F.col("vec_id").alias("doc_ref"), "embedding"
    )
    via_custom = {
        (r["doc_ref"], r["label"])
        for r in ivf_assign_cells(renamed, base, id_col="doc_ref").collect()
    }
    via_default = {
        (r["vec_id"], r["label"])
        for r in ivf_assign_cells(
            delta.select("vec_id", "embedding"), base
        ).collect()
    }
    assert via_custom == via_default and via_custom

    # and the append encoder threads it through end-to-end
    books = pq_fit(base, m=4, k=16, max_iter=0)
    enc_custom = {
        (r["doc_ref"], r["label"], tuple(r["pq_codes"]))
        for r in pq_encode_append(
            renamed, base, books, id_col="doc_ref"
        ).collect()
    }
    enc_default = {
        (r["vec_id"], r["label"], tuple(r["pq_codes"]))
        for r in pq_encode_append(delta, base, books).collect()
    }
    assert enc_custom == enc_default and enc_custom


def test_delta_assignment_mean_mode_quality_arm(spark, sf_dir):
    """The quality dial (mode='mean' — float cluster-mean quantizer,
    the non-oracle production arm) must also assign every appended
    vector into an existing base cell, exactly once."""
    _, base, delta = _split(spark, sf_dir)
    base_cells = {r["label"] for r in base.select("label").distinct().collect()}
    assigned = ivf_assign_cells(
        delta.select("vec_id", "embedding"), base, mode="mean"
    )
    got = {r["label"] for r in assigned.select("label").distinct().collect()}
    assert got and got <= base_cells
    assert assigned.count() == delta.count()
    assert assigned.select("vec_id").distinct().count() == delta.count()

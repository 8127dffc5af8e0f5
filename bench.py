"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is materialized with a ``noop``-format write — Spark's
benchmarking sink, which evaluates EVERY output column of every row and
discards them executor-side (no driver transfer). Rounds 1–3 timed
``.count()`` instead, which lets Catalyst column-prune trailing
projections and eliminate final left-outer joins whose aggregated right
side isn't referenced — so projection-heavy queries (JSON extraction, LM
scoring, dup-span coverage) recorded near-scan times rather than their
real cost (measured gap at the sf10 tile: dup_span_coverage 0.19 s under
count() vs 220 s materialized). Per-query times from round 4 on are
therefore honest full-evaluation costs; where they exceed earlier rounds'
numbers, the meter changed, not the plan — SCALE.md §"Measured action"
records the per-query count-vs-noop audit.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spotify_etl_pipeline_spark.queries.catalog import full_catalog  # noqa: E402
from spotify_etl_pipeline_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family, weighted toward the shuffly/heavy
# ones that dominate at scale. Anything not listed still runs in the driver's
# correctness pass; the bench tracks throughput-critical shapes.
HEADLINE = [
    "flagship_top_revenue",
    "pricing_summary",
    "star_join_top_items",
    "q5_local_supplier_volume",
    "asof_last_purchase_before_click",
    "latest_order_per_customer",
    "order_priority_distribution",
    "count_distinct_exact",
    "approx_count_distinct",
    "window_running_sum",
    "cube_lineitem",
    "json_props_extract",
    "q18_large_volume_orders",
    "text_tfidf",
    "dataset_split",
    "dedup_ngram_jaccard",
    "dedup_lsh_candidates",
    "knn_brute_force",
    # the Arrow matmul twin of the entry above: the (knn_brute_force,
    # knn_brute_force_arrow) pair records the HOF-vs-Arrow kernel gap —
    # at bench scale the fixed mapInPandas worker cost masks most of it;
    # the sf10 tile (SCALE.md) is where the kernel win shows
    "knn_brute_force_arrow",
    # embedding_lsh_neardup (the shallow recall-first LSH twin) stays
    # oracle-checked in the catalog — and sits in this round's correctness
    # sweep window (catalog._SWEEP_PRIORITY) — but is not a headline: at
    # threshold 0.45 sign-bit banding cannot block (collision prob
    # 1-(7/8)^10 ≈ 0.74 for unrelated pairs), so its wall time is brute-
    # force-shaped by design. The bench tracks the deep production regime:
    "lsh_blocking_stats",
    "knn_quantized_ivf",
    "knn_pq_topk",
    # IVFADC: same PQ machinery with IVF-routed candidates — the bench
    # pair (knn_pq_topk vs knn_ivfadc_topk) records the candidate-fraction
    # win directly
    "knn_ivfadc_topk",
    "events_sessionize",
    "events_sliding_counts",
    "text_word_frequency",
    "multimodal_features",
    "chunk_documents_overlap",
    "data_quality_expectations",
    "interval_overlap_pairs",
    "events_props_variant",
    # the span explode is the heaviest corpus-hygiene shuffle shape
    # (constant ×W token-stream blowup, now a single keyed window pass)
    "dup_span_coverage",
    # round 6: the exact span-extent tier over the same explode (maximal
    # duplicated spans, hash-pruned window keys + verify) — the pair
    # records extents-vs-totals cost on one shuffle family
    "dedup_exact_substring_spans",
    # round-4 breadth (VERDICT r3 item 5): the iterative/graph tier and
    # the curation capstone were test-covered but bench-blind — a
    # regression in their loop counts or shuffle shapes now moves BENCH
    "pagerank_nation_trade",
    "dedup_resolve_clusters_logstar",
    "corpus_curation_decontaminated",
    "bpe_merge_apply",
    # late round-4 additions: cluster-scoped semantic dedup (the embedding
    # dedup scale path), the Bloom-prefilter decontamination shape, and
    # the second iterative-graph shape (LPA communities)
    "dedup_semdedup_clusters",
    "bloom_decontaminate",
    "community_nation_trade",
    # final round-4 batch: the per-key sequence-fold family (Holt) and the
    # basket self-join — the two shapes not represented above
    "events_holt_linear",
    "market_basket_pairs",
    # round 7: the iterated substring cut (driver fixpoint loop over the
    # heaviest hygiene shuffle family), the dispatcher's pinned IVFADC
    # arm (full PQ pipeline routed through probing), and the k-iteration
    # BPE trainer (k vocabulary-sized passes + 1-row argmax collects)
    "dedup_substring_cut_fixpoint",
    "knn_pq_auto_forced_ivfadc",
    "bpe_train_merges",
    # round-7 second batch: the tokenizer APPLY half (nested-replace
    # codegen projection + one per-doc shuffle — the pair with
    # bpe_train_merges records train-vs-encode cost), and the intra-doc
    # repetition cut (the (doc_id, key)-bounded shuffle family; its
    # cross-doc twin dedup_substring_cut stays catalog-only since the
    # fixpoint entry above already embeds that shape)
    "bpe_encode_corpus",
    "dedup_intradoc_cut",
    # the residual-encoded IVFADC: pairs with knn_ivfadc_topk above to
    # record the cost of per-(query, probed-cell) LUTs + the encode-time
    # reference-subtraction join vs the shared-LUT raw variant
    "knn_ivfadc_residual_topk",
    # the round-7 composed capstone (intra-doc cut → quality tiers →
    # temperature mix): a regression in any stage's shuffle shape or the
    # checkpoint boundary moves BENCH here
    "corpus_curation_quality_mix",
    # round 8: OPQ — the rotated-PQ chain (deflated power iteration +
    # Householder rotation feeding the pinned PQ pipeline; pairs with
    # knn_pq_topk to record the spectrum+rotation overhead), and the
    # CMS-served heavy-hitter top-k (sketch + bounded candidate probe —
    # the serve-without-groupBy shape)
    "knn_opq_pinned_topk",
    "cms_topk_serving",
    # round 9: the leak-free split capstone (carve -> Bloom scrub — the
    # composed two-stage shuffle shape), the incremental IVFADC serve
    # (frozen-artifact append maintenance; pairs with knn_ivfadc_topk to
    # record the route_corpus/union overhead), the id-emitting BPE
    # encoder (ordered per-doc assembly on top of the vocab-typed encode
    # — pairs with bpe_encode_corpus), and the sketched overlap audit
    # (exact matrix + theta-sampled estimate under one plan)
    "eval_split_decontaminated",
    "knn_ivfadc_incremental_topk",
    "bpe_encode_ids",
    "source_overlap_sketched",
    # round 10: the delete-serving arm (tombstone anti-join on top of the
    # incremental serve — pairs with knn_ivfadc_incremental_topk to
    # record the anti-join's cost), and the packed-batch capstone (the
    # token-scale sequence-id groupBy on top of bpe_encode_ids — pairs
    # with it to record the packing stage's cost). The multi-probe
    # recall gate stays catalog-only: it embeds brute force twice by
    # design, so its wall time measures the harness, not serving.
    "knn_ivfadc_deleted_topk",
    "packed_token_batches",
    # round 11: the windowed heavy-hitter serve (pairs with
    # cms_topk_serving to record the window restriction's cost), the
    # decode round-trip (the tokenizer loop closed — encode + map-only
    # decode + independent truth join), and the shard manifest (one
    # bounded groupBy + order-pinned checksum on top of
    # packed_token_batches — the pair records the manifest stage alone)
    "cms_topk_windowed",
    "bpe_decode_roundtrip",
    "packed_shard_manifest",
    # round 12: the end-to-end corpus capstone (every curation stage
    # composed: cuts → quality → mixture → split → encode → pack →
    # manifest) — a regression in ANY stage's shuffle shape or a
    # checkpoint-boundary defect that only shows up composed moves
    # BENCH here; the per-stage budget lives in SCALE.md §Round-12
    "llm_corpus_end_to_end",
    # round-12 second batch: the PII scrub (the pure narrow
    # sequential-regexp family — its cost is the regex chain itself, so
    # an accidental shuffle or a pathological pattern shows up here) and
    # the classifier apply half (broadcast d-scalar scoring projection —
    # pairs with the catalog's logistic_quality_fit to record
    # fit-vs-apply cost, the same closure the BPE encode/decode pair
    # records for tokenization)
    "corpus_pii_scrub",
    "quality_score_apply",
]


def _contention_evidence(include_load: bool = True) -> dict[str, object] | None:
    """Scan for conditions that pollute wall-clock timing: any live
    foreign JVM, any other python process running Spark/pytest, or (when
    ``include_load``) a 1-minute loadavg above half the CPU count.
    BENCH_r10 shipped a 1.49× phantom regression because something else
    ran during the driver's timing window and nothing in the emitted
    JSON said so (VERDICT r10 #1); a contended run must self-report.
    Called twice: before this bench's own JVM exists, and again after
    the timed loop (contention can arrive mid-run) — the end scan skips
    the load signal (our own 32-thread run IS the load) and relies on
    the self-subtree exclusion below to ignore our own JVM.  Returns an
    evidence dict, or None when clean."""
    # exclude ourselves, our ancestor chain (the driver that invoked this
    # bench is blocked on subprocess.wait, not competing for CPU, and its
    # cmdline may legitimately mention "spark"), AND our descendants (the
    # end-of-run scan happens while this bench's OWN Spark JVM — a child
    # process — is still alive; it is the measurement, not contention)
    try:
        pids = [p for p in os.listdir("/proc") if p.isdigit()]
    except OSError:
        pids = []
    ppid: dict[int, int] = {}
    for pid in pids:
        try:
            with open(f"/proc/{pid}/stat") as fh:
                # field 4 is ppid; comm (field 2) may contain spaces but
                # is parenthesized — split after the closing paren
                ppid[int(pid)] = int(fh.read().rsplit(")", 1)[1].split()[1])
        except (OSError, ValueError, IndexError):
            continue
    me = os.getpid()
    ancestors = set()
    cursor = me
    while cursor in ppid and ppid[cursor] not in ancestors and ppid[cursor] > 0:
        cursor = ppid[cursor]
        ancestors.add(cursor)
    # descendants of SELF only — NOT of ancestors: the driver's OTHER
    # children (a concurrently launched test run or second bench) are
    # precisely the r10 pollution scenario and must stay detectable
    subtree = {me}
    grew = True
    while grew:
        grew = False
        for pid, parent in ppid.items():
            if parent in subtree and pid not in subtree:
                subtree.add(pid)
                grew = True
    excluded = ancestors | subtree
    jvms: list[str] = []
    spark_pys: list[str] = []
    for pid in pids:
        if int(pid) in excluded:
            continue
        try:
            with open(f"/proc/{pid}/comm") as fh:
                comm = fh.read().strip()
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmdline = fh.read().replace(b"\x00", b" ").decode(
                    "utf-8", "replace"
                )
            with open(f"/proc/{pid}/stat") as fh:
                # state is the first field after the parenthesized comm
                # (which may itself contain spaces/parens)
                state = fh.read().rsplit(")", 1)[1].split()[0]
        except (OSError, IndexError):
            continue  # raced exit / permission — not evidence
        if state == "Z":
            # a zombie is an exited, unreaped process: it holds no CPU
            # and its cmdline reads empty — counting it stamped
            # BENCH_r11 "contended" on a run that was actually clean
            # (VERDICT r11 What's-wrong #1)
            continue
        if comm == "java":
            jvms.append(f"pid {pid}: {cmdline[:160]}")
        elif comm.startswith("python") and any(
            k in cmdline for k in ("pyspark", "spark", "pytest")
        ):
            spark_pys.append(f"pid {pid}: {cmdline[:160]}")
    try:
        with open("/proc/loadavg") as fh:
            load1 = float(fh.read().split()[0])
    except (OSError, ValueError):
        load1 = 0.0
    ncpu = os.cpu_count() or 1
    high_load = include_load and load1 > ncpu / 2
    if not (jvms or spark_pys or high_load):
        return None
    ev: dict[str, object] = {"load1": load1, "ncpu": ncpu}
    if jvms:
        ev["foreign_jvms"] = jvms[:8]
    if spark_pys:
        ev["spark_pythons"] = spark_pys[:8]
    if high_load:
        ev["high_load"] = True
    return ev


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    contention = _contention_evidence()
    if contention is not None:
        print(
            "bench.py: WARNING — timing window is contended; numbers "
            f"below are suspect: {json.dumps(contention)}",
            file=sys.stderr,
        )
    spark = get_spark(app_name="bench")
    # full_catalog: the bench times driver=False production arms too
    # (rows-only ANN/sketch entries folded out of the driver sweep, r10)
    all_queries = {n: sp.fn for n, sp in full_catalog().items()}
    names = [n for n in HEADLINE if n in all_queries]
    # warm the JVM + parquet footers, and spin up the Python/Arrow workers
    # (one-time ~2s daemon startup that would otherwise land on whichever
    # mapInPandas query runs first), so per-query times measure steady state
    try:
        all_queries[names[0]](spark, sf_dir).collect()
    except Exception:  # the timed loop below reports the failure per-query
        pass
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()

    # Per-query isolation: a failing query records null in "queries" plus
    # an entry in "errors", and the run still emits a full JSON line — a
    # single regression must never zero out the round's perf signal
    # (round-2 lesson: an AnalysisException at query 5 left the whole
    # bench with rc=1 and no numbers). "value" sums successful queries
    # only, so read it together with "errors" when the latter is present.
    #
    # Each query runs three times: an untimed warm run (Janino codegen
    # compile, broadcast-thread spin-up, file-footer caches — all one-time
    # costs that previously landed on whichever query ran first and made
    # numbers bench-order-sensitive), then TWO timed runs of which the
    # minimum is recorded. The min-of-2 protocol exists because a long-
    # lived local JVM drifts (GC pressure from earlier queries inflated
    # late-bench numbers 2-5x run-to-run); the minimum is the steady-state
    # cost, the quantity that extrapolates. The DataFrame cache is cleared
    # between every run so persisted intermediates (the quantized ANN
    # index) are rebuilt inside each timed window — warm runs pin JVM
    # noise, they must not pre-build the work being measured.
    times: dict[str, object] = {}
    errors: dict[str, str] = {}
    def materialize(df) -> None:
        # noop write = full evaluation of every column, zero driver
        # transfer; .count() is NOT equivalent (Catalyst prunes unused
        # trailing projections/joins under it — see module docstring)
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        try:
            materialize(all_queries[name](spark, sf_dir))
            samples: list[float] = []
            # 2 timed runs, plus a 3rd only when the first two disagree
            # >1.8× — external contention (another process, a GC storm)
            # can span both timed runs and survive a plain min-of-2
            # (observed: a 1.3s query recorded at 19.5s), while tripling
            # every query would add ~1/3 to bench wall for nothing.
            while len(samples) < 2 or (
                len(samples) == 2 and max(samples) > 1.8 * min(samples)
            ):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(all_queries[name](spark, sf_dir))
                samples.append(time.perf_counter() - t0)
            times[name] = round(min(samples), 3)
        except Exception as exc:  # noqa: BLE001 — report, don't die
            times[name] = None  # JSON null — errored queries carry no time
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        finally:
            spark.catalog.clearCache()
    end_contention = _contention_evidence(include_load=False)
    if end_contention is not None:
        contention = {**(contention or {}), "at_end": end_contention}
    total = round(sum(t for t in times.values() if isinstance(t, float)), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        payload["errors"] = errors
    if contention is not None:
        payload["contended"] = True
        payload["contention_evidence"] = contention
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()

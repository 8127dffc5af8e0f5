"""The LLM-corpus END-TO-END capstone (X42): every verified curation /
tokenization / packing stage composed into ONE driver-facing chain —
documents → intra-doc repetition cut (X30) → cross-doc exact-substring
cut (X29) → LM quality tiers (X10) → temperature mixture (X10/X1) →
leak-free eval split (X36 = X34 carve + X20 Bloom scrub) → BPE encode
(X35) → packed training batches (X39) → shard manifest.

Each stage is individually full-hash green; what a real pipeline ships
is the COMPOSITION, and composition is where stage-interface drift
lives (column contracts, ordering assumptions, empty-document corners
that only one stage's output produces).  The oracle chains the SAME
fragment builders the per-stage oracles hash-check — each stage is a
self-contained nested-``WITH`` subquery over the previous stage's CTE,
so fragment-internal names cannot collide and every formula has exactly
one definition (oracle_sql_helpers convention).

The reference pipeline (rajeluqman/spotify-etl-pipeline) has no corpus
tier at all — this is the extension surface SURVEY.md §2.10 grades; the
composition order is the public RefinedWeb / CCNet / GPT-3 recipe.

Scale shape is the union of its parts, with the one NEW concern being
checkpoint placement: every stage output feeds 2+ consumers (the next
stage's operators read it several times), so each is localCheckpointed
once — at 100 TB these boundaries are the stored tables a production
run writes between jobs, and the sf10 stage-budget tile in SCALE.md
records which stage dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_fixture
from .catalog import register
from .curation_ops import (
    DECONTAM_N,
    leak_free_split_sql,
    lm_tier_surv_ctes,
    temperature_mix_ctes,
)
from .substring_ops import (
    BPE_TRAIN_K,
    INTRA_L,
    PACK_BUDGET,
    SPAN_MIN_LEN,
    cleaned_corpus_ctes,
    intra_ctes,
    packed_ctes,
    span_ctes,
)

#: Temperature-mixture token budget for the end-to-end chain, sized
#: against the post-cut post-quality survivor mass so BOTH mixture
#: regimes are exercised where the driver checks: at sf0.01 (~18k
#: survivor tokens) 'en' is genuinely downsampled (f≈0.62) while the
#: small languages clamp to keep-whole; at sf0.1 (~180k) every language
#: is deeply downsampled — the production regime.
E2E_BUDGET = 16_000

#: Eval docs carved per language by the leak-free split stage.  10 is a
#: strict subset of every post-mixture stratum at all driver scales
#: (~45-180 kept docs/lang) while leaving a train split large enough
#: that the BPE trainer always finds its k merges.
E2E_EVAL_N = 10

#: Packing shards per language for the final stage.  2 (not the
#: standalone entries' 4) keeps per-(lang, shard) groups several
#: documents deep even for the most-downsampled language, so sequence
#: straddling — the property the mask exists for — occurs at every SF.
E2E_SHARDS = 2


def _cte_body(fragment: str) -> str:
    """Turn a leading-comma continuation fragment (the shared builders
    emit ``",\\n    name AS (..."`` so they can extend an existing WITH
    chain) into a standalone ``WITH``-opened body for use inside a
    nested-subquery stage."""
    head, sep, tail = fragment.partition(",")
    assert sep and head.strip() == "", (
        "fragment does not start with a ',' continuation"
    )
    return head + "WITH" + tail


def _e2e_oracle() -> str:
    """The chained oracle: one nested-``WITH`` subquery per stage, each
    instantiating the SAME fragment builder its standalone entry
    hash-checks, re-pointed at the previous stage's CTE.

    Every stage CTE is ``AS MATERIALIZED``: each is referenced 2-5
    times by downstream fragments, and DuckDB's default CTE inlining
    would otherwise duplicate the whole upstream subtree per reference
    — the scan fan-out grows as the product of the per-stage reference
    counts (observed: planner exhausts file descriptors before running
    at all).  Materialization is the oracle-side twin of the Spark
    chain's per-stage localCheckpoints."""
    return f"""
    WITH d1 AS MATERIALIZED (
      {intra_ctes("documents")}{cleaned_corpus_ctes("ispans", "documents")}
      SELECT doc_id, lang, text FROM cdocs
    ),
    d2 AS MATERIALIZED (
      {span_ctes("d1")}{cleaned_corpus_ctes("spans", "d1")}
      SELECT doc_id, lang, text FROM cdocs
    ),
    sv AS MATERIALIZED (
      {_cte_body(lm_tier_surv_ctes("d2"))}
      SELECT doc_id, lang, text FROM surv
    ),
    kd AS MATERIALIZED (
      {_cte_body(temperature_mix_ctes("sv", E2E_BUDGET))}
      SELECT sv.doc_id, sv.lang, sv.text
      FROM sv JOIN skept USING (doc_id)
    ),
    sp AS MATERIALIZED (
      {leak_free_split_sql("kd", E2E_EVAL_N, DECONTAM_N)}
    ),
    tr AS (
      SELECT kd.doc_id, kd.lang, kd.text
      FROM kd JOIN sp ON kd.doc_id = sp.doc_id AND sp.split = 'train'
    ),
    man AS (
      {packed_ctes("tr", n_shards=E2E_SHARDS)}
      SELECT lang, shard,
             CAST(COUNT(*) AS BIGINT) AS n_sequences,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN substring(doc_mask, 1, 1) = '0'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling,
             md5(string_agg(token_ids || '#' || doc_mask, '|'
                            ORDER BY seq_id)) AS checksum
      FROM packed
      GROUP BY lang, shard
    ),
    audit AS (
      SELECT lang,
             CAST(SUM(CASE WHEN split = 'eval' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_eval,
             CAST(SUM(CASE WHEN split = 'cut' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_cut,
             CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_train
      FROM sp GROUP BY lang
    )
    SELECT man.lang, man.shard, man.n_sequences, man.n_tokens,
           man.n_straddling, man.checksum,
           audit.n_eval, audit.n_cut, audit.n_train
    FROM man JOIN audit USING (lang)
    """


def curate_encode_pack(
    docs: DataFrame,
    budget: int = E2E_BUDGET,
    eval_n: int = E2E_EVAL_N,
    n_shards: int = E2E_SHARDS,
    approx: bool = False,
    on_stage=None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Run the full curation → tokenize → pack chain over a (doc_id,
    lang, text) corpus; returns ``(packed, split, train)`` so callers
    can materialize the batches, the split assignment, and the curated
    train corpus as the three artifacts a production run stores.

    Stage boundaries are eagerly localCheckpointed: every intermediate
    feeds at least two downstream consumers (the LM fit AND the scoring
    pass both read d2; the split fragment reads kd four times; the
    trainer, encoder, and packer all read train), and at cluster scale
    these are exactly the inter-job tables a pipeline persists — the
    stored-artifact rule (SCALE.md §Round-7), applied at composition
    boundaries rather than inside operators.

    ``approx=True`` swaps the quality tier's per-lang ntile for
    broadcast percentile_approx cutoffs — the 100 TB arm, same dial as
    ``corpus_curation_quality_mix``.  ``on_stage(name)``, if given, is
    called right after each eager stage boundary materializes — the
    hook tools/bench_e2e.py uses to attribute wall time per stage.
    """

    def _mark(name: str) -> None:
        if on_stage is not None:
            on_stage(name)

    from ..operators.curation import (
        leak_free_split,
        temperature_mixture_sample,
    )
    from ..operators.text import (
        bpe_encode_ids,
        bpe_train_merges,
        intradoc_cut_corpus,
        substring_cut_corpus,
    )
    from ..operators.packing import pack_token_ids
    from .stats_ops import assign_quality_buckets, lm_score_milli

    langs = docs.select("doc_id", "lang")
    # stage 1: intra-doc repetition cut (keep-first, L=INTRA_L)
    d1 = (
        intradoc_cut_corpus(docs, min_len=INTRA_L)
        .select("doc_id", F.col("clean_text").alias("text"))
        .join(langs, "doc_id")
        .localCheckpoint(eager=True)
    )
    _mark("intradoc_cut")
    # stage 2: cross-doc exact-substring cut (Lee et al., L=SPAN_MIN_LEN)
    d2 = (
        substring_cut_corpus(d1, min_len=SPAN_MIN_LEN)
        .select("doc_id", F.col("clean_text").alias("text"))
        .join(langs, "doc_id")
        .localCheckpoint(eager=True)
    )
    _mark("crossdoc_cut")
    # stage 3: LM quality tiers on the CLEANED text, tail third dropped
    keep_ids = (
        assign_quality_buckets(
            lm_score_milli(d2), n_buckets=3, approx=approx
        )
        .filter(F.col("bucket") <= 2)
        .select("doc_id")
    )
    sv = d2.join(keep_ids, "doc_id").localCheckpoint(eager=True)
    _mark("quality_tier")
    # stage 4: α=0.5 temperature mixture to the total token budget
    kd = (
        temperature_mixture_sample(
            sv, stratum="lang", total_token_budget=budget
        )
        .select("doc_id", "lang", "text")
        .localCheckpoint(eager=True)
    )
    _mark("temperature_mix")
    # stage 5: leak-free split — eval carve + Bloom scrub of train
    split = leak_free_split(
        kd, stratum="lang", n_per_stratum=eval_n, n=DECONTAM_N
    ).localCheckpoint(eager=True)
    train = (
        kd.join(
            split.filter(F.col("split") == "train").select("doc_id"),
            "doc_id",
        )
        .localCheckpoint(eager=True)
    )
    _mark("leak_free_split")
    if train.limit(1).count() == 0:
        # loud refusal, not a silent empty training set (the compaction
        # / mixture-overflow guard convention): name the stage that
        # emptied the corpus.  All frames here are checkpointed, so the
        # diagnostic counts cost four cheap scans in the failure path.
        raise ValueError(
            "curate_encode_pack: train split is EMPTY — stage doc "
            f"counts: post-intradoc-cut {d1.count()}, "
            f"post-crossdoc-cut {d2.count()}, quality survivors "
            f"{sv.count()}, mixture kept {kd.count()}, split rows "
            f"{split.count()}. A fully-duplicated corpus (e.g. a "
            "verbatim-replicated scale tile) is cut to nothing by the "
            "cross-doc substring stage; a too-small mixture budget or "
            "an eval_n >= stratum size can also starve the split."
        )
    # stages 6-7: BPE encode the train split, pack to fixed budget
    merges = bpe_train_merges(train, n_merges=BPE_TRAIN_K)
    _mark("bpe_train")
    enc = bpe_encode_ids(train, merges=merges)
    packed = pack_token_ids(
        enc, train, budget=PACK_BUDGET, n_shards=n_shards
    )
    return packed, split, train


@register(
    "llm_corpus_end_to_end",
    oracle=_e2e_oracle(),
    survey="X42,X29,X30,X10,X34,X20,X36,X35,X39",
    doc="The LLM-corpus END-TO-END capstone: intra-doc cut → cross-doc "
    "substring cut → LM quality tiers (tail third dropped per lang) → "
    f"α=0.5 temperature mixture to a {E2E_BUDGET}-token budget → "
    f"leak-free split ({E2E_EVAL_N} eval docs/lang carved, train "
    "Bloom-scrubbed against them) → BPE encode of the train split "
    f"(k={BPE_TRAIN_K}) → fixed-128-token packed batches "
    f"({E2E_SHARDS} shards/lang) → per-(lang, shard) manifest with an "
    "order-pinned md5 checksum over the packed content, PLUS the "
    "per-lang split audit (n_eval/n_cut/n_train). The checksum pins "
    "the whole composition — a drift in ANY stage's output (a column "
    "contract, an ordering assumption, an empty-doc corner) flips it — "
    "and the audit columns localize which stage moved. Every fragment "
    "of the oracle is the SAME builder its standalone entry "
    "hash-checks, instantiated over the previous stage as a nested "
    "subquery. Scale: the union of the verified per-stage shapes; "
    "stage boundaries are checkpointed stored artifacts (each feeds "
    "2+ consumers), which at 100 TB are the inter-job tables.",
)
def llm_corpus_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import packed_shard_manifest

    docs = load_fixture(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    packed, split, _train = curate_encode_pack(docs)
    man = packed_shard_manifest(packed)
    audit = split.groupBy("lang").agg(
        F.sum(F.when(F.col("split") == "eval", 1).otherwise(0))
        .cast("long")
        .alias("n_eval"),
        F.sum(F.when(F.col("split") == "cut", 1).otherwise(0))
        .cast("long")
        .alias("n_cut"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
    )
    return man.join(F.broadcast(audit), "lang").select(
        "lang",
        "shard",
        "n_sequences",
        "n_tokens",
        "n_straddling",
        "checksum",
        "n_eval",
        "n_cut",
        "n_train",
    )

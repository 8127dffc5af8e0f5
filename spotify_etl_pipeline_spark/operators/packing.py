"""Sequence packing for LLM training shards (extension tier, SURVEY.md X4
adjacency): map every document to its (sequence, offset) slot in fixed
token-budget training rows, using the concat-then-chunk policy real
pretraining pipelines use — documents are laid end-to-end in a
deterministic order and the stream is cut every ``budget`` tokens, so a
document may straddle two sequences (the trainer's attention mask handles
the boundary; nothing is dropped).

Why not greedy first-fit bin packing: first-fit needs sequential state (bin
remaining-capacity) that does not decompose into a window function, forcing
either a driver loop or a stateful UDF; concat-then-chunk is the policy
large pipelines actually run (GPT-style pretraining concatenates), and it
is ONE cumulative-sum window — embarrassingly parallel across packing
groups and exactly reproducible in any SQL engine.

Scale design:

- Packing groups are (lang, content-hash shard). The window partitions on
  the group key, so parallelism = n_groups and no partition ever holds
  more than ~corpus/n_groups — raise ``n_shards`` with the corpus, never a
  global sort/window.
- Order within a group is (doc_id) — re-ingestion reproduces identical
  sequence layouts (same property as the fingerprint dataset split).
- One shuffle total (the window's partitionBy); token counts are a narrow
  codegen'd projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import fingerprint_expr


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_shards: int = 4,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document its training-sequence placement.

    Returns (group_col, shard, doc_id, n_tokens, seq_id, offset_in_seq,
    crosses_boundary): document ``doc_id`` contributes its tokens starting
    at ``offset_in_seq`` of sequence ``seq_id`` within its (group, shard)
    packing group; ``crosses_boundary`` marks documents that straddle a
    sequence cut (their tail spills into seq_id+1...).

    ``budget`` is deliberately not defaulted: :func:`packing_summary` must
    be called with the SAME value, and silently different defaults on the
    two calls would misreport every sequence count.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    n_tokens = F.size(F.split(F.col(text_col), " "))
    shard = F.pmod(fingerprint_expr(), F.lit(n_shards))
    placed = df.select(
        F.col(group_col),
        shard.alias("shard"),
        F.col(id_col),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy(group_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    # integer div, never floor(x/budget): group token offsets at corpus
    # scale can pass 2^53, where the double quotient floors an ulp off the
    # oracle's BIGINT //
    return (
        placed.withColumn("start_tok", start)
        .select(
            group_col,
            "shard",
            id_col,
            "n_tokens",
            F.expr(f"start_tok div {budget}").alias("seq_id"),
            F.pmod(F.col("start_tok"), F.lit(budget)).alias("offset_in_seq"),
            F.expr(
                f"((start_tok + n_tokens - 1) div {budget}) > "
                f"(start_tok div {budget})"
            ).alias("crosses_boundary"),
        )
    )


def packing_summary(
    placements: DataFrame, budget: int, group_col: str = "lang"
) -> DataFrame:
    """Shard-level packing report from :func:`pack_sequences` output:
    sequences produced, total tokens, straddling documents, and the fill
    ratio of the final (only partially fillable) sequence in per-mille.
    All-integer output — cross-engine exact. ``budget`` MUST equal the
    value the placements were packed with (see pack_sequences)."""
    return (
        placements.groupBy(group_col, "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.col("crosses_boundary").cast("long")).alias("n_straddling"),
        )
        .withColumn(
            # integer ceil-div, not ceil(x/y): the double quotient can sit a
            # half-ulp under an integer and ceil differently across engines
            "n_sequences",
            F.expr(f"(total_tokens + {budget} - 1) div {budget}"),
        )
        .withColumn(
            "last_seq_fill_permille",
            F.expr(f"((pmod(total_tokens - 1, {budget}) + 1) * 1000) div {budget}"),
        )
    )


def pack_token_ids(
    encoded: DataFrame,
    meta: DataFrame,
    budget: int,
    n_shards: int = 4,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """MATERIALIZE the packed training batches — the capstone composing
    the tokenizer tier with :func:`pack_sequences`' placement math: from
    per-document token-id sequences (``bpe_encode_ids`` output:
    (doc_id, n_tokens, token_ids) with space-joined ordered ids) to the
    artifact a training job memory-maps — fixed-``budget``-length id
    rows with a document-boundary mask.

    Returns one row per (group_col, shard, seq_id):

    - ``token_ids`` — the sequence's ids in position order, space-joined
      (every sequence holds exactly ``budget`` ids except the final,
      partially-filled one per packing group — concat-then-chunk, the
      GPT-style policy ``pack_sequences`` documents);
    - ``doc_mask`` — one '0'/'1' char per position, '1' exactly where a
      NEW document starts: the attention-reset mask.  Splitting the
      concatenated group stream at '1' positions reconstructs every
      per-document id sequence verbatim (property-tested), so a trainer
      masking attention across '1' boundaries never attends across
      documents even though documents straddle sequence cuts;
    - ``n_tokens`` — position count (== budget except the group's tail).

    Scale shape: the ONLY corpus-token-scale stage is the final groupBy,
    and its key is (group, shard, seq_id) — one shuffle of the token
    stream (collect_list partials don't REDUCE data, so the shuffle
    carries every token position exactly once; what the key bound buys
    is that no reduce-side group ever holds more than ``budget`` rows —
    no skew, no oversized sort buffers, output rows ~bytes-proportional
    to input).  The placement window runs over DOC-level rows
    (one row per document, partitioned by (group, shard) — raise
    ``n_shards`` with the corpus exactly as pack_sequences documents;
    sharding is ``pmod(doc_id, n_shards)`` here so an external SQL
    engine rederives the layout with no hash library), and the token
    explode is narrow.  Documents with zero trainable words have no
    encoder row and occupy no positions, matching the encoder contract.
    """
    toks = _token_positions(encoded, meta, n_shards, group_col, id_col)
    return _pack_positions(toks, budget, group_col)


def _token_positions(
    encoded: DataFrame,
    meta: DataFrame,
    n_shards: int,
    group_col: str,
    id_col: str,
    base_offsets: DataFrame | None = None,
) -> DataFrame:
    """(group, shard, gpos, tid, b) token-position stream shared by the
    batch packer and the streaming partial packer: per-group cumulative
    doc placement (doc-level window) + narrow token explode.
    ``base_offsets`` — (group_col, shard, base) — shifts every global
    position, which is how a micro-batch continues its group's stream
    where earlier epochs ended (missing groups start at 0).

    r12: returns PLACED DOC rows — (group, shard, start_tok, tids) with
    the ids still an array — rather than one row per token position;
    :func:`_pack_positions` cuts each doc into per-sequence CHUNKS
    (guide §2.3: the sequence assignment is decided by doc-level
    arithmetic, so the shuffle only needs one row per (doc, sequence)
    crossing, not per token — same bytes, ~budget× fewer rows)."""
    g = encoded.join(meta.select(id_col, group_col), id_col).select(
        group_col,
        F.pmod(F.col(id_col), F.lit(int(n_shards))).alias("shard"),
        F.col(id_col),
        "n_tokens",
        "token_ids",
    )
    w = (
        Window.partitionBy(group_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = g.withColumn(
        "start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    if base_offsets is not None:
        placed = placed.join(
            F.broadcast(base_offsets), [group_col, "shard"], "left"
        ).withColumn(
            "start_tok",
            F.col("start_tok") + F.coalesce(F.col("base"), F.lit(0)),
        )
    return placed.select(
        group_col,
        "shard",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.split("token_ids", " ").alias("tids"),
    )


def _pack_positions(
    placed: DataFrame,
    budget: int,
    group_col: str,
    with_min_gpos: bool = False,
) -> DataFrame:
    """Cut placed doc streams (:func:`_token_positions` output) every
    ``budget`` tokens.  ``with_min_gpos`` adds the row's first global
    position — the merge key the streaming store needs to stitch
    PARTIAL sequence rows from different epochs back together in order.

    Plan (r12 rewrite): a document occupies global positions
    [start_tok, start_tok + n), so the sequences it touches are exactly
    seq_id ∈ [start_tok div budget, (start_tok + n - 1) div budget] —
    per-doc arithmetic.  Each doc explodes into one CHUNK row per
    touched sequence (its slice of ids, its mask run, its first global
    position); the final groupBy then concatenates whole chunk strings
    in chunk_start order instead of collecting individual token
    positions.  The sequence-assembly shuffle carries the same token
    bytes but ~budget× fewer rows (previously one row per token
    position — row-count-bound sort/agg cost, the dominant term), and
    the exploded stream is chunk-scale, not token-scale.  The key
    bound is unchanged: no reduce-side group ever exceeds ``budget``
    positions across ≤budget chunk rows."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    b = int(budget)
    chunks = (
        placed.select(
            group_col,
            "shard",
            "start_tok",
            "tids",
            F.size("tids").cast("long").alias("n_pos"),
        )
        .select(
            group_col,
            "shard",
            "start_tok",
            "tids",
            "n_pos",
            F.explode(
                F.expr(
                    f"sequence(start_tok div {b}, (start_tok + n_pos - 1) div {b})"
                )
            ).alias("seq_id"),
        )
        .select(
            group_col,
            "shard",
            "seq_id",
            F.greatest(F.lit(0).cast("long"), F.expr(f"seq_id * {b} - start_tok"))
            .alias("lo"),
            F.least(F.col("n_pos"), F.expr(f"(seq_id + 1) * {b} - start_tok"))
            .alias("hi"),
            "start_tok",
            "tids",
        )
        .select(
            group_col,
            "shard",
            "seq_id",
            (F.col("start_tok") + F.col("lo")).alias("chunk_start"),
            (F.col("hi") - F.col("lo")).alias("chunk_len"),
            F.expr(
                "array_join(slice(tids, CAST(lo + 1 AS INT),"
                " CAST(hi - lo AS INT)), ' ')"
            ).alias("chunk_ids"),
            F.concat(
                F.when(F.col("lo") == 0, F.lit("1")).otherwise(F.lit("0")),
                F.expr("repeat('0', CAST(hi - lo - 1 AS INT))"),
            ).alias("chunk_mask"),
        )
    )
    joined = lambda field, sep: F.array_join(  # noqa: E731
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("chunk_start", F.col(field).alias("v")))
            ),
            lambda x: x["v"],
        ),
        sep,
    )
    aggs = [
        F.sum("chunk_len").cast("long").alias("n_tokens"),
        joined("chunk_ids", " ").alias("token_ids"),
        joined("chunk_mask", "").alias("doc_mask"),
    ]
    if with_min_gpos:
        aggs.append(F.min("chunk_start").cast("long").alias("min_gpos"))
    return chunks.groupBy(group_col, "shard", "seq_id").agg(*aggs)


def seeded_shuffle(
    df: DataFrame,
    n_shards: int = 8,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle into training shards.

    Training runs need the corpus in a random-but-REPRODUCIBLE order; Spark's
    ``orderBy(rand())`` is neither (RNG per task, re-run changes the epoch).
    Here the sort key is a content-free md5 hash of (id, seed) — the first
    60 digest bits as a bigint, the same cross-engine-reproducible trick as
    :func:`..dedup.shingle_sid` — so any engine rederives the identical
    permutation and a new ``seed`` is a fresh epoch.

    Scale shape: shard = key mod ``n_shards``, position = rank within the
    shard — one shuffle on the shard id and a per-shard window, NO global
    row-numbering (a total order would funnel the corpus through one
    partition; shard-local order is exactly what sharded training readers
    consume). Shard sizes are multinomial-even because the key is a hash.
    """
    key = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col(id_col), F.lit(seed))), 1, 15),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        df.select(id_col, key.alias("shuffle_key"))
        .withColumn("shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)))
        .withColumn("pos_in_shard", F.row_number().over(w))
        .select(id_col, "shard", "pos_in_shard")
    )


def packed_shard_manifest(
    packed: DataFrame, group_col: str = "lang"
) -> DataFrame:
    """The TRAINER-SIDE READER CONTRACT over packed batches — one row
    per (group, shard): what a data loader needs to mount a shard
    without scanning it (the webdataset/megatron index-file shape):

    - ``n_sequences`` / ``n_tokens`` — sizing (how many fixed-budget
      rows, how many real positions) for sampler bookkeeping;
    - ``n_straddling`` — sequences that OPEN mid-document (first mask
      char '0'): the rows whose attention reset depends on the mask;
    - ``checksum`` — md5 over the shard's (token_ids # doc_mask) pairs
      concatenated in seq_id order: any reordering, truncation, or
      bit-flip of the shard's content or mask changes it, so a reader
      can verify a downloaded shard against the manifest.

    One groupBy over the packed table (already sequence-rows, ~corpus
    tokens / budget of them); the checksum's collect_list is bounded by
    the shard's sequence count — shards are sized so a shard fits a
    task, exactly the export contract
    (sources/maintenance.py::export_training_shards).  Deterministic
    string arithmetic end-to-end (md5 of an ORDER-pinned concat), so an
    external SQL engine rederives every column — the manifest itself is
    hash-checkable, not just its integer columns.
    """
    ordered = lambda field, sep: F.array_join(  # noqa: E731
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("seq_id", F.col(field).alias("v")))
            ),
            lambda x: x["v"],
        ),
        sep,
    )
    return (
        packed.withColumn(
            "content", F.concat_ws("#", "token_ids", "doc_mask")
        )
        .groupBy(group_col, "shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sequences"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum(
                F.when(F.substring("doc_mask", 1, 1) == "0", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_straddling"),
            F.md5(F.encode(ordered("content", "|"), "utf-8")).alias(
                "checksum"
            ),
        )
    )

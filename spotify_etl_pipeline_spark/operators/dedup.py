"""Deduplication operators (SURVEY.md X1/X2): exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

Design for 100 TB:

- **Exact** is a hash aggregate on the dedup key — one shuffle, map-side
  combine, linear.
- **N-gram Jaccard** self-joins on *shingles* (not documents), so the shuffle
  key is the shingle and only documents sharing a shingle ever meet. At
  scale, pair explosion is bounded by dropping super-frequent shingles
  (``max_shingle_df``) — the classic stop-shingle cut.
- **MinHash+LSH** reduces candidate generation to an equi-join on
  (band, bucket): signatures are built from a *deterministic* hash family
  ((a_i·id + b_i) mod p over content-hashed shingle ids), so the whole
  pipeline is reproducible in any engine — unlike ml.feature.MinHashLSH
  whose random coefficients defeat an external oracle. Banding keeps the
  join key space tiny; candidates are then verified with exact Jaccard.
- **SimHash** is a per-document fold (no shuffle): 16-bit signatures whose
  Hamming distance approximates cosine-over-token-multisets.
- **Embedding near-dup** is a cosine threshold join; brute force here
  (crossJoin a<b) with the LSH/IVF blocking variant in
  :mod:`.similarity` for the scale path.

Shingle ids are CONTENT hashes, never a numbered vocabulary: a sorted-vocab
``row_number`` would funnel the whole distinct-shingle set through one
partition and renumber everything on every corpus change. The default id is
an md5-prefix bigint (:func:`shingle_sid`) so an external SQL oracle derives
identical ids; :func:`minhash_signatures_hashed` swaps in ``xxhash64`` where
raw hashing speed matters more than oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .skew import widen_narrow_scan
from .text import shingles

# Deterministic MinHash family: sig_i(doc) = min over shingle ids s of
# (A[i]*s + B[i]) mod P. Fixed small primes — shared verbatim with the SQL
# oracle.
MINHASH_P = 2_147_483_647
MINHASH_A = (387, 1159, 2741, 3079, 4723, 5519, 6301, 7919, 8597, 9241, 10459, 11257)
MINHASH_B = (13, 2477, 3593, 4093, 5101, 6143, 7537, 8191, 9433, 10139, 11243, 12289)
N_BANDS = 4  # 12 hashes / 4 bands = 3 rows per band
ROWS_PER_BAND = len(MINHASH_A) // N_BANDS

SIMHASH_BITS = 16


def exact_dedup(df: DataFrame, keys: list[str], order_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one survivor ROW per key group — the row whose
    ``order_col`` is smallest (deterministic, unlike dropDuplicates'
    arbitrary pick).

    ``min_by`` pulls every output column from that same winning row; a
    per-column ``min()`` would synthesize rows mixing values from
    different records (and skip NULLs per column), which is not a dedup.
    """
    other = [c for c in df.columns if c not in keys and c != order_col]
    agg = [F.min(order_col).alias(order_col)] + [
        F.min_by(c, F.col(order_col)).alias(c) for c in other
    ]
    return df.groupBy(*keys).agg(*agg)


def doc_shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct pairs — the unit of record for Jaccard,
    MinHash and LSH.

    The token array is materialized as a column *before* shingling: the
    shingle expression indexes it O(n·positions) times, and re-running
    ``split`` per reference is a 6× slowdown measured at sf0.1.

    Set semantics come from ``array_distinct`` on the per-document shingle
    array — a narrow, in-row dedup — NOT a cluster-wide ``.distinct()``:
    duplicates of a shingle only ever occur within one document, so a
    whole-table exchange to dedup them is a wasted shuffle of every
    posting."""
    df = widen_narrow_scan(df)
    return df.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select(
        "doc_id",
        F.explode(F.array_distinct(shingles("toks", n))).alias("shingle"),
    )


def _pair_expr(arr: str, fields: str) -> str:
    """SQL expr: all ordered pairs (i<j) from a sorted array column.

    Used to turn per-bucket member lists into candidate pairs *inside* the
    aggregation output — no self-join, so the upstream pipeline is computed
    exactly once and the only shuffle is the groupBy that built the buckets.
    Bucket sizes are bounded (stop-shingle cut / LSH banding), so the
    per-row pair expansion is small by construction.
    """
    return (
        f"flatten(transform({arr}, (x, i) -> "
        f"transform(slice({arr}, i + 2, size({arr})), y -> struct({fields}))))"
    )


#: Corpus-size crossover for ``ngram_jaccard_pairs(prefix_filter="auto")``.
#: Measured (SCALE.md): at 5 K docs (sf0.1) the prefix-filtered plan's three
#: extra shuffles cost more than the candidate expansion they avoid; at the
#: 50 K-doc sf1 tile the filtered plan produces the IDENTICAL pairs in 22.6 s
#: vs 47.4 s (2.1×) and the gap widens with duplicate density. 10⁴ splits
#: the two measured regimes.
PREFIX_FILTER_AUTO_MIN_DOCS = 10_000


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
    prefix_filter: bool | str = "auto",
    n_docs: int | None = None,
) -> DataFrame:
    """All document pairs with n-gram Jaccard similarity ≥ threshold.

    Shuffle key = shingle; only co-shingled docs meet. ``max_shingle_df``
    drops shingles appearing in more than that many docs (stop-shingle cut —
    essential at scale, off by default so the oracle is exact).

    ``prefix_filter=True`` switches candidate generation to the exact
    PPJoin-style prefix filter (:func:`_jaccard_prefix_filtered`): 10×
    fewer candidate pairs measured at sf0.1 (1.27M → 119K) at the price of
    three extra shuffles (df-rank join, prefix window, set-verify joins).
    Below ~10⁴ documents the extra stages cost more than the avoided
    expansion; it wins once candidate explosion, not stage count, is the
    bottleneck (big corpora / lower thresholds / skewed shingle
    distributions). ``"auto"`` (the default) picks per corpus: one scalar
    count job, filtered plan iff the count reaches
    :data:`PREFIX_FILTER_AUTO_MIN_DOCS`. Both plans emit identical rows
    (the filter is lossless by the PPJoin prefix guarantee), so the switch
    is invisible to callers and to the oracle.

    ``n_docs`` short-circuits the auto dial's sizing job: callers that
    already know the corpus size (catalog statistics, a stored-index
    manifest, the previous pipeline stage's count) pass it and the plan
    builds with ZERO extra Spark jobs — the ``pq_topk_auto`` convention.
    At 100 TB a full scan to pick a regime is real money; the count
    fallback exists for ad-hoc calls, not the production path.
    """
    if prefix_filter == "auto":
        # caller-supplied size, else ONE bounded scalar count job
        prefix_filter = (
            df.count() if n_docs is None else int(n_docs)
        ) >= PREFIX_FILTER_AUTO_MIN_DOCS
    elif not isinstance(prefix_filter, bool):
        raise ValueError(
            f'prefix_filter must be a bool or "auto", got {prefix_filter!r}'
        )
    if prefix_filter:
        return _jaccard_prefix_filtered(df, n, threshold, max_shingle_df)
    sh = doc_shingles(df, n)
    if max_shingle_df is not None:
        # Anti-join against the STOP set (df > cut), not an inner join against
        # the kept vocabulary: under a Zipf shingle distribution the stop set
        # is tiny while the kept set IS the vocabulary and grows with the
        # corpus — broadcasting it would OOM at warehouse scale. No hint:
        # AQE broadcasts the stop side when small, shuffles when not.
        stop = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(stop, "shingle", "left_anti")
    # Collect co-shingled doc ids per shingle and expand pairs in-place
    # (no self-join: a join would recompute the shingle pipeline per side,
    # and the in-group expansion is bounded by the stop-shingle cut). The
    # per-doc size lookup joins are left un-hinted: AQE broadcasts the
    # counts side when it is small and falls back to a shuffle join when a
    # billion-document corpus makes it big — correct at both scales.
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(F.expr(_pair_expr("ids", "x AS doc_a, y AS doc_b"))).alias("p")
        )
        .select("p.*")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return (
        common.join(counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def _jaccard_prefix_filtered(
    df: DataFrame, n: int, threshold: float, max_shingle_df: int | None
) -> DataFrame:
    """Exact Jaccard pairs via prefix filtering (PPJoin family, public
    algorithm: Xiao et al., WWW'08).

    Order each doc's shingles by global rarity (document frequency asc,
    shingle asc) and index only the first ``n_sh - ceil(t·n_sh) + 1`` of
    them. Guarantee: J(A,B) ≥ t forces |A∩B| ≥ ceil(t·max(|A|,|B|)), and by
    pigeonhole over the shared total order two sets overlapping that much
    MUST share an element inside these prefixes — so generating candidates
    only from prefix postings loses nothing, while the posting lists shrink
    to ~(1-t) of the full index (t=0.8 ⇒ 5× fewer, and the quadratic
    bucket expansion shrinks ~25×; measured 1.27M → ~50K candidate pairs
    at sf0.1). Candidates are then verified exactly with one
    ``array_intersect`` per pair against the full shingle sets.
    """
    sh = doc_shingles(df, n)
    if max_shingle_df is not None:
        # Anti-join against the STOP set (df > cut), not an inner join against
        # the kept vocabulary: under a Zipf shingle distribution the stop set
        # is tiny while the kept set IS the vocabulary and grows with the
        # corpus — broadcasting it would OOM at warehouse scale. No hint:
        # AQE broadcasts the stop side when small, shuffles when not.
        stop = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(stop, "shingle", "left_anti")
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
    w = Window.partitionBy("doc_id").orderBy("sdf", "shingle")
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n_sh", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    prefix = ranked.filter(F.col("rk") <= prefix_len).select("doc_id", "shingle")
    cand = (
        prefix.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(F.expr(_pair_expr("ids", "x AS doc_a, y AS doc_b"))).alias("p")
        )
        .select("p.*")
        .distinct()
    )
    # exact verification against full shingle sets (collect_set is fine:
    # sh rows are already distinct per (doc, shingle))
    sets_ = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("sset"))
    a = sets_.select(F.col("doc_id").alias("doc_a"), F.col("sset").alias("sa"))
    b = sets_.select(F.col("doc_id").alias("doc_b"), F.col("sset").alias("sb"))
    common = F.size(F.array_intersect("sa", "sb"))
    jac = common / (F.size("sa") + F.size("sb") - common)
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def shingle_sid(shingle_col: str | F.Column) -> F.Column:
    """Content-derived shingle id in ``[0, MINHASH_P)`` — vocabulary-free
    AND cross-engine reproducible.

    ``conv(substring(md5(s), 1, 15), 16, 10)`` is the first 60 bits of the
    md5 digest as a non-negative bigint; DuckDB reproduces it bit-for-bit
    with ``('0x' || substring(md5(s), 1, 15))::BIGINT``. A document's id
    set depends only on its own text — no global vocabulary pass, no
    single-partition sort, and signatures are stable as the corpus grows
    (the property incremental LSH maintenance needs).
    """
    return F.pmod(
        F.conv(F.substring(F.md5(shingle_col), 1, 15), 16, 10).cast("long"),
        F.lit(MINHASH_P),
    )


def minhash_signatures(df: DataFrame, n: int = 3) -> DataFrame:
    """Wide MinHash signatures: (doc_id, h0..h11).

    One hash aggregate over (doc, shingle-id) rows with 12 min() columns —
    single shuffle on doc_id, map-side partial mins. Shingle ids come from
    :func:`shingle_sid` (content hash): identical arithmetic is reproducible
    in the SQL oracle, and — unlike a sorted-vocabulary numbering — there is
    no global sort anywhere in the plan and ids never renumber when the
    corpus changes.
    """
    sh = doc_shingles(df, n)
    ids = sh.select("doc_id", shingle_sid("shingle").alias("sid"))
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * F.col("sid") + F.lit(MINHASH_B[i])) % MINHASH_P).alias(
            f"h{i}"
        )
        for i in range(len(MINHASH_A))
    ]
    return ids.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(df: DataFrame, n: int = 3) -> DataFrame:
    """LSH banding: docs agreeing on ALL hashes of any band become candidates.

    Per band, bucket key = concat of that band's minhashes; candidates come
    from equi-joins on (band, bucket) — never a cross join. 12 hashes / 4
    bands / 3 rows ≈ catches Jaccard ≳ 0.7 with high probability.
    """
    sig = minhash_signatures(df, n)
    # One-pass banding: explode an array of (band, bucket) structs rather
    # than unioning N_BANDS branches — a union would re-run the whole
    # signature pipeline once per band, and a bucket self-join twice more
    # (8× total). Pairs are expanded inside each bucket group instead, so
    # the signature pipeline executes exactly once and the only shuffle is
    # the (band, bucket) groupBy. LSH banding bounds bucket size, which
    # bounds the per-group expansion.
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.concat_ws(
                    "_",
                    *[f"h{band * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)],
                ).alias("bucket"),
            )
            for band in range(N_BANDS)
        ]
    )
    banded = sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", "bb.band", "bb.bucket"
    )
    return (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(_pair_expr("ids", "x AS doc_a, y AS doc_b"))
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def minhash_signatures_hashed(df: DataFrame, n: int = 3) -> DataFrame:
    """MinHash signatures over ``xxhash64(shingle)`` ids — same plan shape
    as :func:`minhash_signatures` (both are vocabulary-free), trading the
    md5 id's cross-engine reproducibility for a cheaper single-pass JVM
    hash. A document's signature depends only on its own text — the
    property that makes the LSH index INCREMENTALLY maintainable (tests
    assert it).
    """
    sh = doc_shingles(df, n)
    ids = sh.select(
        "doc_id", F.pmod(F.xxhash64("shingle"), F.lit(MINHASH_P)).alias("sid")
    )
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * F.col("sid") + F.lit(MINHASH_B[i])) % MINHASH_P).alias(
            f"h{i}"
        )
        for i in range(len(MINHASH_A))
    ]
    return ids.groupBy("doc_id").agg(*aggs)


def _band_buckets(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) rows from a wide signature table."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.concat_ws(
                    "_",
                    *[f"h{band * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)],
                ).alias("bucket"),
            )
            for band in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", "bb.band", "bb.bucket"
    )


def lsh_candidates_incremental(
    existing_sigs: DataFrame, new_docs: DataFrame, n: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Incremental LSH maintenance for a growing corpus.

    Returns ``(new_sigs, new_pairs)``: signatures for the increment only
    (computed from its own text — the existing corpus is never rescanned)
    and every candidate pair that involves a new document (new×existing
    via an equi-join of the increment's buckets against the index's, plus
    new×new within the increment). Appending ``new_sigs`` to the index
    keeps it current for the next batch.

    At 100 TB this is the difference between per-ingest cost O(increment)
    and O(corpus) — the whole reason the signature table is the stored
    artifact rather than the pairs.
    """
    new_sigs = minhash_signatures_hashed(new_docs, n)
    nb = _band_buckets(new_sigs)
    eb = _band_buckets(existing_sigs)
    cross = (
        nb.alias("a")
        .join(
            eb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
    )
    within = (
        nb.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(F.expr(_pair_expr("ids", "x AS doc_a, y AS doc_b"))).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
    )
    return new_sigs, cross.unionByName(within).distinct()


def lsh_index_apply_tombstones(
    sigs: DataFrame, tombstones: DataFrame
) -> DataFrame:
    """DELETE half of LSH-index maintenance: drop tombstoned documents
    from the stored signature table at serve time — one left-anti
    equi-join on ``doc_id`` (the twin of ``pq.index_apply_tombstones``;
    an append-only index otherwise keeps retired/redacted documents as
    candidate sources forever).

    Because a signature row depends ONLY on its own document's text
    (the same property that makes the index incrementally maintainable),
    the invariant is exact: the scrubbed index equals a from-scratch
    ``minhash_signatures_hashed`` build over the surviving corpus,
    row-for-row — and every downstream product (band buckets, candidate
    pairs via :func:`lsh_candidates_incremental`) therefore contains no
    deleted document.  Tombstones are ids only, idempotent under
    duplicates/replays (distinct before the anti-join), and the join
    shuffles on the doc_id key the index already carries (broadcast
    while the tombstone set is small)."""
    dead = tombstones.select("doc_id").distinct()
    return sigs.join(dead, "doc_id", "left_anti")


def simhash(df: DataFrame) -> DataFrame:
    """16-bit SimHash over the token multiset, as a single codegen'd fold.

    Per token value v (same length/first/last formula as the fingerprint),
    per bit j: +1 if bit j of (v*2654435761 mod 2^16... simplified: v's bits)
    else -1; sign of the sum gives the signature bit.
    """
    from .text import _token_value

    tokval = _token_value("t")
    # Materialize per-token values once; the 16 bit-sum folds then only
    # shift/test integers instead of re-splitting and re-hashing the text
    # per bit (16× less string work).
    vals = f"transform(split(text, ' '), t -> {tokval} % 65536)"
    bit_sums = ", ".join(
        f"aggregate(vals, 0, (acc, v) -> acc + "
        f"CASE WHEN shiftright(v, {j}) % 2 = 1 THEN 1 ELSE -1 END)"
        for j in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN sums[{j}] > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(SIMHASH_BITS)
    )
    return (
        widen_narrow_scan(df).select("doc_id", F.expr(vals).alias("vals"))
        .select("doc_id", F.expr(f"array({bit_sums})").alias("sums"))
        .select("doc_id", F.expr(sig).alias("simhash"))
    )


def embedding_neardup_pairs(df: DataFrame, threshold: float = 0.45) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine ≥ threshold.

    Brute-force a<b join (exact, oracle-checkable). Dot products in double
    precision via zip_with + aggregate — JVM-side, no UDF. Scale path:
    :func:`..similarity.lsh_bucketed_ann` blocks by hyperplane signature
    before the pairwise step.
    """
    e = widen_narrow_scan(df).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # zero-norm guard (see similarity._as_double): null norm → null cosine
    # → the threshold filter drops the pair instead of ANSI DIVIDE_BY_ZERO
    # (or, ANSI off, NaN >= threshold being TRUE and pairing the zero
    # vector with everything)
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    n = e.select("vec_id", "v", F.when(norm > 0, norm).alias("nrm"))
    a = n.alias("a")
    b = n.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cosine"))
    )


def _semdedup_assign(
    e: DataFrame, n_centroids: int, assign: str
) -> DataFrame:
    """Nearest-pinned-centroid assignment for :func:`semdedup_dropped` —
    adds ``cluster`` to ``e`` (columns ``vec_id``, ``v``). See that
    docstring for the literal-vs-join regime split."""
    if assign not in ("auto", "literal", "join"):
        raise ValueError(f"assign must be auto|literal|join, got {assign!r}")
    if assign == "auto":
        assign = "literal" if n_centroids <= 32 else "join"
    pinned = e.orderBy("vec_id").limit(n_centroids)
    if assign == "literal":
        from .kmeans import assign_clusters

        # bounded collect: n_centroids rows, the same sanctioned pattern
        # as the k-means codebook init (kmeans.py) — NOT data-sized
        cents = [list(r["v"]) for r in pinned.collect()]
        return assign_clusters(e, cents)
    wc = Window.orderBy("vec_id")
    ce = pinned.select(
        (F.row_number().over(wc) - 1).alias("cid"), F.col("v").alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("ce.cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wa = Window.partitionBy("vec_id").orderBy(F.asc("_d2"), F.asc("cid"))
    return (
        e.alias("a")
        .crossJoin(F.broadcast(ce.alias("ce")))
        .select("a.vec_id", "a.v", "ce.cid", d2.alias("_d2"))
        .withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "v", F.col("cid").cast("int").alias("cluster"))
    )


def semdedup_auto_centroids(n_vectors: int) -> int:
    """The √n centroid dial for :func:`semdedup_dropped`'s
    ``n_centroids="auto"``.

    With C = √n cells, expected within-cell pair volume Σ n_c² ≈ n²/C =
    n^1.5 — the standard sub-quadratic operating point between C=const
    (still ~quadratic) and C=n (no dedup possible). Abbas et al. 2023
    scale C with the corpus the same way (50 K clusters on LAION's
    hundreds of millions). floor(sqrt(x)) over IEEE doubles so an
    external SQL oracle (``FLOOR(SQRT(COUNT(*)))``) derives the
    identical C bit-for-bit; floored at 2 so tiny corpora still
    partition.
    """
    import math

    return max(2, math.floor(math.sqrt(n_vectors)))


def semdedup_dropped(
    df: DataFrame,
    n_centroids: int | str = 8,
    threshold: float = 0.45,
    assign: str = "auto",
    n_vectors: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-scoped
    embedding dedup — k-means-partition the space, compare pairs ONLY
    within a cluster, drop all but the lowest-id member of each near-dup
    pair.

    This is the scale answer to :func:`embedding_neardup_pairs`'s a<b
    brute force: pairwise cost collapses from O(n²) to
    O(Σ_c n_c²) — with n/C points per cluster that is a C× reduction, and
    C grows with the corpus (the paper runs 50k clusters on LAION).
    The pairwise stage shuffles once on ``cluster``, an equi-key, so no
    cartesian ever plans.

    Assignment has two regimes, selected by ``assign``:

    - ``"literal"`` — narrow map against a literal centroid array (zero
      shuffle, same as :mod:`.kmeans`). The argmin is one expression with
      C distance folds, so per-row cost grows with C: measured at the sf1
      tile (20 K vectors, 64-dim), C=64 runs 21 s but C=256 runs 74 s —
      the expression tree, not the data, is the bottleneck.
    - ``"join"`` — centroids stay a C-row DataFrame; each vector meets
      them through one broadcast join + per-vector argmin window (the
      :func:`..similarity.ivf_probe_routing` shape). Row count through
      the join is n·C but per-row work is one fold — the regime that
      holds to the paper's 50 K clusters. Same sf1 tile: C=256 16.7 s
      (4.4× over literal), C=64 5.1 s (4.1×).

    ``assign="auto"`` picks literal for C ≤ 32, join above.

    ``n_centroids="auto"`` derives C from the corpus itself via
    :func:`semdedup_auto_centroids` (√n, the paper's grow-C-with-corpus
    dial) at the cost of one scalar count job before planning — unless
    the caller passes ``n_vectors`` (known corpus size from statistics
    or a manifest), which sizes the dial with zero extra jobs; an int
    pins C explicitly (the fixture-scale oracle convention).

    Centroids here are PINNED to the ``n_centroids`` lowest-id vectors
    (the deterministic k-means init convention of ``pq_fit(max_iter=0)``)
    so an external SQL oracle rederives the identical partition — the
    trained-centroid path swaps in :func:`.kmeans.kmeans_fit` output
    without touching anything downstream.

    Returns (cluster, kept_id, dropped_id, cosine): one row per dropped
    vector, paired with its lowest-id same-cluster near-dup witness.
    ``kept_id < dropped_id`` always, but in a transitive chain a witness
    may ITSELF appear as a dropped_id of an even lower id — "kept" means
    "kept relative to this pair", not "a survivor of the whole pass".
    The set of true survivors is exactly the ids never appearing in
    dropped_id; callers needing survivor-resolved witnesses chain pairs
    through :mod:`.components` (connected components exists for this).
    Ties in the
    centroid argmin break toward the lower centroid index on both engines
    and both assignment paths (``array_position`` finds the FIRST
    minimum; the join path orders by (d2, cid)).
    """
    e = widen_narrow_scan(df).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    if n_centroids == "auto":
        # caller-supplied size (zero extra jobs — the pq_topk_auto
        # convention), else ONE bounded scalar count job
        n_centroids = semdedup_auto_centroids(
            e.count() if n_vectors is None else int(n_vectors)
        )
    elif not isinstance(n_centroids, int):
        raise ValueError(f'n_centroids must be an int or "auto", got {n_centroids!r}')
    asg = _semdedup_assign(e, n_centroids, assign).select(
        "vec_id", "cluster", "v"
    )
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    n = asg.select(
        "vec_id", "cluster", "v", F.when(norm > 0, norm).alias("nrm")
    )
    a = n.alias("a")
    b = n.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.cluster").alias("cluster"),
            F.col("a.vec_id").alias("kept_id"),
            F.col("b.vec_id").alias("dropped_id"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    # one row per dropped vector: its lowest-id witness (deterministic)
    w = Window.partitionBy("dropped_id").orderBy(F.asc("kept_id"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "cluster", "kept_id", "dropped_id", F.round("cos", 4).alias("cosine")
        )
    )


def source_overlap_sampled(
    docs: DataFrame,
    n: int = 5,
    rate_denom: int = 4,
    group_col: str = "source",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SKETCHED cross-source n-gram overlap — the 100 TB arm of the
    exact ``source_overlap_matrix`` audit: (source_a, source_b,
    n_shared_est) estimated from a FIXED-THRESHOLD content-hash sample
    of the shingle postings (the theta-sketch/KMV family with a fixed
    θ = 1/rate_denom instead of a fixed k).

    A posting (source, shingle) survives iff
    ``shingle_sid(shingle) % rate_denom == 0`` — a deterministic pure
    function of the shingle TEXT, so (a) the same shingle is sampled in
    every source (intersections subsample coherently: the estimator is
    Bernoulli(1/rate_denom) on the INTERSECTION set, σ =
    sqrt(rate_denom·shared), unlike independent per-source samples
    whose intersection rate would be 1/rate_denom²), (b) per-source
    sketches are MERGEABLE (union across days/shards = distinct union
    of sampled postings), and (c) the whole estimate is bit-reproducible
    on an external SQL engine — the oracle hash-checks the estimates
    themselves, not just a tolerance boolean.

    Estimator: n_shared_est = rate_denom · |sampled A ∩ sampled B| —
    unbiased, σ ≈ sqrt(rate_denom·shared) (measured ≤ 4.8·sqrt(shared)
    across the sf0.001/0.01/0.1 fixtures at rate_denom=4, inside the
    6·sqrt band the tolerance entry pins).

    Scale shape vs the exact matrix: the exact arm's distinct
    (source, shingle) shuffle carries the FULL posting set; here the
    threshold filter runs inside the scan, so the one shuffle carries
    rate_denom× fewer rows (at 100 TB run rate_denom=64..256: sketch
    build is one pass at 0.4–1.6 % shuffle mass) and the |sources|²-
    bounded self-join serves from the sampled postings only.

    ``hash_fn`` picks the threshold hash (the CMS convention):
    ``xxhash64`` (default) is JVM-native — the md5 digest otherwise
    COSTS more than the saved shuffle at local scales (measured:
    sf10 tile exact 63 s vs md5-sampled 69 s vs xxhash64-sampled,
    SCALE.md §Round-9); ``md5`` is the cross-engine audit arm the
    oracle entry pins (sampling stays a pure content function under
    both — determinism and coherent-subsampling hold identically).
    """
    if int(rate_denom) < 1:
        raise ValueError(f"rate_denom must be >= 1, got {rate_denom}")
    if hash_fn == "md5":
        thresh = shingle_sid("shingle") % int(rate_denom) == 0
    elif hash_fn == "xxhash64":
        thresh = F.pmod(F.xxhash64("shingle"), F.lit(int(rate_denom))) == 0
    else:
        raise ValueError(f'hash_fn must be "md5" or "xxhash64", got {hash_fn!r}')
    sampled = (
        docs.select(
            F.col(group_col),
            F.expr(
                "element_at(transform(array(split(text, ' ')), ts -> "
                f"CASE WHEN size(ts) >= {int(n)} THEN "
                f"transform(sequence(1, size(ts) - {int(n) - 1}), "
                f"i -> concat_ws('_', slice(ts, i, {int(n)}))) "
                "ELSE array() END), 1)"
            ).alias("grams"),
        )
        .select(group_col, F.explode("grams").alias("shingle"))
        .filter(thresh)
        .distinct()
    )
    a, b = sampled.alias("a"), sampled.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{group_col}") < F.col(f"b.{group_col}")),
        )
        .groupBy(
            F.col(f"a.{group_col}").alias("source_a"),
            F.col(f"b.{group_col}").alias("source_b"),
        )
        .agg(
            (F.count(F.lit(1)) * int(rate_denom))
            .cast("long")
            .alias("n_shared_est")
        )
    )

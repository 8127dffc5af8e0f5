"""Corpus-curation operators for training-data pipelines: benchmark
decontamination and deterministic source-mixture resampling.

Both are standard LLM-corpus stages (n-gram decontamination per the
GPT-3/C4 papers' public methodology; mixture reweighting per every
multi-source pretraining recipe) expressed as pure DataFrame ops.

Design for 100 TB:

- **Decontamination** joins corpus shingles against BENCHMARK shingles.
  The benchmark side is small by nature (eval suites, not corpora), so
  after `.distinct()` it broadcasts — the corpus side never shuffles: the
  join is a broadcast-hash probe inside the corpus scan, and only matching
  (doc, shingle) rows reach the one aggregation shuffle on doc_id.
- **Mixture sampling** is a per-row predicate on a content fingerprint —
  zero shuffles, zero RNG state: the keep-decision is a pure function of
  document text, so re-ingests, retries, and reordering cannot change the
  sample (the same property dataset_split relies on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import doc_shingles
from .text import fingerprint_expr


def benchmark_ngram_hits(
    docs: DataFrame, benchmark: DataFrame, n: int = 5
) -> DataFrame:
    """(doc_id, n_hits): corpus documents sharing ≥1 n-gram with any
    benchmark document, with the count of distinct shared shingles.

    The decontamination primitive: callers anti-join the flagged ids (or
    threshold on ``n_hits``) before training. ``benchmark`` only needs a
    ``text`` column (plus ``doc_id``, unused for matching).

    The benchmark shingle set carries an explicit broadcast hint — unlike
    the fact-table dims this is justified: a benchmark is an EVAL SUITE,
    bounded by nature (MBs of text), not a table that grows with corpus
    scale. The hint guards against AQE mis-sizing the post-distinct
    aggregate and demoting to a sort-merge join that would shuffle every
    corpus (doc, shingle) posting. Plan-asserted in tests/test_plans.py.
    """
    bench_shingles = doc_shingles(benchmark, n).select("shingle").distinct()
    return (
        doc_shingles(docs, n)
        .join(F.broadcast(bench_shingles), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def content_fingerprint() -> Column:
    """Rolling-hash content fingerprint over the ``text`` column — the
    single shared definition (operators/text.py); DuckDB twin in
    queries/oracle_sql_helpers.py."""
    return fingerprint_expr()


def mixture_sample(
    docs: DataFrame, fractions: dict[str, float], granularity: int = 10_000
) -> DataFrame:
    """Deterministic per-source downsampling to target mixture fractions.

    A document survives iff ``fingerprint % granularity <
    fractions[source] * granularity`` — a pure content predicate, so the
    realized sample is stable under re-ingestion and independent of
    partitioning. Sources absent from ``fractions`` are kept whole.
    Within a source the fingerprint buckets are ~uniform, so realized
    rates converge to the targets at corpus scale (±binomial noise at
    fixture scale — tests assert bounds, not exact counts).
    """
    bucket = content_fingerprint() % granularity
    threshold = F.lit(granularity)  # sources not listed: keep whole
    for src, frac in sorted(fractions.items()):
        # round(), not int(): truncation turns float representation error
        # (0.29 * 10000 = 2899.999...) into a deterministic one-bucket
        # undershoot of the target rate
        threshold = F.when(
            F.col("source") == src, F.lit(round(frac * granularity))
        ).otherwise(threshold)
    return docs.filter(bucket < threshold)


def budget_mixture_sample(
    docs: DataFrame,
    stratum: str = "lang",
    token_budget: int = 100_000,
    granularity: int = 10_000,
) -> DataFrame:
    """Token-BUDGET-driven mixture sampling: downsample each stratum
    (language / source / domain) to at most ``token_budget`` tokens —
    the data-mixing stage of multi-source pretraining when the recipe is
    stated as per-domain token budgets rather than fractions (the common
    form: "cap web text at N tokens, keep code whole").

    Unlike :func:`mixture_sample`'s caller-supplied fractions, the keep
    fraction here is DERIVED from the data: one map-side-combining
    aggregate computes per-stratum token totals T_s, the keep threshold
    is ``least(granularity, granularity * budget div T_s)`` — all-BIGINT
    floor arithmetic, so the realized fraction is bit-reproducible on
    any engine — and the decision predicate is the same content-
    fingerprint bucket as every sampler here: stable under re-ingestion,
    retries, and repartitioning, zero RNG state.  Strata under budget
    clamp to keep-whole.

    Returns the surviving documents with ``_nt`` (token count) attached
    for downstream budget accounting.  Scale shape: one narrow aggregate
    over the corpus (stratum-keyed, partial-agg) + one BROADCAST join of
    the per-stratum thresholds (bounded by |strata|, never corpus-sized)
    + a per-row predicate — the corpus itself never shuffles.
    """
    # the numerator is a CONSTANT product — audit it in Python ints
    # (arbitrary precision) before it ever becomes a BIGINT expression;
    # r8 headroom audit, the budget-sampler sibling of the temperature
    # sampler's in-plan guard (whose numerator is data-dependent)
    if int(granularity) * int(token_budget) > 2**63 - 1:
        raise ValueError(
            "budget_mixture_sample: granularity * token_budget exceeds "
            "int64 — lower granularity (the fraction resolution) for "
            "budgets this large"
        )
    tk = docs.withColumn(
        "_nt", F.size(F.split("text", " ")).cast("long")
    )
    thresholds = (
        tk.groupBy(stratum)
        .agg(F.sum("_nt").alias("_T"))
        .select(
            stratum,
            F.least(
                F.lit(int(granularity)).cast("long"),
                F.expr(
                    f"CAST({int(granularity)} AS BIGINT) * "
                    f"CAST({int(token_budget)} AS BIGINT) div _T"
                ),
            ).alias("_f"),
        )
    )
    bucket = content_fingerprint() % granularity
    return (
        tk.join(F.broadcast(thresholds), stratum)
        .filter(bucket < F.col("_f"))
        .drop("_f")
    )


def temperature_mixture_sample(
    docs: DataFrame,
    stratum: str = "lang",
    total_token_budget: int = 100_000,
    granularity: int = 10_000,
    thresholds_mode: str = "plan",
) -> DataFrame:
    """Temperature-based multilingual sampling at α = 0.5 (Conneau &
    Lample 2019; the XLM-R recipe): a TOTAL token budget is divided
    among strata proportionally to √T_s instead of T_s, so low-resource
    languages are up-weighted relative to their raw share — kept tokens
    per stratum ∝ √T_s, the flattening that keeps small languages from
    vanishing under proportional sampling.

    Exactly α = 0.5 and only α = 0.5: IEEE ``sqrt`` is a
    correctly-rounded operation, so ``floor(sqrt(T) * 1000 + 0.5)`` is
    the SAME BIGINT on any engine and the whole threshold derivation
    stays in exact integer arithmetic (``pow(x, α)`` for general α is
    not correctly rounded and would not oracle-check).  keep_s =
    min(1, B·w_s / (Σw·T_s)) with w_s the quantized √T_s; the decision
    predicate is the shared content fingerprint — deterministic, zero
    RNG.  Same plan shape as :func:`budget_mixture_sample`: one
    partial-agg totals pass, a 1-row Σw broadcast, a |strata|-row
    threshold broadcast, per-row predicate — the corpus never shuffles.

    BIGINT headroom (r8, the audited axis): the numerator gran·B·w_s
    overflows int64 around T_s ≈ 10^13 tokens per stratum at the
    default scales.  ``thresholds_mode="plan"`` (default, the
    oracle-checked arm) keeps the all-BIGINT in-plan arithmetic but
    GUARDS both the numerator and the denominator — it raises a clear
    error strictly before any wraparound (tested on an engineered
    tile), never a wrong fraction.  ``thresholds_mode="driver"``
    computes the |strata| thresholds driver-side in arbitrary-precision
    Python ints from the same bounded totals collect (|strata| rows —
    the kmeans-centroid convention) — bit-identical to plan mode in the
    shared domain and exact at ANY magnitude; that is the 100 TB dial.
    """
    if thresholds_mode not in ("plan", "driver"):
        raise ValueError(
            f"thresholds_mode must be 'plan' or 'driver', got {thresholds_mode!r}"
        )
    gran, budget = int(granularity), int(total_token_budget)
    tk = docs.withColumn("_nt", F.size(F.split("text", " ")).cast("long"))
    w = (
        tk.groupBy(stratum)
        .agg(F.sum("_nt").alias("_T"))
        .select(
            stratum,
            "_T",
            F.floor(F.sqrt(F.col("_T").cast("double")) * 1000 + F.lit(0.5))
            .cast("long")
            .alias("_w"),
        )
    )
    if thresholds_mode == "driver":
        # bounded collect: |strata| rows; Python ints never overflow,
        # and floor division here is the same exact integer div
        rows = w.collect()
        sw_exact = sum(int(r["_w"]) for r in rows)
        thresholds = docs.sparkSession.createDataFrame(
            [
                (
                    r[stratum],
                    min(gran, (gran * budget * int(r["_w"]))
                        // (sw_exact * int(r["_T"]))),
                )
                for r in rows
            ],
            [stratum, "_f"],
        )
    else:
        # max _w such that gran*budget*_w fits int64; 0 when gran*budget
        # alone exceeds it (then the guard always fires — correct)
        max_w = (2**63 - 1) // (gran * budget)
        overflow = F.raise_error(
            F.lit(
                "temperature_mixture_sample: BIGINT threshold arithmetic "
                "would overflow (gran*budget*w or sum_w*T exceeds int64) — "
                "use thresholds_mode='driver'"
            )
        )
        guarded = F.when(
            (F.col("_w") <= F.lit(max_w))
            & (
                F.col("_sw")
                <= F.expr(f"CAST({2**63 - 1} AS BIGINT) div _T")
            ),
            F.expr(
                f"CAST({gran} AS BIGINT) * "
                f"CAST({budget} AS BIGINT) * _w "
                f"div (_sw * _T)"
            ),
        ).otherwise(overflow)
        sw = w.agg(F.sum("_w").alias("_sw"))
        thresholds = (
            w.crossJoin(F.broadcast(sw))
            .select(
                stratum,
                F.least(F.lit(gran).cast("long"), guarded).alias("_f"),
            )
        )
    bucket = content_fingerprint() % granularity
    return (
        tk.join(F.broadcast(thresholds), stratum)
        .filter(bucket < F.col("_f"))
        .drop("_f")
    )


def stratified_exact_n_sample(
    docs: DataFrame,
    stratum: str = "lang",
    n_per_stratum: int = 30,
    prefilter: bool = False,
    prefilter_margin: int = 4,
    granularity: int = 10_000,
) -> DataFrame:
    """Exact-N-per-stratum deterministic sample — the EVAL-SET CARVING
    op: where the mixture samplers realize target FRACTIONS (sizes
    drift binomially), benchmark/eval construction needs exactly N
    documents per language/source, reproducibly.  Documents rank within
    each stratum by (content fingerprint, doc_id) — a pseudo-random but
    purely content-derived order, so the sample is stable under
    re-ingestion, retries, and repartitioning, zero RNG state — and the
    first N survive (a stratum smaller than N is kept whole).  The full
    sort key is (fp % granularity, fp, doc_id): the leading BUCKET term
    is what lets the prefilter below stay exact.

    Scale shape: exact-N is a per-stratum top-N, and a ROW_NUMBER
    window sorts each stratum in one task — fine for |stratum| in the
    millions, wrong for a corpus-sized stratum.  ``prefilter=True`` is
    the 100 TB dial: one partial-agg totals pass sizes a per-stratum
    fingerprint-bucket threshold t_s ≈ margin·N/T_s·granularity, only
    rows with ``fp % granularity < t_s`` enter the window, and the
    selection stays EXACT by construction — the N smallest
    (fp, doc_id) keys all lie below any threshold that admits ≥ N rows
    — with that admission count VERIFIED per stratum (one aggregate;
    raises with the margin dial named if a stratum under-fills, never
    silently approximates).  The window then sorts ~margin·N rows per
    stratum instead of T_s.

    Returns (stratum, doc_id, n_tokens) plus ``_rk`` dropped; both
    arms are equality-tested and the default arm is the driver-checked
    oracle formulation.
    """
    from pyspark.sql.window import Window

    n = int(n_per_stratum)
    if n < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    base = docs.select(
        F.col(stratum),
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        content_fingerprint().alias("_fp"),
    ).withColumn("_bk", F.col("_fp") % int(granularity))
    if prefilter:
        gran = int(granularity)
        totals = base.groupBy(stratum).agg(F.count(F.lit(1)).alias("_T"))
        thr = totals.select(
            stratum,
            F.least(
                F.lit(gran).cast("long"),
                F.ceil(
                    F.lit(float(prefilter_margin * n * gran)) / F.col("_T")
                ).cast("long"),
            ).alias("_t"),
        )
        base = base.join(F.broadcast(thr), stratum).filter(
            F.col("_bk") < F.col("_t")
        )
        # totals drives the probe via a LEFT join: a stratum whose
        # prefilter admitted ZERO rows has no group in the kept counts
        # at all — exactly the case that must flag loudest
        short = (
            totals.join(
                base.groupBy(stratum).agg(F.count(F.lit(1)).alias("_kept")),
                stratum,
                "left",
            )
            .select(
                stratum,
                "_T",
                F.coalesce("_kept", F.lit(0)).alias("_kept"),
            )
            .filter((F.col("_kept") < n) & (F.col("_T") >= n))
            .limit(1)
            .collect()  # bounded: emptiness probe
        )
        if short:
            raise ValueError(
                f"stratified_exact_n_sample: prefilter admitted "
                f"{short[0]['_kept']} < n={n} rows for stratum "
                f"{short[0][stratum]!r} — raise prefilter_margin "
                f"(currently {prefilter_margin})"
            )
    # rank by (bucket, fp, doc_id): the prefilter cuts on the BUCKET, so
    # exactness needs the bucket leading the sort key — the N smallest
    # composite keys provably lie below any bucket threshold admitting
    # >= N rows; fp and doc_id break ties deterministically
    w = Window.partitionBy(stratum).orderBy(
        F.asc("_bk"), F.asc("_fp"), F.asc("doc_id")
    )
    return (
        base.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .select(stratum, "doc_id", "n_tokens")
    )


def leak_free_split(
    docs: DataFrame,
    stratum: str = "lang",
    n_per_stratum: int = 30,
    n: int = 5,
    prefilter: bool = False,
) -> DataFrame:
    """Carve an exact-N-per-stratum eval set, then SCRUB THE TRAINING
    CORPUS AGAINST IT — the end-to-end leak-free-split product every
    LLM data pipeline ships: (doc_id, stratum, split) over the whole
    corpus with split ∈ {'eval', 'train', 'cut'}, where 'cut' marks a
    non-eval document sharing (per the Bloom filter) at least one
    n-gram with ANY eval document.

    Composition of two individually-verified stages, composed in the
    direction benchmark decontamination cannot run (there the eval set
    is external; here WE carve it, so the scrub must run after the
    carve over the same corpus):

    1. :func:`stratified_exact_n_sample` — deterministic, content-
       fingerprint-ranked exactly-N eval docs per stratum (the
       ``prefilter`` dial is its 100 TB arm, threaded through).
    2. :func:`..bloom.bloom_bitset` over the EVAL documents' n-gram
       shingles + :func:`..bloom.bloom_positive_shingles` over the
       remaining corpus — the m-bit broadcast membership test.  Bloom
       false positives only ever move a train doc to 'cut'
       (conservative drop, deterministic md5 family — hash-checkable);
       false negatives are impossible, so ZERO eval n-grams survive in
       the kept train split, the property the planted-contamination
       test pins.

    Scale shape: the eval id list is |strata|·N rows (a stored
    artifact — eagerly materialized, it drives three consumers), the
    bitset is ≤ m rows broadcast, and the corpus side is one narrow
    shingle explode + broadcast probe + per-doc aggregate — no
    corpus×eval join, no shuffle wider than doc_id.
    """
    from .bloom import bloom_bitset, bloom_positive_shingles

    base = docs.select("doc_id", stratum, "text")
    # bounded: |strata|*N rows — the carved eval list IS the artifact;
    # it drives three consumers (eval text lookup, the train anti-join,
    # the final label), so materialize once (stored-artifact rule)
    eval_ids = (
        stratified_exact_n_sample(
            docs, stratum=stratum, n_per_stratum=n_per_stratum,
            prefilter=prefilter,
        )
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    eval_docs = base.join(F.broadcast(eval_ids), "doc_id")
    bits = bloom_bitset(eval_docs, n=n)
    train0 = base.join(F.broadcast(eval_ids), "doc_id", "left_anti")
    contaminated = (
        bloom_positive_shingles(doc_shingles(train0, n=n), bits)
        .select("doc_id")
        .distinct()
    )
    return (
        base.join(
            F.broadcast(eval_ids.withColumn("_e", F.lit(1))), "doc_id", "left"
        )
        .join(contaminated.withColumn("_c", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            stratum,
            F.when(F.col("_e").isNotNull(), F.lit("eval"))
            .when(F.col("_c").isNotNull(), F.lit("cut"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
    )

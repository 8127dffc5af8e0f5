"""Bloom-filter benchmark decontamination.

The exact decontamination pass (``operators.curation.benchmark_ngram_hits``)
broadcasts the benchmark's raw shingle strings — fine while the benchmark
suite is small, but a 100 TB-era eval union (every public benchmark +
held-out splits) can carry 10^8+ distinct n-grams, and shipping the strings
to every executor stops being free. The standard fix is the one Bloom
published in 1970 and every large corpus pipeline reuses: broadcast a fixed
``m``-bit array instead, at the price of a bounded false-positive rate
(``(1 - e^{-kn/m})^k``). FPs only ever *over*-flag (a doc falsely marked
contaminated is dropped conservatively); misses are impossible, which is
exactly the asymmetry decontamination wants.

Relational encoding (no bitset type needed on either engine, so the same
construction runs verbatim in the DuckDB oracle):

- the bit array is the DISTINCT set of hash positions of the benchmark
  shingles — at most ``m`` rows regardless of benchmark size, broadcast;
- a probe shingle is bloom-positive iff ALL ``k`` of its positions are
  present: explode the k positions, inner-join the bit table, and keep
  (doc, shingle) groups whose matched-row count is ``k``.

The hash family must be bit-identical across engines, so it is built from
md5 hex slices (the ``MD5_SID_*`` convention of ``operators.dedup``):
two disjoint 15-hex-char (60-bit) slices of ``md5(shingle)`` plus one slice
of ``md5(shingle || '!')``, each reduced mod ``m``. No engine-specific hash
(xxhash64, DuckDB ``hash``) appears anywhere.

Scale shape: the benchmark side collapses to ≤ m distinct positions (one
small broadcast). The corpus side is a narrow scan → explode(k) → broadcast
join → per-(doc, shingle) count — no shuffle wider than the final per-doc
aggregation, same as the exact pass it replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import doc_shingles

#: Bits in the filter. 2^16 keeps the sf0.1 fixture benchmark (~8k distinct
#: 5-grams at BENCH_MOD 29) under 0.4 load with k=3 → FP rate ≈ 3%. At a
#: real 10^8-shingle suite you would size m ≈ 2^30 (128 MiB broadcast, FP
#: ≈ 1e-3) — the point of the op is that this dial exists at all; the raw
#: string broadcast has no such dial.
BLOOM_M = 1 << 16
BLOOM_K = 3


def _position_exprs(shingle_sql: str) -> list[str]:
    """The k hash positions of ``shingle_sql`` as Spark-SQL expression
    strings. Mirrored EXACTLY by :func:`bloom_position_sql_duck`; change
    them together or not at all."""
    return [
        f"cast(conv(substring(md5({shingle_sql}), 1, 15), 16, 10) as bigint) % {BLOOM_M}",
        f"cast(conv(substring(md5({shingle_sql}), 16, 15), 16, 10) as bigint) % {BLOOM_M}",
        f"cast(conv(substring(md5(concat({shingle_sql}, '!')), 1, 15), 16, 10) as bigint) % {BLOOM_M}",
    ]


def bloom_position_sql_duck(shingle_sql: str) -> list[str]:
    """DuckDB twins of :func:`_position_exprs` (same md5 slices, same
    modulus — md5 hex is engine-independent, so the bit positions are
    bit-identical by construction)."""
    return [
        f"('0x' || substring(md5({shingle_sql}), 1, 15))::BIGINT % {BLOOM_M}",
        f"('0x' || substring(md5({shingle_sql}), 16, 15))::BIGINT % {BLOOM_M}",
        f"('0x' || substring(md5({shingle_sql} || '!'), 1, 15))::BIGINT % {BLOOM_M}",
    ]


def bloom_bitset(bench: DataFrame, n: int = 5) -> DataFrame:
    """DISTINCT hash positions (column ``pos``) of the benchmark's n-gram
    shingles — the Bloom filter's set bits as a ≤ ``BLOOM_M``-row table."""
    return _bitset_of(doc_shingles(bench, n=n).select("shingle").distinct())


def _bitset_of(bench_sh: DataFrame) -> DataFrame:
    """Set bits of an already-distinct ``shingle`` frame (lets a caller
    that also needs the shingle set reuse one shingling pass)."""
    pos_arr = F.array(*[F.expr(e) for e in _position_exprs("shingle")])
    return bench_sh.select(F.explode(pos_arr).alias("pos")).distinct()


def bloom_positive_shingles(probe: DataFrame, bits: DataFrame) -> DataFrame:
    """(doc_id, shingle) rows whose ALL-k hash positions are set in
    ``bits`` — the Bloom membership test as relational algebra. Shared by
    the batch audit and the streaming filter (one definition, so the two
    cannot drift).

    Membership = all ``k`` hash FUNCTIONS matched, counted as DISTINCT
    matched hash indices (``posexplode`` tags each position with its
    function index). A plain matched-row count would break two ways: a
    duplicated (doc_id, shingle) probe row would double the count past k
    (a FALSE NEGATIVE — the one failure mode Bloom promises impossible),
    and two hash functions colliding onto one set position must still
    count as two matches, which a distinct-position count would miss.
    Output is distinct per (doc_id, shingle) regardless of probe
    duplication."""
    pos_arr = F.array(*[F.expr(e) for e in _position_exprs("shingle")])
    probe_pos = probe.select(
        "doc_id", "shingle", F.posexplode(pos_arr).alias("hi", "pos")
    )
    return (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("doc_id", "shingle")
        .agg(F.count_distinct("hi").alias("n_set"))
        .filter(F.col("n_set") == BLOOM_K)
        .select("doc_id", "shingle")
    )


def bloom_contamination(
    corpus: DataFrame, bench: DataFrame, n: int = 5
) -> DataFrame:
    """Per-document contamination counts under the Bloom prefilter.

    Returns (doc_id, n_bloom, n_exact): distinct corpus shingles flagged by
    the filter vs. truly present in the benchmark set, for every doc with
    at least one bloom-positive shingle. ``n_bloom - n_exact`` is the
    measured FP overhang — the quantity you tune ``BLOOM_M`` against.
    """
    bench_sh = doc_shingles(bench, n=n).select("shingle").distinct()
    bits = _bitset_of(bench_sh)
    probe = doc_shingles(corpus, n=n)  # distinct per doc by construction

    per_doc_bloom = bloom_positive_shingles(probe, bits).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bloom")
    )
    per_doc_exact = (
        probe.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    return (
        per_doc_bloom.join(per_doc_exact, "doc_id", "left")
        .select(
            "doc_id",
            "n_bloom",
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
        )
    )

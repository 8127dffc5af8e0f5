"""Property-based tests (hypothesis) for the hand-built operators.

Each property checks the scalable formulation against a brute-force
reference on small random inputs — the operators' correctness must not
depend on fixture quirks. Example counts are kept low: every example is a
Spark job.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spotify_etl_pipeline_spark.operators.asof import asof_join

BASE = datetime(2024, 1, 1)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# (key, minutes-offset) event lists; distinct offsets per side avoid
# cross-engine tie ambiguity (tie determinism is pinned in test_asof.py).
_left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500)),
    min_size=1, max_size=25, unique=True,
)
_right_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(0, 1000)),
    min_size=1, max_size=25, unique_by=lambda r: (r[0], r[1]),
)


@given(left=_left_rows, right=_right_rows)
@settings(**_SETTINGS)
def test_asof_equals_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, BASE + timedelta(minutes=m)) for i, (k, m) in enumerate(left)],
        "id long, k long, lts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, BASE + timedelta(minutes=m), float(v)) for k, m, v in right],
        "k long, rts timestamp, v double",
    )
    got = {
        r["id"]: r["v"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
            right_values=["v"], how="left",
        ).collect()
    }
    # brute force: latest right at-or-before, per key
    expect = {}
    for i, (k, m) in enumerate(left):
        cands = [(rm, v) for rk, rm, v in right if rk == k and rm <= m]
        expect[i] = float(max(cands)[1]) if cands else None
    assert got == expect


_edges = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1, max_size=30,
)


@pytest.mark.parametrize(
    "cc_fn", ["connected_components", "connected_components_star"]
)
@given(edges=_edges)
@settings(**_SETTINGS)
def test_components_equal_union_find(spark, cc_fn, edges):
    """Both components engines — min-label propagation and the large-star/
    small-star contraction — must agree with brute-force union-by-min."""
    import spotify_etl_pipeline_spark.operators.components as C

    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in getattr(C, cc_fn)(edf).collect()
    }
    # brute-force union-find
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}
    assert got == expect


_doc_texts = st.lists(
    st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=5),
        min_size=1, max_size=30,
    ).map(" ".join),
    min_size=1, max_size=6,
)


@given(
    texts=_doc_texts,
    size=st.integers(2, 8),
    data=st.data(),
)
@settings(**_SETTINGS)
def test_chunk_windows_cover_and_reconstruct(spark, texts, size, data):
    """Invariants for any valid (size, stride >= stride <= size): every
    token position is covered by >=1 chunk; windows start exactly every
    `stride` tokens; lengths are slice-clamped; and at stride == size the
    chunks partition the doc. (stride > size is rejected by the operator —
    it would leave coverage gaps; pinned below.)"""
    from spotify_etl_pipeline_spark.operators.text import chunk_windows

    stride = data.draw(st.integers(1, size))

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_windows(df, size=size, stride=stride).collect()
    n_toks = {i: len(t.split(" ")) for i, t in enumerate(texts)}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_toks)
    for doc_id, chunks in by_doc.items():
        n = n_toks[doc_id]
        chunks.sort(key=lambda r: r["chunk_id"])
        starts = [r["start_tok"] for r in chunks]
        assert starts == list(range(0, n, stride))
        covered = set()
        for r in chunks:
            assert r["n_toks"] == min(size, n - r["start_tok"])
            covered.update(range(r["start_tok"], r["start_tok"] + r["n_toks"]))
        assert covered == set(range(n))
        if stride == size:  # exact partition: lengths sum to n, no overlap
            assert sum(r["n_toks"] for r in chunks) == n


def test_chunk_windows_rejects_gapping_stride(spark):
    """stride > size would silently drop inter-window tokens — must raise."""
    import pytest as _pytest

    from spotify_etl_pipeline_spark.operators.text import chunk_windows

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="stride"):
        chunk_windows(df, size=2, stride=3)


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


_names = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=2, max_size=10, unique=True,
)


@given(names=_names)
@settings(**_SETTINGS)
def test_fuzzy_match_equals_bruteforce(spark, names):
    """Deletion-1 blocking + verify must produce EXACTLY the pairs a
    quadratic levenshtein scan finds at distance <= 1 — the tiny 'abc'
    alphabet forces dense collisions, repeated-char strings, and every
    edit kind."""
    from spotify_etl_pipeline_spark.operators.fuzzy import fuzzy_match_pairs

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, name string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_match_pairs(df, "id", "name").collect()
    }
    expect = {
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if _levenshtein(names[i], names[j]) <= 1
    }
    assert got == expect


_intervals_strategy = st.lists(
    st.tuples(st.integers(0, 100), st.integers(0, 20)),  # (start_sec, len_sec)
    min_size=1, max_size=15,
)


@given(a_rows=_intervals_strategy, b_rows=_intervals_strategy)
@settings(**_SETTINGS)
def test_interval_overlap_equals_bruteforce(spark, a_rows, b_rows):
    """Bucketed interval join == quadratic scan for ANY interval layout
    with length <= the bucket width (20s here), including zero-length
    intervals and bucket-boundary starts."""
    from spotify_etl_pipeline_spark.operators.intervals import (
        interval_overlap_join,
    )

    def df(rows, tag):
        return spark.createDataFrame(
            [
                (i, s * 1_000_000, (s + ln) * 1_000_000)
                for i, (s, ln) in enumerate(rows)
            ],
            "id long, start_us long, end_us long",
        )

    got = {
        (r["a_id"], r["b_id"], r["overlap_sec"])
        for r in interval_overlap_join(df(a_rows, "a"), df(b_rows, "b"),
                                       max_len_sec=20).collect()
    }
    expect = set()
    for i, (sa, la) in enumerate(a_rows):
        for j, (sb, lb) in enumerate(b_rows):
            ea, eb = sa + la, sb + lb
            if sa <= eb and sb <= ea:
                expect.add((i, j, min(ea, eb) - max(sa, sb)))
    assert got == expect


# --- PageRank vs brute-force power iteration --------------------------------
_edges = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(1, 9)),
    min_size=1, max_size=20, unique_by=lambda e: (e[0], e[1]),
)


@given(edges=_edges)
@settings(**_SETTINGS)
def test_pagerank_equals_bruteforce(spark, edges):
    from spotify_etl_pipeline_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=3, damping=0.85, weight="w").collect()
    }
    # brute force in plain python
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + float(w)
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        contrib = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            contrib[d] += ranks[s] * float(w) / outw[s]
        dm = sum(ranks[v] for v in nodes if v not in outw)
        ranks = {
            v: 0.15 / n + 0.85 * (contrib[v] + dm / n) for v in nodes
        }
    assert set(got) == set(ranks)
    for v in nodes:
        assert abs(got[v] - ranks[v]) < 1e-9, (v, got[v], ranks[v])
    # mass conservation: damping + dangling redistribution keep sum(rank)=1
    assert abs(sum(got.values()) - 1.0) < 1e-9


# --- rolling EMA stream-state fold vs direct formula ------------------------
_vals = st.lists(st.integers(-1000, 1000), min_size=1, max_size=30)


@given(vals=_vals)
@settings(**_SETTINGS)
def test_rolling_ema_batch_equals_bruteforce(spark, vals):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [(i, 1, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, cents double")
    w8 = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-7, Window.currentRow)
    )
    got = {
        r["event_id"]: r["ema8"]
        for r in df.withColumn("vals", F.collect_list("cents").over(w8))
        .select(
            "event_id",
            F.expr(
                "aggregate(transform(vals, (x, i) -> "
                "x * pow(0.5D, size(vals) - 1 - i)), 0D, (acc, v) -> acc + v)"
            ).alias("ema8"),
        )
        .collect()
    }
    for i in range(len(vals)):
        frame = vals[max(0, i - 7) : i + 1]
        exp = sum(float(v) * 2.0 ** (j + 1 - len(frame)) for j, v in enumerate(frame))
        assert got[i] == exp, (i, got[i], exp)  # dyadic => exact equality


# documents as lists of token-lists over a tiny alphabet so duplicated
# spans actually occur; W small so short docs still participate
_corpus = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
    min_size=1,
    max_size=10,
)


@given(docs=_corpus)
@settings(**_SETTINGS)
def test_dup_span_coverage_equals_bruteforce(spark, docs):
    from spotify_etl_pipeline_spark.operators.text import dup_span_coverage

    w = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs) if toks]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # brute force: spans per doc, cross-doc duplicated spans, position union
    spans = {
        i: [tuple(toks[p : p + w]) for p in range(len(toks) - w + 1)]
        for i, toks in enumerate(docs)
        if toks
    }
    owners: dict[tuple, set] = {}
    for i, ss in spans.items():
        for s in ss:
            owners.setdefault(s, set()).add(i)
    expected = {}
    for i, toks in enumerate(docs):
        if not toks:
            continue
        covered = set()
        for p, s in enumerate(spans.get(i, [])):
            if len(owners.get(s, ())) >= 2:
                covered.update(range(p, p + w))
        expected[i] = (
            len(toks),
            len(covered),
            (len(covered) * 1000) // len(toks),
        )

    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_permille"])
        for r in dup_span_coverage(df, w=w).collect()
    }
    assert got == expected


# --- round-4 operators: Bloom membership + SemDeDup -------------------------
_doc_texts = st.lists(
    st.text(alphabet="abcdef ", min_size=10, max_size=60),
    min_size=2, max_size=10,
)


@given(texts=_doc_texts, bench_count=st.integers(1, 3))
@settings(**_SETTINGS)
def test_bloom_never_misses_property(spark, texts, bench_count):
    """Bloom membership has no false negatives on ARBITRARY text: every
    shingle truly shared with the benchmark set must be flagged. (The
    fixture-scale twin lives in test_semdedup_bloom.py; this one feeds
    generated short texts, including heavy duplicate/whitespace shapes.)"""
    from spotify_etl_pipeline_spark.operators.bloom import (
        bloom_bitset,
        bloom_positive_shingles,
    )
    from spotify_etl_pipeline_spark.operators.dedup import doc_shingles

    n = 2  # short shingles so tiny generated texts still produce them
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = docs.filter(docs.doc_id < bench_count)
    corpus = docs.filter(docs.doc_id >= bench_count)

    bits = bloom_bitset(bench, n=n)
    flagged = {
        (r["doc_id"], r["shingle"])
        for r in bloom_positive_shingles(doc_shingles(corpus, n=n), bits).collect()
    }
    bench_sh = {r["shingle"] for r in doc_shingles(bench, n=n).collect()}
    corpus_sh = {
        (r["doc_id"], r["shingle"]) for r in doc_shingles(corpus, n=n).collect()
    }
    truly_shared = {(d, s) for d, s in corpus_sh if s in bench_sh}
    missed = truly_shared - flagged
    assert not missed, f"bloom false negatives: {sorted(missed)[:3]}"


_vectors = st.lists(
    st.lists(st.integers(-3, 3), min_size=4, max_size=4),
    min_size=2, max_size=12,
)


@given(vecs=_vectors)
@settings(**_SETTINGS)
def test_semdedup_subset_property(spark, vecs):
    """On arbitrary small integer vectors (including zero vectors and
    exact duplicates), SemDeDup pairs are a subset of the brute-force
    above-threshold pairs, and both assignment regimes agree."""
    from spotify_etl_pipeline_spark.operators.dedup import (
        embedding_neardup_pairs,
        semdedup_dropped,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    c = min(3, len(rows))
    lit = semdedup_dropped(emb, n_centroids=c, threshold=0.45, assign="literal")
    jon = semdedup_dropped(emb, n_centroids=c, threshold=0.45, assign="join")
    lit_rows = {tuple(r) for r in lit.collect()}
    assert lit_rows == {tuple(r) for r in jon.collect()}
    sem_pairs = {(r[1], r[2]) for r in lit_rows}
    brute = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.45).collect()
    }
    assert sem_pairs <= brute


# --- round 8: substring witness policies / samplers --------------------------

# small-alphabet token lists so cross-doc duplicated windows actually
# occur at L=3
_r8_corpus = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
    min_size=2,
    max_size=8,
)


@given(docs=_r8_corpus)
@settings(**_SETTINGS)
def test_keep_first_cut_is_subset_of_keep_all(spark, docs):
    """keep='first' exempts exactly one occurrence per duplicated
    window, so its cut list is a SUBSET of keep='all''s: every token
    keep-all retains, keep-first retains too (per (doc, position)) —
    and keep-first never cuts more in total."""
    from spotify_etl_pipeline_spark.operators.text import substring_cut_corpus

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs) if toks]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out_all = {
        r["doc_id"]: r for r in substring_cut_corpus(df, min_len=3).collect()
    }
    out_first = {
        r["doc_id"]: r
        for r in substring_cut_corpus(df, min_len=3, keep="first").collect()
    }
    def is_subseq(small, big):
        it = iter(big)
        return all(t in it for t in small)

    for did, text in rows:
        a, f = out_all[did], out_first[did]
        assert f["n_cut"] <= a["n_cut"]
        # keep-first's cut list is a subset of keep-all's, so keep-all's
        # kept positions are a subset of keep-first's — which makes
        # keep-all's clean text an order-preserving SUBSEQUENCE of
        # keep-first's (the canonical check; reconstructing positions
        # from text is ambiguous for repeated tokens)
        cl_a = a["clean_text"].split(" ") if a["clean_text"] else []
        cl_f = f["clean_text"].split(" ") if f["clean_text"] else []
        assert is_subseq(cl_a, cl_f), (did, cl_a, cl_f)


@given(docs=_r8_corpus)
@settings(**_SETTINGS)
def test_fixpoint_leaves_no_cross_doc_span(spark, docs):
    """substring_cut_fixpoint's contract, on random corpora: the
    cleaned corpus contains NO cross-doc duplicated window of >= L
    tokens at all (the invariant one cutting pass cannot promise)."""
    from pyspark.sql import functions as F

    from spotify_etl_pipeline_spark.operators.text import (
        exact_substring_spans,
        substring_cut_fixpoint,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs) if toks]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    clean = substring_cut_fixpoint(df, min_len=3, max_passes=12).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    assert exact_substring_spans(clean, min_len=3).count() == 0


_r8_texts = st.lists(
    st.lists(st.sampled_from(list("abcdefgh")), min_size=1, max_size=6),
    min_size=4,
    max_size=24,
)


@given(texts=_r8_texts, n=st.integers(1, 5), margin=st.integers(2, 8))
@settings(**_SETTINGS)
def test_stratified_prefilter_always_equals_full(spark, texts, n, margin):
    """The prefilter arm is EXACT by construction — on any corpus, any
    N, any margin, it must either select the identical set or raise the
    underfill guard (never a silently different sample). This is the
    property the r8 rank-key bug (prefilter on the bucket, rank on the
    raw fingerprint) would have failed immediately."""
    from spotify_etl_pipeline_spark.operators.curation import (
        stratified_exact_n_sample,
    )

    rows = [
        (i, ["en", "fr"][i % 2], " ".join(t) + f" t{i}")
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    full = {
        (r["lang"], r["doc_id"])
        for r in stratified_exact_n_sample(df, n_per_stratum=n).collect()
    }
    try:
        pre = {
            (r["lang"], r["doc_id"])
            for r in stratified_exact_n_sample(
                df, n_per_stratum=n, prefilter=True, prefilter_margin=margin
            ).collect()
        }
    except ValueError as e:
        assert "prefilter_margin" in str(e)
        return
    assert pre == full


@given(texts=_r8_texts, budget=st.integers(5, 200))
@settings(**_SETTINGS)
def test_temperature_driver_mode_always_equals_plan(spark, texts, budget):
    """thresholds_mode='driver' (Python-int exact arithmetic) must keep
    the identical documents as the in-plan BIGINT arithmetic on any
    corpus/budget inside the shared headroom domain."""
    from spotify_etl_pipeline_spark.operators.curation import (
        temperature_mixture_sample,
    )

    rows = [
        (i, ["en", "fr", "de"][i % 3], " ".join(t) + f" t{i}")
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    plan = {
        r["doc_id"]
        for r in temperature_mixture_sample(df, total_token_budget=budget)
        .select("doc_id")
        .collect()
    }
    driver = {
        r["doc_id"]
        for r in temperature_mixture_sample(
            df, total_token_budget=budget, thresholds_mode="driver"
        )
        .select("doc_id")
        .collect()
    }
    assert plan == driver


# --- bpe_encode_ids: random corpora vs the pure-Python greedy reference ---

_bpe_words = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    min_size=1, max_size=12,
)
_bpe_docs = st.lists(_bpe_words, min_size=1, max_size=6)


@given(docs=_bpe_docs, k=st.integers(0, 5))
@settings(**_SETTINGS)
def test_bpe_encode_ids_equals_reference(spark, docs, k):
    """Trained-on-corpus ids must equal the textbook greedy trainer +
    encoder (first-step-wins id space) on arbitrary small corpora —
    including words the trainer filter drops (length 1) and k=0."""
    from tests.test_bpe_trainer import (
        _reference_bpe,
        _reference_ids,
        _vocab_of,
    )

    from spotify_etl_pipeline_spark.operators.text import (
        bpe_encode_ids,
        bpe_train_merges,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    merges = bpe_train_merges(df, n_merges=k) if k else (
        bpe_train_merges(df, n_merges=1).filter("step < 1")
    )
    rules = [
        (r["x"], r["y"]) for r in merges.orderBy("step").collect()
    ]
    want = _reference_ids(rows, rules)
    got = {
        r["doc_id"]: (r["n_tokens"], r["token_ids"])
        for r in bpe_encode_ids(df, merges=merges).collect()
    }
    assert got == want


# --- source_overlap_sampled: rate=1 exactness on random posting sets ---

_ovl_docs = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1", "s2"]),
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"]),
                 min_size=5, max_size=12),
    ),
    min_size=2, max_size=8,
)


@given(docs=_ovl_docs)
@settings(**_SETTINGS)
def test_source_overlap_sampled_rate1_equals_bruteforce(spark, docs):
    """rate_denom=1 must reproduce the exact distinct-5-gram overlap
    matrix on arbitrary corpora (both hash families)."""
    from collections import defaultdict
    from itertools import combinations

    from spotify_etl_pipeline_spark.operators.dedup import (
        source_overlap_sampled,
    )

    rows = [(i, src, " ".join(ws)) for i, (src, ws) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    postings = defaultdict(set)
    for _, src, text in rows:
        toks = text.split(" ")
        for i in range(len(toks) - 4):
            postings[src].add("_".join(toks[i : i + 5]))
    want = {}
    for a, b in combinations(sorted(postings), 2):
        n = len(postings[a] & postings[b])
        if n:
            want[(a, b)] = n
    for fam in ("xxhash64", "md5"):
        got = {
            (r["source_a"], r["source_b"]): r["n_shared_est"]
            for r in source_overlap_sampled(
                df, n=5, rate_denom=1, hash_fn=fam
            ).collect()
        }
        assert got == want, fam


# --- PII scrub: terminal + conservation on adversarial token soup -----------
# Fragments chosen to probe the pattern boundaries: real PII instances,
# near-misses (17-digit runs, double-@, 3-octet "IPs", short digit
# groups), and plain words — concatenated in random order with random
# separators so matches land adjacent to each other and to lookalikes.
_pii_frags = st.lists(
    st.sampled_from([
        "alice.b+c@ex-1.org", "x@y.io", "123-45-6789", "+1-555-0042",
        "+12-123-9999", "10.2.0.1", "255.255.255.255", "4111111111111111",
        "1234567890123", "12345678901234567",  # 17 digits: must NOT match
        "a@@b.cc", "1.2.3", "123-456", "999-99-9999x", "word", "scan12",
    ]),
    min_size=1, max_size=12,
)
_pii_seps = st.sampled_from([" ", "  ", " , ", "."])


@given(frags=_pii_frags, sep=_pii_seps)
@settings(**_SETTINGS)
def test_pii_scrub_terminal_and_conserving(spark, frags, sep):
    """Scrubbing is TERMINAL (a second pass finds nothing and changes
    nothing — replacement tokens carry no digits or '@', so they can
    never seed a new match across a boundary) and CONSERVING (each
    audit count equals the number of its tokens in the output — the
    counts describe exactly the redactions performed)."""
    from spotify_etl_pipeline_spark.operators.pii import (
        DEFAULT_PII_PATTERNS,
        pii_scrub,
    )

    text = sep.join(frags)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    first = pii_scrub(df, "text").collect()[0].asDict()
    for name, _, token in DEFAULT_PII_PATTERNS:
        assert first[f"n_{name}"] == first["clean_text"].count(token), name
    again = (
        pii_scrub(
            spark.createDataFrame(
                [(1, first["clean_text"])], "doc_id long, text string"
            ),
            "text",
        )
        .collect()[0]
        .asDict()
    )
    assert again["clean_text"] == first["clean_text"]
    for name, _, _ in DEFAULT_PII_PATTERNS:
        assert again[f"n_{name}"] == 0, name


# --- logistic apply: equals the closed-form logit on arbitrary inputs --------
_la_rows = st.lists(
    st.tuples(
        st.floats(-5, 5, allow_nan=False, width=32),
        st.floats(-5, 5, allow_nan=False, width=32),
    ),
    min_size=1, max_size=20,
)
_la_weights = st.tuples(
    st.floats(-2, 2, allow_nan=False, width=32),
    st.floats(-2, 2, allow_nan=False, width=32),
    st.floats(-2, 2, allow_nan=False, width=32),
)


@given(rows=_la_rows, w=_la_weights)
@settings(**_SETTINGS)
def test_logistic_apply_equals_bruteforce(spark, rows, w):
    """The plan-literal scorer reproduces z = w0 + w1*x1 + w2*x2 and
    passed = z >= 0 bit-exactly (plain IEEE mul/add, no exp)."""
    from spotify_etl_pipeline_spark.operators.ml import logistic_apply

    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(rows)],
        "id long, x1 double, x2 double",
    )
    got = {
        r["id"]: (r["z"], r["passed"])
        for r in logistic_apply(df, ["x1", "x2"], list(w)).collect()
    }
    for i, (a, b) in enumerate(rows):
        z = float(w[0]) + float(w[1]) * float(a) + float(w[2]) * float(b)
        assert got[i] == (z, z >= 0.0), i


# --- gopher gates: equals brute force on arbitrary token soups ---------------
_gg_frags = st.lists(
    st.sampled_from([
        "the", "of", "to", "scan", "partition", "a", "x", "yz",
        "scan12", "####", "…", "verylongtokenindeed", "Mixed",
    ]),
    min_size=1, max_size=40,
)


@given(frags=_gg_frags)
@settings(**_SETTINGS)
def test_gopher_gates_equals_bruteforce(spark, frags):
    """Every statistic and gate must equal the straightforward Python
    reference — pinning the integer milli-scale div arithmetic and the
    \\A..\\z alpha anchoring on arbitrary inputs."""
    from spotify_etl_pipeline_spark.operators.text import (
        LANG_PROFILES,
        gopher_gates,
    )

    text = " ".join(frags)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_gates(df, min_words=5).collect()[0].asDict()

    words = text.split(" ")
    n = len(words)
    nc = len(text.replace(" ", ""))
    n_stop = sum(w in LANG_PROFILES["en"] for w in words)
    n_alpha = sum(w.isascii() and w.isalpha() for w in words)
    ns = text.count("#") + text.count("…")
    assert r["n_words"] == n
    assert r["wlen_milli"] == (1000 * nc) // n
    assert r["n_stop"] == n_stop
    assert r["alpha_milli"] == (1000 * n_alpha) // n
    assert r["symbol_milli"] == (1000 * ns) // n
    assert r["pass_words"] == (5 <= n <= 100_000)
    assert r["pass_wlen"] == (3_000 <= r["wlen_milli"] <= 10_000)
    assert r["pass_stop"] == (n_stop >= 2)
    assert r["pass_alpha"] == (r["alpha_milli"] >= 800)
    assert r["pass_symbol"] == (r["symbol_milli"] <= 100)
    assert r["pass_all"] == all(
        r[k] for k in (
            "pass_words", "pass_wlen", "pass_stop", "pass_alpha",
            "pass_symbol",
        )
    )

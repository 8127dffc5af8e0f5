"""Extension operators (SURVEY.md §2.10): dedup, similarity search,
multimodal columns, text analysis, time windows — the LLM-data-pipeline
surface, each designed for 100 TB scale (bounded shuffles, no driver-side
loops, built-ins over UDFs) — plus the operators Spark's DataFrame API
lacks natively: as-of joins, connected components, k-means index building,
and explicit skew salting."""

from .asof import asof_join  # noqa: F401
from .components import connected_components, resolve_duplicates  # noqa: F401
from .dedup import (  # noqa: F401
    embedding_neardup_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    lsh_candidates_incremental,
    minhash_signatures,
    minhash_signatures_hashed,
    ngram_jaccard_pairs,
    simhash,
)
from .kmeans import assign_clusters, kmeans_fit  # noqa: F401
from .similarity import brute_force_topk, ivf_topk  # noqa: F401
from .skew import salted_count_sum, salted_join  # noqa: F401

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
from .curation import benchmark_ngram_hits, mixture_sample  # noqa: F401
from .kmeans import assign_clusters, kmeans_fit  # noqa: F401
from .similarity import (  # noqa: F401
    brute_force_topk,
    int8_topk,
    ivf_probe_routing,
    ivf_topk,
    lsh_ann_candidates,
    lsh_bucketed_ann,
)
from .skew import salted_count_sum, salted_join  # noqa: F401

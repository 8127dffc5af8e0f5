"""Extension operators (SURVEY.md §2.10): dedup, similarity search,
multimodal columns, text analysis, time windows — the LLM-data-pipeline
surface, each designed for 100 TB scale (bounded shuffles, no driver-side
loops, built-ins over UDFs)."""

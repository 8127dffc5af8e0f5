"""Ingestion: REST-paginated extraction semantics + zone IO
(SURVEY.md §2.1 S1-S12)."""

"""The bronze → silver → gold ETL pipeline (SURVEY.md §3.2, §7 Phase 3).

Re-expresses the reference's *specified* transformation/warehouse layer
(transform Lambda had no code; semantics recovered from reference
README.md:42-51,151-171 and the directory layout) as declarative Spark:

bronze: raw playlist JSON documents (explicit schema, multiLine)
silver: normalized albums / artists / songs (explode, dedup, null handling)
gold:   star schema parquet with lineage columns + incremental upsert
"""

from .normalize import normalize_documents, read_bronze  # noqa: F401
from .star import build_gold, write_gold  # noqa: F401

"""Python UDTF (Spark 4 user-defined table function) — API-surface demo.

The reference exposes no user-extensible functions (SURVEY.md §2.9) and
this engine's hot paths are built-ins on principle; the UDTF exists to
prove the extension point works end-to-end (registration, lateral join,
1:N row fan-out from Python). The test asserts it produces EXACTLY the
rows of the equivalent built-in explode pipeline — and the docstring is
the reminder that in production you ship the built-in version: a Python
UDTF pays per-row Python evaluation, the explode stays in codegen.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_words int")
class ChunkDocument:
    """Split a document's text into fixed-size word chunks (the LLM
    context-window chunking shape): one input document → N chunk rows."""

    def eval(self, text: str, chunk_words: int):  # noqa: D102
        if text is None:
            return
        words = text.split(" ")
        for i in range(0, len(words), chunk_words):
            piece = words[i : i + chunk_words]
            yield i // chunk_words, " ".join(piece), len(piece)


def register_udtfs(spark) -> None:
    """Make the UDTF callable from SQL (``SELECT ... FROM chunk_document(...)``)."""
    spark.udtf.register("chunk_document", ChunkDocument)

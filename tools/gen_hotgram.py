"""Planted hot-gram tile for the substring tier's skew test (SCALE.md).

Builds a documents.parquet where ONE 10-token boilerplate gram appears
verbatim in 50% of documents (prepended), the exact adversary for the
cross-doc duplicated-window test: under the old Window.partitionBy(hash)
min/max plan every occurrence of that gram's key lands in ONE task; the
partial-aggregating groupBy collapses them map-side. Document bodies are
otherwise unique (deterministic counter words), so the hot gram is the
only cross-doc duplication and the measured cost isolates the skew path.

Usage::

    python tools/gen_hotgram.py 500000   # -> /tmp/sparkgraft_scale/hotgram
    python tools/gen_hotgram.py 2000000 /tmp/sparkgraft_scale/hotgram2m
"""
import os
import sys

import duckdb

OUT = "/tmp/sparkgraft_scale/hotgram"
HOT = " ".join(f"boiler{i}" for i in range(10))  # one 10-token gram


def main(n_docs: int, out: str = OUT) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # body: 30 unique tokens per doc (u<doc>_<i>) so nothing else repeats
    con.execute(
        f"""
        COPY (
          SELECT i AS doc_id,
                 'en' AS lang,
                 'synthetic' AS source,
                 CASE WHEN i % 2 = 0
                      THEN '{HOT}' || ' ' || body
                      ELSE body END AS text
          FROM (
            SELECT i,
                   array_to_string(list_transform(range(30),
                       j -> 'u' || i || '_' || j), ' ') AS body
            FROM range({n_docs}) t(i)
          )
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    print(f"wrote {out}/documents.parquet n_docs={n_docs} "
          f"hot gram in {n_docs // 2} docs")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 500_000,
        sys.argv[2] if len(sys.argv) > 2 else OUT,
    )

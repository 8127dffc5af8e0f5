"""Documents-only scale tile for the end-to-end corpus capstone.

gen_scale.py replicates text VERBATIM, which is the right adversary for
the dedup tier but degenerate for the COMPOSED chain: every 10-token
window becomes cross-doc duplicated, the substring stage cuts all long
documents to '', and curate_encode_pack (correctly) refuses on the
empty train split — tested in tests/test_endtoend.py.  This generator
builds the organic-ish variant: N replicas with doc_id offsets where
every 9th token of replica r > 0 gets an alphabetic ``r``-derived
suffix, so NO 10-token window survives verbatim across replicas
(9 < SPAN_MIN_LEN = 10) while the cut stage does real,
non-annihilating work.

Honest accounting of what the tile exercises (code-review r12):

- **Cross-doc duplicate mass**: replica 0 keeps ALL of the source
  tile's organic duplicate spans; in replica r > 0 the per-doc-position
  suffixing preserves a shared span only when the two copies' offsets
  are congruent mod 9 (~1/9 of pairs).  Total pairwise duplicate mass
  is therefore ≈ source × (1 + (N-1)/9), growing ~N/9 — real,
  non-annihilating cut work, but NOT the full N× a verbatim tile
  would (and could not, see above) provide.
- **BPE vocabulary**: suffixes are strictly [a-z] (base-26 letters of
  r), so every suffixed token passes the BPE tier's ``\\A[a-z]+\\z``
  trainable-word filter and the vocabulary honestly grows ~N× in word
  TYPES.  (An earlier revision used digit suffixes, which the filter
  silently dropped — the tail then under-measured.)

Usage::

    python tools/gen_e2e_scale.py 100            # -> /tmp/sparkgraft_scale/e2e_sf10
    python tools/gen_e2e_scale.py 10 e2e_sf1
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1/documents.parquet"
OUT_ROOT = "/tmp/sparkgraft_scale"


def generate(n_replicas: int, out_name: str) -> str:
    out = os.path.join(OUT_ROOT, out_name)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    stride = con.execute(f"SELECT max(doc_id) + 1 FROM '{SRC}'").fetchone()[0]
    # text is defined ONCE in the inner query; n_chars derives from it
    # (a duplicated transform expression desynchronizes the two on any
    # future edit — code-review r12)
    con.execute(
        f"""
        COPY (
          SELECT doc_id, text, lang, source,
                 length(text)::BIGINT AS n_chars
          FROM (
            SELECT (doc_id + r.r * {stride})::BIGINT AS doc_id,
                   CASE WHEN r.r = 0 THEN text
                        ELSE array_to_string(
                          list_transform(string_split(text, ' '),
                            (x, i) -> CASE WHEN i % 9 = 0
                                      THEN x || 'r'
                                           || chr((97 + (r.r % 26))::INTEGER)
                                           || chr((97 + ((r.r // 26) % 26))::INTEGER)
                                      ELSE x END),
                          ' ')
                   END AS text,
                   lang, source
            FROM '{SRC}', range({n_replicas}) AS r(r)
          )
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    name = sys.argv[2] if len(sys.argv) > 2 else f"e2e_sf{n / 10:g}"
    path = generate(n, name)
    con = duckdb.connect()
    print(
        con.execute(
            f"SELECT count(*), count(DISTINCT doc_id) FROM '{path}/documents.parquet'"
        ).fetchall()
    )
    print(path)

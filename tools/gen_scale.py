"""Tile the driver fixtures to larger scale factors for stress benches.

Replicates ``/root/testdata/sf0.1`` N times with per-replica key offsets
so referential integrity holds (orders.o_custkey still hits a customer
row, lineitem's three FKs still resolve, events keep per-user session
shape). Fixed-cardinality dims (region=5, nation=25) are copied as-is —
exactly how TPC-H itself scales. Document text repeats verbatim across
replicas, which turns each doc into an exact-duplicate cluster of size N
— a *heavier* (not lighter) load for the dedup tier than organic data.

This data is for SCALE.md stress evidence only; correctness runs stay on
the driver-generated fixtures. Usage::

    python tools/gen_scale.py 10            # -> /tmp/sparkgraft_scale/sf1.0
    python tools/gen_scale.py 100 sf10      # -> /tmp/sparkgraft_scale/sf10
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT_ROOT = "/tmp/sparkgraft_scale"

# table -> columns that must be offset per replica, keyed by the stride
# family they draw ids from (so FKs shift in lockstep with their PK).
KEYS = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
STRIDE_SRC = {
    "cust": ("customer", "c_custkey"),
    "order": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supp": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
COPY_AS_IS = ["region", "nation"]


def generate(n_replicas: int, out_name: str) -> str:
    out = os.path.join(OUT_ROOT, out_name)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    strides = {
        fam: con.execute(
            f"SELECT max({col}) + 1 FROM '{SRC}/{tbl}.parquet'"
        ).fetchone()[0]
        for fam, (tbl, col) in STRIDE_SRC.items()
    }
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keycols in KEYS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        proj = ", ".join(
            f"({c} + r.r * {strides[keycols[c]]})::BIGINT AS {c}"
            if c in keycols
            else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {proj} FROM '{SRC}/{t}.parquet', "
            f"range({n_replicas}) AS r(r)) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    name = sys.argv[2] if len(sys.argv) > 2 else f"sf{n / 10:g}"
    path = generate(n, name)
    con = duckdb.connect()
    for t in COPY_AS_IS + list(KEYS):
        cnt = con.execute(
            f"SELECT count(*) FROM '{path}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {cnt}")
    print(path)

#!/usr/bin/env python3
"""Build an honest re-keyed Nx corpus for scale probes (dev tool only).

The file-duplicated /tmp/sf10x corpus duplicates KEYS, so any row-level
key join fans quadratically (k copies of a key on each side -> k^2 join
rows) -- a clone artifact, not a property of real growth. This tool
instead offsets every entity key by copy-index * STRIDE so copy i is a
disjoint "shard" of new orders / customers / parts / suppliers / docs:
joins stay 1:1-per-copy and growth is genuinely linear, which is what a
10x-bigger production corpus looks like. nation/region stay 1x (real
dimensions don't grow with the fact tables); events keep their ts but
re-key user_id/event_id; documents/embeddings re-key doc_id/vec_id.

Usage: python3 tools/make_scaled.py <srcSfDir> <outDir> [N=10]
"""
import sys

import duckdb

STRIDE = 100_000_000

KEYED = {
    "orders":    ["o_orderkey", "o_custkey"],
    "lineitem":  ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer":  ["c_custkey"],
    "supplier":  ["s_suppkey"],
    "part":      ["p_partkey"],
    "events":    ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STATIC = ["region", "nation"]


def main(src: str, out: str, n: int) -> None:
    con = duckdb.connect()
    import os
    os.makedirs(out, exist_ok=True)
    for t in STATIC:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    for t, keys in KEYED.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')").fetchall()]
        # the disjoint-shard guarantee REQUIRES every source key < STRIDE:
        # a key >= STRIDE would collide with copy i+1's keyspace and
        # silently reintroduce the k^2 clone artifact this tool exists to
        # avoid -- fail loudly instead (raise STRIDE for larger-SF sources)
        for c in keys:
            mx = con.execute(
                f"SELECT max({c}) FROM read_parquet('{src}/{t}.parquet')"
            ).fetchone()[0]
            assert mx is None or mx < STRIDE, (
                f"{t}.{c} max={mx} >= STRIDE={STRIDE}: cross-copy key "
                "collision would break the disjoint-shard guarantee")
        sel = ", ".join(
            f"{c} + i * {STRIDE} AS {c}" if c in keys else c for c in cols)
        # small row groups so Spark's scan can actually split the file:
        # the driver fixtures are single-row-group, which serializes every
        # map stage locally -- a probe corpus must not replicate that
        # layout artifact (real corpora arrive as many files/row groups)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'), "
            f"range({n}) r(i)) TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE "
            f"{2048 if t in ('documents', 'embeddings') else 16384})")
        print(t, con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0])


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)

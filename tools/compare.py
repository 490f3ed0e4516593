#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only, not
part of the Scala library): run each oracle SQL in DuckDB against the same
parquet fixtures, compare to the Verify.scala parquet dumps.

Compare method mirrors the driver contract: sort columns by name, sort rows,
then compare cell values exactly.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    for name, sql in sorted(oracle.items()):
        # an oracle entry with NO parquet dir means the query CRASHED
        # during the Verify dump (Verify deletes the stale dir first and
        # keeps the entry precisely so the crash fails the compare loudly
        # instead of vanishing) — fail it without paying the oracle SQL
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"FAIL {name}: no parquet dump (query crashed in Verify)")
            n_fail += 1
            continue
        try:
            exp = norm(con.execute(sql).fetchdf())
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
                n_fail += 1
                continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
                n_fail += 1
                continue
            # dtype compare first — the driver's hash is dtype-sensitive
            # (DuckDB HUGEINT sums surface as float64 vs Spark int64)
            dt_bad = [(c, str(exp[c].dtype), str(got[c].dtype))
                      for c in exp.columns
                      if str(exp[c].dtype) != str(got[c].dtype)]
            if dt_bad:
                c, e, g = dt_bad[0]
                print(f"FAIL {name}: dtype col {c}: oracle={e} spark={g}")
                n_fail += 1
                continue
            # exact cell compare via python objects
            mismatch = None
            for c in exp.columns:
                ev, gv = exp[c].tolist(), got[c].tolist()
                if ev != gv:
                    bad = next(i for i in range(len(ev)) if ev[i] != gv[i])
                    mismatch = (c, bad, ev[bad], gv[bad])
                    break
            if mismatch:
                c, i, e, g = mismatch
                print(f"FAIL {name}: col {c} row {i}: oracle={e!r} spark={g!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(exp)} rows)")
                n_pass += 1
        except Exception as ex:
            print(f"ERROR {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
    # rows-only queries (no oracle): report row counts
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = con.execute(
                    f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
                print(f"ROWS-ONLY {name}: {n} rows")
            except Exception as ex:
                print(f"ERROR {name} (rows-only): {ex}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 check (dev tool, not library code).

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
<sfDir> parquet tables and compares against the Spark parquet output in
<outDir>/<name>/ — columns sorted by name, values compared exactly
(mimics the driver's hash compare).

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} "
                  f"oracle={list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"ROWS     {name}: spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        got = got.reset_index(drop=True)
        want = want.reset_index(drop=True)
        def canon(s):
            # list-valued columns come back as numpy arrays / lists; make
            # them hashable+comparable
            if s.dtype == object:
                return s.map(lambda v: tuple(v.tolist()) if hasattr(v, "tolist")
                             else (tuple(v) if isinstance(v, list) else v))
            return s
        bad = None
        for c in got.columns:
            a, b = canon(got[c]), canon(want[c])
            try:
                if str(a.dtype) != str(b.dtype):
                    bad = f"dtype[{c}]: {a.dtype} vs {b.dtype}"
                    break
                if not a.equals(b):
                    neq = (a != b) & ~(a.isna() & b.isna())
                    i = neq.idxmax()
                    bad = f"value[{c}] row {i}: {a[i]!r} vs {b[i]!r} ({int(neq.sum())} diffs)"
                    break
            except Exception as e:
                bad = f"compare[{c}]: {e}"
                break
        if bad:
            print(f"VALUE    {name}: {bad}")
            n_fail += 1
        else:
            print(f"OK       {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

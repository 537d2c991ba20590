#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 check (dev tool, not library code).

Replicates the driver comparator EXACTLY (VERDICT r1 item 4): columns
sorted by name, rows re-sorted with pandas sort_values over all columns
(this is the step that raises TypeError on array-typed cells — that
failure mode must reproduce locally), then a row/schema/hash compare of
the sorted frames.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob
import duckdb
import pandas as pd

# The spark side is read with pandas/pyarrow (NOT duckdb read_parquet):
# duckdb collapses decimal128 columns to float64 on read, which hides
# representation divergences the driver sees (CORRECTNESS_r02 caught
# agg_decimal/win_range_frame failing in the driver while a duckdb-read
# pre-flight passed: Decimal('132710.30') vs float-repr '132710.3').

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def driver_canon(df):
    """The driver's canonical form: name-sorted columns, then sort_values
    over every column. Raises on unhashable (array) cells, as the driver
    does — do NOT pre-stringify here, or the pre-flight green-lights
    queries the driver will ERR on."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def frame_hash(df):
    return pd.util.hash_pandas_object(df, index=False).sum()


def frame_hash_str(df):
    """Second hash model: every cell via str(). pandas hashes object
    columns by str-form anyway; this extends that to ALL columns so a
    float64-vs-object dtype split between the two frames (possible in the
    driver depending on its read path) is also exercised. A query is only
    OK if BOTH models match."""
    return pd.util.hash_pandas_object(
        df.astype(str), index=False).sum()


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
            got = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        try:
            got = driver_canon(got)
            want = driver_canon(want)
        except Exception as e:
            print(f"ERR      {name}: comparator failed: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} "
                  f"oracle={list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"ROWS     {name}: spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        try:
            hashes_match = (frame_hash(got) == frame_hash(want)
                            and frame_hash_str(got) == frame_hash_str(want))
        except Exception as e:
            print(f"ERR      {name}: hash failed: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if not hashes_match:
            # diagnostic detail (not part of the driver check): first cell diff
            bad = "hash mismatch"
            for c in got.columns:
                a, b = got[c], want[c]
                try:
                    neq = ~((a == b) | (a.isna() & b.isna()))
                except Exception:
                    continue
                if neq.any():
                    i = neq.idxmax()
                    bad = (f"value[{c}] row {i}: {a[i]!r} vs {b[i]!r} "
                           f"({int(neq.sum())} diffs)")
                    break
            print(f"VALUE    {name}: {bad}")
            n_fail += 1
        else:
            print(f"OK       {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

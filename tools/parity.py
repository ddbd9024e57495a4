#!/usr/bin/env python3
"""Dev-only parity checker mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]

Loads oracle_sql.json from the verify out dir, registers the test
tables as DuckDB views, runs each oracle, and compares against the
parquet the Spark side dumped (columns sorted by name, rows sorted by
all columns). NOT part of the shipped library.
"""
import json
import sys

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last",
                            kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        want, got = normalize(want), normalize(got)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} "
                  f"got={list(got.columns)}")
            failures += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            failures += 1
            continue
        mismatch = []
        for c in want.columns:
            a, b = want[c], got[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                bad = (~eq).idxmax()
                mismatch.append((c, a[bad], b[bad]))
        if mismatch:
            print(f"FAIL {name}: {len(mismatch)} mismatching col(s):")
            for c, a, b in mismatch[:3]:
                print(f"    {c}: want={a!r} got={b!r}")
            failures += 1
        else:
            dtypes = all(str(want[c].dtype) == str(got[c].dtype)
                         for c in want.columns)
            note = "" if dtypes else "  [dtype diff: " + ", ".join(
                f"{c}:{want[c].dtype}->{got[c].dtype}"
                for c in want.columns
                if str(want[c].dtype) != str(got[c].dtype)) + "]"
            print(f"OK   {name}: {len(want)} rows{note}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify output
parquet against DuckDB running SparkEntry.oracleSql on the same tables.

Usage: python3 scripts/check.py [sfDir] [outDir]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.reset_index(drop=True)


def main() -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    # optional 3rd arg: comma-separated query filter (big-SF spot runs)
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            want = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if got.dtypes.tolist() != want.dtypes.tolist():
            print(f"WARN {name}: dtypes {got.dtypes.tolist()} vs {want.dtypes.tolist()}")
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        neq = None
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f":
                bad = ~((a == b) | (a.isna() & b.isna())
                        | (a.apply(lambda x: isinstance(x, float) and math.isnan(x))
                           & b.apply(lambda x: isinstance(x, float) and math.isnan(x))))
            else:
                bad = ~((a == b) | (a.isna() & b.isna()))
            if bad.any():
                i = bad.idxmax()
                neq = (c, i, a[i], b[i], int(bad.sum()))
                break
        if neq:
            c, i, av, bv, nb = neq
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} oracle={bv!r} ({nb} cells differ)")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

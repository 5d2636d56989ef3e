#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Reads each SparkEntry query result from <outDir>/<name>/ (parquet written by
graft.Verify), runs the matching oracle SQL from <outDir>/oracle_sql.json in
DuckDB against the same testdata parquet, sorts columns by name, and compares
row count, dtypes and a per-value hash — approximating CORRECTNESS_r{N}.json.

Usage: check_oracle.py <sfDir> <outDir>
"""
import glob
import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        for v in row:
            if isinstance(v, float):
                h.update(repr(v).encode())
            else:
                h.update(str(v).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        try:
            got = pd.concat(
                [pd.read_parquet(p) for p in sorted(glob.glob(d + "/*.parquet"))],
                ignore_index=True)
        except Exception as e:
            results[name] = f"READ-FAIL {e}"
            continue
        if name not in oracles:
            results[name] = f"rows-only rows={len(got)}"
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {type(e).__name__} {e}"
            continue
        got_c, exp_c = canon(got), canon(exp)
        problems = []
        if list(got_c.columns) != list(exp_c.columns):
            problems.append(f"cols spark={list(got_c.columns)} duck={list(exp_c.columns)}")
        if len(got_c) != len(exp_c):
            problems.append(f"rows spark={len(got_c)} duck={len(exp_c)}")
        if not problems:
            gh, eh = value_hash(got_c), value_hash(exp_c)
            if gh != eh:
                problems.append("HASH-MISMATCH")
                # show first differing cell for debugging
                for i in range(len(got_c)):
                    for c in got_c.columns:
                        a, b = got_c.iloc[i][c], exp_c.iloc[i][c]
                        sa = repr(a) if isinstance(a, float) else str(a)
                        sb = repr(b) if isinstance(b, float) else str(b)
                        if sa != sb:
                            problems.append(f"first-diff row {i} col {c}: spark={sa} duck={sb}")
                            break
                    if len(problems) > 1:
                        break
        results[name] = "OK rows=%d" % len(got_c) if not problems else "FAIL " + "; ".join(problems)

    for k in sorted(oracles):
        if k not in results:
            results[k] = "MISSING-RESULT"
    fails = 0
    for k in sorted(results):
        status = results[k]
        if not status.startswith(("OK", "rows-only")):
            fails += 1
        print(f"{k:32s} {status}")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

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
import time

# Soft per-oracle runtime ceiling (seconds). A slow DuckDB oracle silently
# eats the driver's session budget (round 12: one 69.6 s recursive-CTE
# oracle was ~40% of a whole-gate pass and the driver artifact came back
# empty) — so every oracle's wall time is printed and anything over the
# ceiling is flagged SLOW-ORACLE. SLOW does not fail the gate (the values
# still match) but it must be fixed before the next round.
ORACLE_SOFT_CEILING_SEC = 5.0

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
    oracle_secs = {}
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
            if os.environ.get("ORACLE_VERBOSE"):
                print(f"... running {name}", flush=True)
            t0 = time.time()
            exp = con.sql(oracles[name]).df()
            oracle_sec = time.time() - t0
        except Exception as e:
            results[name] = f"ORACLE-FAIL {type(e).__name__} {e}"
            continue
        oracle_secs[name] = oracle_sec
        if oracle_sec > ORACLE_SOFT_CEILING_SEC:
            print(f"... {name}: oracle took {oracle_sec:.1f}s (SLOW)",
                  flush=True)
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
    slow = []
    for k in sorted(results):
        status = results[k]
        if not status.startswith(("OK", "rows-only")):
            fails += 1
        sec = oracle_secs.get(k)
        tick = "" if sec is None else f" oracle={sec:6.2f}s"
        if sec is not None and sec > ORACLE_SOFT_CEILING_SEC:
            tick += " SLOW-ORACLE"
            slow.append((sec, k))
        print(f"{k:32s} {status}{tick}")
    total_oracle = sum(oracle_secs.values())
    print(f"\n{len(results) - fails}/{len(results)} pass; "
          f"oracle wall total {total_oracle:.1f}s over {len(oracle_secs)} oracles")
    if slow:
        # lines must NOT start with a query name: correctness_artifact.py
        # parses "qNNN <status>" lines and a bare name here would overwrite
        # the real status
        print(f"SLOW oracles (> {ORACLE_SOFT_CEILING_SEC:.0f}s soft ceiling):")
        for sec, k in sorted(slow, reverse=True):
            print(f"  slow: {k:32s} {sec:6.2f}s")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

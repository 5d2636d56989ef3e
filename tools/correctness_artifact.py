#!/usr/bin/env python3
"""Run check_oracle's compare and emit a JSON artifact.

Same compare as check_oracle.py (DuckDB oracle vs Verify's parquet, columns
sorted by name, per-value hash), but writes a machine-readable JSON file —
used for the scale-tier correctness artifact (CORRECTNESS_sf0.1.json), which
guards the integer-width/overflow bug class that sf0.01 cannot surface
(VERDICT r9 #4).

Usage: correctness_artifact.py <sfDir> <outDir> <artifact.json> [sf_label]
"""
import json
import subprocess
import sys


def main(sf_dir, out_dir, artifact, label):
    proc = subprocess.run(
        [sys.executable, "tools/check_oracle.py", sf_dir, out_dir],
        capture_output=True, text=True)
    if proc.returncode not in (0, 1):
        # check_oracle exits 0 (all pass) or 1 (some mismatch); anything else
        # is a crash — fail loudly instead of emitting an empty artifact
        sys.stderr.write(proc.stderr)
        print(f"check_oracle.py crashed (exit {proc.returncode}); no artifact written")
        return 2
    queries = {}
    for line in proc.stdout.splitlines():
        parts = line.split(None, 1)
        if len(parts) == 2 and parts[0].startswith("q"):
            # a subset Verify run leaves the other queries MISSING-RESULT;
            # the artifact records only what actually ran
            if parts[1] != "MISSING-RESULT":
                queries[parts[0]] = parts[1]
    if not queries:
        sys.stderr.write(proc.stderr)
        print("check_oracle.py produced no query lines; no artifact written")
        return 2
    npass = sum(1 for v in queries.values()
                if v.startswith(("OK", "rows-only")))
    out = {
        "sf": label,
        "sf_dir": sf_dir,
        "pass": npass,
        "total": len(queries),
        "queries": dict(sorted(queries.items())),
    }
    with open(artifact, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{npass}/{len(queries)} pass -> {artifact}")
    return 0 if npass == len(queries) else 1


if __name__ == "__main__":
    label = sys.argv[4] if len(sys.argv) > 4 else sys.argv[1].rstrip("/").split("/")[-1]
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], label))

#!/usr/bin/env python3
"""Diff two graft bench JSON artifacts (the one-line format graft.Bench
emits): per-query deltas sorted by absolute regression, plus tier and
total movement. Usage:

    python3 tools/bench_diff.py OLD.json NEW.json [--ratio 1.25] [--min 0.5]

Queries only in one file are listed separately so added/removed suite
entries don't read as regressions.
"""
import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.25,
                    help="flag queries slower than old*ratio")
    ap.add_argument("--min", dest="min_sec", type=float, default=0.5,
                    help="ignore queries faster than this in NEW")
    args = ap.parse_args()

    old = json.load(open(args.old))
    new = json.load(open(args.new))
    oq, nq = old["queries"], new["queries"]

    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    print(f"total: {old['value']:.1f}s/{len(oq)}q -> "
          f"{new['value']:.1f}s/{len(nq)}q")
    for tier in sorted(set(old.get("tiers", {})) | set(new.get("tiers", {}))):
        print(f"tier {tier}: {old.get('tiers', {}).get(tier, 0):.1f} -> "
              f"{new.get('tiers', {}).get(tier, 0):.1f}")
    ssum_o = sum(oq[k] for k in shared)
    ssum_n = sum(nq[k] for k in shared)
    print(f"shared {len(shared)}q: {ssum_o:.1f}s -> {ssum_n:.1f}s")

    regress = [(k, oq[k], nq[k]) for k in shared
               if nq[k] > oq[k] * args.ratio and nq[k] >= args.min_sec]
    improve = [(k, oq[k], nq[k]) for k in shared
               if nq[k] < oq[k] / args.ratio and oq[k] >= args.min_sec]
    if regress:
        print(f"\nregressions (> {args.ratio}x):")
        for k, o, n in sorted(regress, key=lambda x: -(x[2] - x[1])):
            print(f"  {o:8.2f} -> {n:8.2f}  {k}")
    if improve:
        print(f"\nimprovements (> {args.ratio}x):")
        for k, o, n in sorted(improve, key=lambda x: -(x[1] - x[2])):
            print(f"  {o:8.2f} -> {n:8.2f}  {k}")
    if added:
        print("\nnew queries: " +
              ", ".join(f"{k}={nq[k]:.2f}s" for k in added))
    if removed:
        print("\nremoved queries: " + ", ".join(removed))
    if new.get("failed"):
        print(f"\nFAILED in new run: {new['failed']}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

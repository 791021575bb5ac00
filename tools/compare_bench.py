#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 vs sf1) and report per-query
scaling: ratio = t_big / t_small against the data multiple. Emits the
super-linear list (ratio > mult) the scale-evidence doc needs.

Usage: compare_bench.py <small.json> <big.json> <mult>
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    small, big, mult = load(sys.argv[1]), load(sys.argv[2]), float(sys.argv[3])
    qs, qb = small["queries"], big["queries"]
    common = sorted(set(qs) & set(qb))
    rows = []
    for q in common:
        a, b = qs[q], qb[q]
        rows.append((q, a, b, b / a if a > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    total_s = sum(qs[q] for q in common)
    total_b = sum(qb[q] for q in common)
    print(f"common queries: {len(common)}  total {total_s:.1f}s -> "
          f"{total_b:.1f}s  aggregate ratio {total_b / total_s:.2f}x "
          f"(data {mult:.0f}x)")
    # ignore sub-second-small queries when flagging: fixed overhead
    # dominates them and the ratio is noise
    over = [r for r in rows if r[3] > mult and r[2] > 1.0]
    print(f"\nsuper-linear (ratio > {mult:.0f}x and big-side > 1s): {len(over)}")
    for q, a, b, r in over:
        print(f"  {q:40s} {a:7.2f}s -> {b:8.2f}s  {r:6.1f}x")
    print("\ntop 15 by big-side wall time:")
    for q, a, b, r in sorted(rows, key=lambda r: -r[2])[:15]:
        print(f"  {q:40s} {a:7.2f}s -> {b:8.2f}s  {r:6.1f}x")
    ok = big.get("ok", {})
    failed = [q for q, v in ok.items() if not v]
    print(f"\nall_ok={big.get('all_ok')}  failed={failed}")


if __name__ == "__main__":
    main()

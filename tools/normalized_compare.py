#!/usr/bin/env python3
"""Normalized cross-round bench comparison (r14 verdict item 3).

Raw per-query ratios between rounds are polluted by ambient container
drift (documented ±20%; r13 measured 1.21x median on untouched queries).
Since r14 every board carries CALIBRATION ANCHORS — cal_cpu (pure
compute), cal_scan (parquet scan+agg), cal_shuffle (hash exchange) —
measured through the identical harness/protocol. This tool divides each
per-query ratio by the anchor drift, so a reported regression is code,
not weather.

Drift factor = geometric mean of the three anchor ratios (each anchor
isolates a different cost class; the geomean is the scalar that
minimizes log-space error when a query mixes them).

Usage: normalized_compare.py <old_board.json> <new_board.json> [gate]
  gate (default 1.2): flag queries with NORMALIZED ratio > gate and
  new-side wall > 1s (sub-second rows are fixed-overhead noise).
When both boards carry `spread_sec` (median-of-N protocol), a row is
only flagged if its delta ALSO exceeds both rounds' max-min spreads —
a delta inside the query's own trial-to-trial jitter is weather, not
regression (the r15 finding: all 17 ratio-flagged rows sat inside
their spreads and isolated re-runs landed between the two boards).
Exit 1 if any flagged — usable as the round's normalized perf gate.
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    gate = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    co, cn = old.get("calibration"), new.get("calibration")
    if not co or not cn:
        raise SystemExit("both boards must carry a calibration block "
                         "(anchors shipped in r14+ boards)")
    anchors = sorted(set(co) & set(cn))
    ratios = {a: cn[a] / co[a] for a in anchors}
    drift = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    print(f"anchors: " + "  ".join(
        f"{a} {co[a]:.3f}s->{cn[a]:.3f}s ({ratios[a]:.2f}x)" for a in anchors))
    print(f"ambient drift factor (geomean): {drift:.3f}x — ratios below are "
          f"divided by it\n")

    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    rows = []
    for q in common:
        raw = qn[q] / qo[q] if qo[q] > 0 else float("inf")
        rows.append((q, qo[q], qn[q], raw, raw / drift))
    tot_o = sum(qo[q] for q in common)
    tot_n = sum(qn[q] for q in common)
    agg = tot_n / tot_o
    print(f"common queries: {len(common)}  total {tot_o:.1f}s -> {tot_n:.1f}s"
          f"  aggregate raw {agg:.2f}x  normalized {agg / drift:.2f}x")
    med = sorted(r[4] for r in rows)[len(rows) // 2]
    print(f"median normalized per-query ratio: {med:.2f}x\n")

    so, sn = old.get("spread_sec", {}), new.get("spread_sec", {})
    have_spread = bool(so) and bool(sn)

    def beyond_spread(q, a, b):
        if not have_spread:
            return True
        return abs(b - a) > max(so.get(q, 0.0), sn.get(q, 0.0))

    candidates = [r for r in rows if r[4] > gate and r[2] > 1.0]
    flagged = [r for r in candidates if beyond_spread(r[0], r[1], r[2])]
    jitter = [r for r in candidates if not beyond_spread(r[0], r[1], r[2])]
    print(f"NORMALIZED regressions (> {gate:.2f}x, new-side > 1s"
          + (", delta beyond both spreads" if have_spread else "")
          + f"): {len(flagged)}")
    for q, a, b, raw, norm in sorted(flagged, key=lambda r: -r[4]):
        print(f"  {q:40s} {a:7.2f}s -> {b:7.2f}s  raw {raw:5.2f}x  "
              f"norm {norm:5.2f}x  (spread old {so.get(q, 0):.2f} "
              f"new {sn.get(q, 0):.2f})" if have_spread else
              f"  {q:40s} {a:7.2f}s -> {b:7.2f}s  raw {raw:5.2f}x  "
              f"norm {norm:5.2f}x")
    if jitter:
        print(f"ratio-flagged but inside per-query spread (weather, not "
              f"gated): {len(jitter)}")
        for q, a, b, raw, norm in sorted(jitter, key=lambda r: -r[4]):
            print(f"  {q:40s} {a:7.2f}s -> {b:7.2f}s  norm {norm:5.2f}x  "
                  f"(spread old {so.get(q, 0):.2f} new {sn.get(q, 0):.2f})")
    improved = [r for r in rows if r[4] < 1 / gate and r[1] > 1.0]
    print(f"\nnormalized improvements (< {1/gate:.2f}x, old-side > 1s): "
          f"{len(improved)}")
    for q, a, b, raw, norm in sorted(improved, key=lambda r: r[4])[:15]:
        print(f"  {q:40s} {a:7.2f}s -> {b:7.2f}s  raw {raw:5.2f}x  "
              f"norm {norm:5.2f}x")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()

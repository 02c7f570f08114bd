#!/usr/bin/env python3
"""Per-query scaling exponents from two bench.json files a decade apart.

For each query: alpha_time = log10(t_hi / t_lo), alpha_shuffle =
log10(max(b_hi,1) / max(b_lo,1)) — 1.0 = data-linear across a 10x decade,
<1 sublinear, >1 superlinear. Wall-time exponents at small SFs are
understated by fixed per-query overhead (~0.1 s scheduler/JIT floor), so
the shuffle exponent is the plan-shape signal and the time exponent the
wall-clock signal; both are reported.

Usage: scaling_exponents.py lo.json hi.json [threshold]
Prints a markdown table of queries whose time exponent exceeds the
threshold (default 1.3), plus summary stats.
"""
import json
import math
import sys

lo_path, hi_path = sys.argv[1], sys.argv[2]
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
lo = json.load(open(lo_path))
hi = json.load(open(hi_path))

qs = sorted(set(lo["queries"]) & set(hi["queries"]))
rows = []
for q in qs:
    tl, th = lo["queries"][q], hi["queries"][q]
    if tl <= 0 or th <= 0:
        continue
    at = math.log10(th / tl)
    bl = max(lo.get("shuffle_read_bytes", {}).get(q, 0), 1)
    bh = max(hi.get("shuffle_read_bytes", {}).get(q, 0), 1)
    ab = math.log10(bh / bl)
    rows.append((q, tl, th, at, ab))

rows.sort(key=lambda r: -r[3])
print(f"# scaling exponents {lo['sf']} -> {hi['sf']} ({len(rows)} queries)")
print(f"total: {lo['value']:.1f}s -> {hi['value']:.1f}s "
      f"(alpha={math.log10(hi['value']/lo['value']):.2f})")
ats = sorted(r[3] for r in rows)
abs_ = sorted(r[4] for r in rows)
print(f"time exponent: median {ats[len(ats)//2]:.2f}, "
      f"p90 {ats[int(len(ats)*0.9)]:.2f}, max {ats[-1]:.2f}")
print(f"shuffle exponent: median {abs_[len(abs_)//2]:.2f}, "
      f"p90 {abs_[int(len(abs_)*0.9)]:.2f}, max {abs_[-1]:.2f}")
print()
print(f"## queries with time exponent > {thresh}")
print("| query | t_lo s | t_hi s | alpha_time | alpha_shuffle |")
print("|---|---|---|---|---|")
for q, tl, th, at, ab in rows:
    if at > thresh:
        print(f"| {q} | {tl:.2f} | {th:.2f} | {at:.2f} | {ab:.2f} |")

#!/usr/bin/env python3
"""Per-key repeatability check between two bench artifacts (round-8 verdict
task #2's done-criterion: two consecutive runs must agree within 1.5x on
every key >= 0.3 s).

Usage: python3 tools/bench_agree.py <bench_a.json> <bench_b.json> [cutoff]

Compares ANCHOR-NORMALIZED per-key values when both artifacts carry
`queries_norm` (raw values inherit whole-box drift that normalization
removes); falls back to raw `queries` otherwise. Exits 1 if any key at or
above the cutoff in EITHER run disagrees by more than 1.5x.
"""
import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
cutoff = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
field = "queries_norm" if "queries_norm" in a and "queries_norm" in b else "queries"
qa, qb = a[field], b[field]
bad = []
checked = 0
for k in sorted(set(qa) & set(qb)):
    ta, tb = qa[k], qb[k]
    if ta < 0 or tb < 0:
        bad.append((k, ta, tb, float("inf")))
        continue
    if max(ta, tb) < cutoff:
        continue
    checked += 1
    ratio = max(ta, tb) / max(min(ta, tb), 1e-9)
    if ratio > 1.5:
        bad.append((k, ta, tb, ratio))
for k, ta, tb, r in sorted(bad, key=lambda x: -x[3]):
    print(f"DISAGREE {k}: {ta:.3f} vs {tb:.3f} ({r:.2f}x)")
print(f"== field={field} cutoff={cutoff}s: {checked} keys checked, "
      f"{len(bad)} disagree ==")
sys.exit(1 if bad else 0)

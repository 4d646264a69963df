#!/usr/bin/env python3
"""Combine two subset bench runs a decade apart into BENCH_sf1.json.

Usage: python3 tools/scale_exponents.py <sf0.1_json> <sf1_json> [out_json]

For each shared key: exponent = log10(t_sf1 / t_sf0.1). 1.0 = data-linear,
<1 = dominated by fixed overhead, >1 = superlinear (watch), ~2 = quadratic
(must be a declared-exact oracle). Keys that errored (-1) are passed through
with exponent null so a crash at scale is visible.
"""
import json
import math
import sys
from pathlib import Path

a_path, b_path = sys.argv[1], sys.argv[2]
out = sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf1.json"
a = json.load(open(a_path))
b = json.load(open(b_path))
qa, qb = a["queries"], b["queries"]
peaks = b.get("peak_mb", {})
rows = {}
for k in sorted(qa):
    if k not in qb:
        continue
    t0, t1 = qa[k], qb[k]
    exp = round(math.log10(t1 / t0), 3) if t0 > 0 and t1 > 0 else None
    rows[k] = {"t_sf0.1": t0, "t_sf1": t1, "exponent": exp}
    # per-key peak task execution memory at the LARGE scale (judge r10 #7:
    # rank which key OOMs first another decade up) — present when the
    # large-side bench ran with the peak tracker
    if k in peaks:
        rows[k]["peak_mb"] = peaks[k]
doc = {
    "metric": "scale_rehearsal",
    "data_ratio": 10,
    "sf_small": a["sf"],
    "sf_large": b["sf"],
    "agg": a.get("agg"),
    "repeat": a.get("repeat"),
    "queries": rows,
}
# OpsSpec's 50x-replicated semdedup case (k past the floor) records recall +
# runtime to target/semdedup_scale.json; fold it in so the rehearsal
# artifact carries the k-scaling evidence alongside the exponents.
sem = Path("target/semdedup_scale.json")
if sem.exists():
    doc["semdedup_scale_50x"] = json.loads(sem.read_text())
json.dump(doc, open(out, "w"), indent=1)
print(json.dumps({k: v["exponent"] for k, v in rows.items()}, indent=0))

#!/usr/bin/env python3
"""Merge a partial scale-rehearsal re-measurement into BENCH_sf1.json.

Usage: python3 tools/merge_exponents.py <sf0.1_subset.json> <sf1_subset.json> [out_json]

Same exponent math as scale_exponents.py, but UPDATES only the keys present
in both subset runs, preserving every other key's existing record — for
refreshing the rehearsal after a plan change without re-running all 81 keys.
Keys refreshed this way get a "round" stamp passed via MERGE_ROUND (env) so
the artifact records which vintage each exponent is.
"""
import json
import math
import os
import sys
from pathlib import Path

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
out = sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf1.json"
doc = json.load(open(out))
stamp = os.environ.get("MERGE_ROUND")
qa, qb = a["queries"], b["queries"]
updated = []
for k in sorted(set(qa) & set(qb)):
    t0, t1 = qa[k], qb[k]
    exp = round(math.log10(t1 / t0), 3) if t0 > 0 and t1 > 0 else None
    rec = {"t_sf0.1": t0, "t_sf1": t1, "exponent": exp}
    if k in b.get("peak_mb", {}):
        rec["peak_mb"] = b["peak_mb"][k]
    if stamp:
        rec["round"] = stamp
    doc["queries"][k] = rec
    updated.append(k)
sem = Path("target/semdedup_scale.json")
if sem.exists():
    doc["semdedup_scale_50x"] = json.loads(sem.read_text())
json.dump(doc, open(out, "w"), indent=1)
print(json.dumps({k: doc["queries"][k]["exponent"] for k in updated}, indent=0))

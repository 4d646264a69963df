#!/usr/bin/env python3
"""Fold a DISTINCT-CONTENT scale rehearsal into BENCH_sf1.json.

Usage: python3 tools/distinct_exponents.py <sf0.1_subset.json> <sf1_distinct_subset.json> [out_json]

Round-13 companion to merge_exponents.py: GenScale's replicate mode is
collapse-absorbable (string-identical replicas), so the existing
`exponent` fields measure the duplicate-heavy regime only. This tool adds
the distinct-content regime measured against a `GenScale ... distinct`
dir (salted tokens / jittered embeddings) WITHOUT overwriting the
replicated-mode record: each key present in both subset runs gains
  t_sf1_distinct, exponent_distinct, round = "r13-distinct"
alongside its existing t_sf1/exponent. Keys whose distinct exponent
exceeds ~1.1 are the collapse-can't-save-you list — each needs either a
banded/blocked production sibling or a documented declared-exact
quarantine (see PLANS.md round-13 geometry entry).
"""
import json
import math
import os
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
out = sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf1.json"
doc = json.load(open(out))
stamp = os.environ.get("MERGE_ROUND", "r13-distinct")
qa, qb = a["queries"], b["queries"]
updated = []
for k in sorted(set(qa) & set(qb)):
    t0, t1 = qa[k], qb[k]
    exp = round(math.log10(t1 / t0), 3) if t0 > 0 and t1 > 0 else None
    # Distinct-run provenance lives in its OWN fields (round-13 advisor:
    # writing rec["round"] = stamp clobbered the replicated-mode round that
    # produced t_sf1/exponent; and a setdefault-seeded t_sf0.1 would wrongly
    # present the distinct-base time as the replicated baseline). A key not
    # yet present gets an empty record — its replicated fields stay absent
    # rather than being faked from the distinct run.
    rec = doc["queries"].setdefault(k, {})
    rec["t_sf0.1_distinct_base"] = t0
    rec["t_sf1_distinct"] = t1
    rec["exponent_distinct"] = exp
    rec["round_distinct"] = stamp
    if k in b.get("peak_mb", {}):
        rec["peak_mb_distinct"] = b["peak_mb"][k]
    updated.append(k)
json.dump(doc, open(out, "w"), indent=1)
print(json.dumps({k: doc["queries"][k]["exponent_distinct"] for k in updated}, indent=0))

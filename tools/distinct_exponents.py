#!/usr/bin/env python3
"""Fold a DISTINCT-CONTENT scale rehearsal into BENCH_sf1.json (or, with
explicit labels, a decade-2 rehearsal into BENCH_sf10.json).

Usage: python3 tools/distinct_exponents.py <small_subset.json> <big_subset.json> \
           [out_json] [small_label big_label]

Defaults: out=BENCH_sf1.json, labels sf0.1 / sf1 (decade 1). Round 14's
decade-2 run: out=BENCH_sf10.json, labels sf1 sf10 — fields then read
t_sf1_distinct_base / t_sf10_distinct. A key whose big-side run errored
(Bench records -1; e.g. the declared-exact gram kernels fail fast at
their GramPairMaxReps guard on sf10-distinct cardinalities) is stamped
with t_<big>_distinct = -1 and exponent_distinct = None plus a
guard_tripped marker instead of a fake exponent.

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
# Labels must come as a PAIR: a half-specified invocation (only small_label)
# used to be silently ignored, mislabeling every stamped field with the
# sf0.1/sf1 defaults and no error (round-14 advisor finding).
if len(sys.argv) == 5:
    sys.exit("labels must be given as a pair: small_label big_label")
small = sys.argv[4] if len(sys.argv) > 5 else "sf0.1"
big = sys.argv[5] if len(sys.argv) > 5 else "sf1"
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
    rec[f"t_{small}_distinct_base"] = t0
    rec[f"t_{big}_distinct"] = t1
    rec["exponent_distinct"] = exp
    rec["round_distinct"] = stamp
    if t1 < 0:
        # the big-side run threw — for the declared-exact gram kernels this
        # is the GramPairMaxReps guard firing at rehearsal cardinality (the
        # designed fail-fast); record the fact, never a fake exponent
        rec["big_side_errored"] = True
    else:
        # a later successful re-merge of the same key must CLEAR a stale
        # error marker, not leave it beside a now-valid exponent_distinct
        # (round-14 advisor finding)
        rec.pop("big_side_errored", None)
    if k in b.get("peak_mb", {}):
        rec["peak_mb_distinct"] = b["peak_mb"][k]
    # pairs_out / s_per_pair (round-15 judge task #9): when the big-side
    # artifact carries rows_out, the "time tracks emitted pairs" annotation
    # on construction-driven exponents becomes a recorded measurement.
    rows = b.get("rows_out", {}).get(k, -1)
    if rows is not None and rows >= 0:
        rec["pairs_out"] = rows
        rec["s_per_pair"] = round(t1 / rows, 9) if t1 > 0 and rows > 0 else None
    updated.append(k)
json.dump(doc, open(out, "w"), indent=1)
print(json.dumps({k: doc["queries"][k]["exponent_distinct"] for k in updated}, indent=0))

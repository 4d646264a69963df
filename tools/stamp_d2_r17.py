#!/usr/bin/env python3
"""One-shot r17 decade-2 stamper: fold the v5.3 fullmat sf1->sf10 runs for
the 12 highest-decade-1 keys (+ the sort-first rewrite re-measures) into
BENCH_sf10.json with per-key round stamps. Idempotent; reads the /tmp
subset artifacts produced this round."""
import json
import math

doc = json.load(open("BENCH_sf10.json"))


def load(p):
    d = json.load(open(p))
    return d["queries"], d.get("peak_mb", {})


sf1_a, _ = load("/tmp/r17_large.json")
sf1_b, _ = load("/tmp/r17_rest_large.json")
sf10_12, pk_12 = load("/tmp/r17_sf10.json")

# 11 non-func keys from the 12-key decade-2 run (pre-rewrite plans, still
# current for these keys)
for k, t10 in sf10_12.items():
    if k in ("func_map",):  # rewritten after this run; stamped below
        continue
    t1 = sf1_a.get(k) or sf1_b.get(k)
    rec = {
        "t_sf1": t1,
        "t_sf10": t10,
        "exponent": round(math.log10(t10 / t1), 3),
        "round": "r17-fullmat-d2",
        "peak_mb": pk_12.get(k),
    }
    doc["queries"][k] = rec

# sort-first rewrites: decade-2 from the post-rewrite runs
sf1_f, _ = load("/tmp/r17_sf1_func4.json")
sf10_f, pk_f = load("/tmp/r17_sf10_func4.json")
sf1_arr, _ = load("/tmp/r17_sf1_funcarr.json")
sf10_arr, pk_arr = load("/tmp/r17_sf10_funcarr.json")
sf1_t, _ = load("/tmp/r17_sf1_text5.json")
sf10_t, pk_t = load("/tmp/r17_sf10_text5.json")

for src1, src10, pk in ((sf1_f, sf10_f, pk_f), (sf1_arr, sf10_arr, pk_arr),
                        (sf1_t, sf10_t, pk_t)):
    for k, t1 in src1.items():
        t10 = src10[k]
        doc["queries"][k] = {
            "t_sf1": t1,
            "t_sf10": t10,
            "exponent": round(math.log10(t10 / t1), 3),
            "round": "r17-fullmat-d2-sortfirst",
            "peak_mb": pk.get(k),
        }

doc["note"] = doc.get("note", "") + (
    " | r17-fullmat-d2: decade-2 re-stamped under v5.3 full-materialization "
    "for the 12 highest decade-1 keys; func_map's 1.16 superlinear reading "
    "led to the sort-first rewrite family (func_map/json/variant/try_cast/"
    "array + text_repetition_filter/quality/token_count/fingerprint/"
    "pii_redact), re-stamped post-rewrite as r17-fullmat-d2-sortfirst. "
    "Caveat: GenScale preserves the source's single-file layout, so scan "
    "parallelism is bytes/maxSplit (22 splits for events at sf10, 1 for "
    "documents) — conservative vs a real multi-file table (overstates "
    "scan-stage cost, cannot hide a quadratic).")

json.dump(doc, open("BENCH_sf10.json", "w"), indent=1)
print(json.dumps({k: doc["queries"][k]["exponent"] for k in sorted(
    set(sf10_12) | set(sf10_f) | set(sf10_arr) | set(sf10_t))}, indent=0))

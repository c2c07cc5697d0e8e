#!/usr/bin/env python3
"""Assemble a CORRECTNESS_100x_r{N}.json from sweep_nx.sh result logs.

Usage: tools/sweep_assemble.py <out.json> <campaign-note> <log> [log2 ...]
Later logs OVERRIDE earlier ones per key (the re-dump+re-check flow for
keys whose implementation changed after the main campaign dump).
A key line is "<key> :: <verdict...>"; PASS lines listing the key count
as pass, FAIL/TIMEOUT/ERROR lines as fail with the message kept.
"""
import json, sys

out_p, note = sys.argv[1], sys.argv[2]
results, fails = {}, {}
for log in sys.argv[3:]:
    for line in open(log):
        line = line.strip()
        if line == "SWEEP_DONE" or " :: " not in line:
            continue
        key, verdict = line.split(" :: ", 1)
        if verdict.startswith("PASS") and f" {key}" in verdict:
            results[key] = "pass"
            fails.pop(key, None)
        else:
            results[key] = "FAIL"
            fails[key] = verdict
n_pass = sum(1 for v in results.values() if v == "pass")
doc = {
    "campaign": note,
    "data": "tools/Replicate 100 x sf0.1 -> 60M lineitem / 10M events / "
            "500k docs / 200k vectors (~1.6GB parquet)",
    "method": "graft.Verify full dump at the 100x dir, then "
              "tools/sweep_nx.sh per-key check.py --skip-verify --alts "
              "--timeout=900 (exact value compare vs DuckDB, "
              "column-sorted); changed/new keys re-dumped+re-checked "
              "from a fresh subset dump (later logs override)",
    "n_keys": len(results),
    "n_pass": n_pass,
    "n_fail": len(results) - n_pass,
    "failures": fails,
    "results": dict(sorted(results.items())),
}
json.dump(doc, open(out_p, "w"), indent=1)
print(f"{n_pass}/{len(results)} pass -> {out_p}")
if fails:
    print("FAILURES:")
    for k, v in fails.items():
        print(f"  {k}: {v[:200]}")

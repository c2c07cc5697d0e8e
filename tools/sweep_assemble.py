#!/usr/bin/env python3
"""Assemble a CORRECTNESS_{N}x_r{N}.json from sweep_nx.sh result logs.

Usage: tools/sweep_assemble.py <out.json> <campaign-note> <log> [log2 ...]
       [--fresh-since=<path-or-epoch>] [--allow-stale]

Later logs OVERRIDE earlier ones per key (the re-dump+re-check flow for
keys whose implementation changed after the main campaign dump).
A key line is "<key> :: <verdict...>"; PASS lines listing the key count
as pass, FAIL/TIMEOUT/ERROR lines as fail with the message kept.

Provenance (r19 verdict #7 — the stale-lane trap): every key records
WHICH log its winning verdict came from and that log's mtime. With
--fresh-since=<path-or-epoch> (point it at the round's dump dir), any
non-PASS verdict whose source log predates the round is REFUSED —
a crashed prior lane's ERROR lines can no longer ride into a new
board as if they were this round's adjudication. Carried PASSes are
fine (that is the standing-board flow); carried FAILURES are not an
adjudication, they are a hole. --allow-stale downgrades the refusal
to a loud WARN and tags the failure message as STALE-CARRY.
"""
import json, os, sys, time

flags = [a for a in sys.argv[1:] if a.startswith("--")]
pos = [a for a in sys.argv[1:] if not a.startswith("--")]
out_p, note = pos[0], pos[1]
logs = pos[2:]
allow_stale = "--allow-stale" in flags
fresh_raw = next((f.split("=", 1)[1] for f in flags
                  if f.startswith("--fresh-since=")), None)
fresh_since = None
if fresh_raw is not None:
    fresh_since = (os.path.getmtime(fresh_raw) if os.path.exists(fresh_raw)
                   else float(fresh_raw))

results, fails, prov = {}, {}, {}
for log in logs:
    mt = os.path.getmtime(log)
    for line in open(log):
        line = line.strip()
        if line == "SWEEP_DONE" or " :: " not in line:
            continue
        key, verdict = line.split(" :: ", 1)
        prov[key] = {"log": os.path.basename(log),
                     "log_mtime": time.strftime(
                         "%Y-%m-%dT%H:%M:%SZ", time.gmtime(mt))}
        if verdict.startswith("PASS") and f" {key}" in verdict:
            results[key] = "pass"
            fails.pop(key, None)
        else:
            results[key] = "FAIL"
            fails[key] = verdict
            prov[key]["stale"] = bool(fresh_since and mt < fresh_since)

stale = sorted(k for k in fails if prov[k].get("stale"))
if stale:
    print("STALE-CARRY: these keys' only verdict is a FAILURE from a "
          "log older than --fresh-since — a dead lane's verdicts are "
          "not this round's adjudication:", file=sys.stderr)
    for k in stale:
        print(f"  {k} :: {fails[k][:120]}  [{prov[k]['log']} @ "
              f"{prov[k]['log_mtime']}]", file=sys.stderr)
    if not allow_stale:
        sys.exit("REFUSED: re-sweep these keys (or pass --allow-stale "
                 "to tag them STALE-CARRY explicitly)")
    for k in stale:
        fails[k] = "STALE-CARRY: " + fails[k]

n_pass = sum(1 for v in results.values() if v == "pass")
doc = {
    "campaign": note,
    "data": "tools/Replicate N x sf0.1 (see campaign note for the "
            "decade: 100x -> 60M lineitem / 500k docs / 200k vectors; "
            "1000x -> 600M / 5M / 2M)",
    "method": "graft.Verify full/subset dump at the Nx dir, then "
              "tools/sweep_nx.sh per-key check.py --skip-verify --alts "
              "--timeout=900 (exact value compare vs DuckDB, "
              "column-sorted); changed/new keys re-dumped+re-checked "
              "from a fresh subset dump (later logs override); per-key "
              "provenance recorded, non-PASS verdicts from logs older "
              "than --fresh-since refused",
    "n_keys": len(results),
    "n_pass": n_pass,
    "n_fail": len(results) - n_pass,
    "failures": fails,
    "provenance": {k: prov[k] for k in sorted(prov)},
    "results": dict(sorted(results.items())),
}
json.dump(doc, open(out_p, "w"), indent=1)
print(f"{n_pass}/{len(results)} pass -> {out_p}")
if fails:
    print("FAILURES:")
    for k, v in fails.items():
        print(f"  {k}: {v[:200]}")

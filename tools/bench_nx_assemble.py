#!/usr/bin/env python3
"""Assemble a BENCH_100x_r{N}.json from a graft.Bench log at an N×
volume dir, and diff its per-key seconds against the prior campaign
file so scale-wall regressions get the same round-over-round
discipline as the sf0.1 bench.

Usage: tools/bench_nx_assemble.py <bench-log> <prior-campaign.json> \
       <out.json> <campaign-note> [adjudications.json] [data-string]
(data-string overrides the default "data" field of the output —
pass it when the board was run at a volume other than 100 x sf0.1.)
The bench log's LAST '{"metric":...}' line is the JSON; BENCH_local
is not used (the log survives nohup, the cwd file may be clobbered by
later 1x runs).

ADJUDICATION COVERAGE IS MECHANICAL (r16 verdict #2): every per-key
move >= 1.4x in EITHER direction (and > 0.5 s absolute delta) must
have an entry in the adjudications JSON (a {key: "explanation"} map,
also embedded into the output) or this script REFUSES to write the
board — the "every move adjudicated" claim is enforced by the
artifact, not the round's diligence. Keys in the adjudications file
that are not movers are fine (context entries, new-key notes,
exclusions).
"""
import json, sys

log, prior_p, out_p, note = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
adj_p = sys.argv[5] if len(sys.argv) > 5 else None
data_s = sys.argv[6] if len(sys.argv) > 6 else None
line = None
for l in open(log, errors="replace"):
    if '"metric":"total"' in l:
        line = l[l.index('{'):].strip()
if line is None:
    sys.exit(f'no \'"metric":"total"\' line found in {log} — '
             "did graft.Bench finish? (its JSON is the last stdout line)")
bench = json.loads(line)
prior = json.load(open(prior_p))
pq = prior.get("bench", prior).get("queries", {})
nq = bench["queries"]
adj = json.load(open(adj_p)) if adj_p else {}
# movers needing adjudication: >= 1.4x either way AND > 0.5s delta
movers = {k for k in nq if k in pq and abs(nq[k] - pq[k]) > 0.5
          and (nq[k] >= 1.4 * pq[k] or pq[k] >= 1.4 * nq[k])}
missing = sorted(movers - set(adj))
if missing:
    for k in missing:
        ratio = f"{nq[k]/pq[k]:.2f}x" if pq[k] else "infx"
        print(f"UNADJUDICATED {k}: {pq[k]:.2f} -> {nq[k]:.2f} s "
              f"({ratio})", file=sys.stderr)
    sys.exit(f"refusing to write {out_p}: {len(missing)} mover(s) >=1.4x "
             "lack an adjudications entry (pass a JSON map as argv[5])")
# labeled diff keeps the sharper 1.5x + 0.5s buckets for reading
regr = {k: (pq[k], nq[k]) for k in nq
        if k in pq and nq[k] > 1.5 * pq[k] and nq[k] > pq[k] + 0.5}
impr = {k: (pq[k], nq[k]) for k in nq
        if k in pq and pq[k] > 1.5 * nq[k] and pq[k] > nq[k] + 0.5}
new = sorted(set(nq) - set(pq))
doc = {
    "campaign": note,
    "data": data_s or "tools/Replicate 100 x sf0.1: 60M lineitem / 10M events / 500k docs / 200k vectors (~1.6GB parquet)",
    "method": "graft.Bench (min-of-2, noop sink forcing all output columns, family stores cleared+timed cold as _store_* keys, marginal queries warm-store) on idle local[32] / 64g heap",
    "diff_vs_prior": {
        "prior_file": prior_p.split("/")[-1],
        "regressions_1p5x_plus_half_s": {k: {"prior_s": a, "now_s": b}
                                         for k, (a, b) in sorted(regr.items())},
        "improvements_1p5x_plus_half_s": {k: {"prior_s": a, "now_s": b}
                                          for k, (a, b) in sorted(impr.items())},
        "new_keys": new,
    },
    "bench": bench,
}
if adj:
    doc["adjudications"] = adj
json.dump(doc, open(out_p, "w"), indent=1)
print("movers_1p4x adjudicated:", sorted(movers) if movers else "none")
print("regressions:", json.dumps(regr, indent=1) if regr else "none")
print("improvements:", sorted(impr))
print("new keys:", new)
print("wrote", out_p)

#!/bin/bash
# N'x-volume correctness campaign driver (the r12 100x method):
# one tools/check.py invocation per gate key so a single intractable
# oracle can neither hang nor OOM the sweep, results land
# incrementally, and known-heavy keys run last.
#
# Usage: tools/sweep_nx.sh <nx-sf-dir> <nx-verify-dump> [results-log]
# Precondition: graft.Verify has dumped every query + oracle_sql.json
# (+ oracle_alt.json) at <nx-verify-dump> for <nx-sf-dir>.
set -u
SFDIR=${1:?nx sf dir}
DUMP=${2:?nx verify dump}
LOG=${3:-/tmp/sweep_nx_results.log}
cd "$(dirname "$0")/.."
HEAVY="d_embedding_neardup d_semdedup d_sem_clusters s_knn_degree s_reindex_topk d_neardup_venn d_lsh_calibration d_substr_dup t_bigram_nll"
KEYS=$(ls "$DUMP" | grep -v '\.json$')
{ grep -vwF -f <(tr ' ' '\n' <<< "$HEAVY") <<< "$KEYS";
  tr ' ' '\n' <<< "$HEAVY"; } > /tmp/sweep_nx_order.txt
: > "$LOG"
while read -r key; do
  [ -z "$key" ] && continue
  out=$(timeout 1000 python3 tools/check.py "$SFDIR" "$DUMP" \
    --skip-verify --alts --timeout=900 "$key" 2>&1 |
    grep -E "^PASS|^FAIL|^ROWS-ONLY|^TIMEOUT")
  echo "$key :: $out" >> "$LOG"
done < /tmp/sweep_nx_order.txt
echo SWEEP_DONE >> "$LOG"

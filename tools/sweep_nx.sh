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
HEAVY="d_substr_long d_embedding_neardup d_semdedup d_sem_clusters s_knn_degree s_reindex_topk d_neardup_venn d_lsh_calibration d_substr_dup t_bigram_nll"
KEYS=$(ls "$DUMP" | grep -v '\.json$')
# heavy keys run LAST, but only those actually present in the dump —
# appending the full HEAVY list would re-order (and double-log) keys
# a subset dump doesn't contain
HEAVY_PRESENT=$(grep -wF -f <(tr ' ' '\n' <<< "$HEAVY") <<< "$KEYS" || true)
# unique order file: a fixed path let a concurrently-launched sweep
# truncate this one's read loop mid-campaign (same inode, early EOF)
ORDER=$(mktemp /tmp/sweep_nx_order.XXXXXX)
{ grep -vwF -f <(tr ' ' '\n' <<< "$HEAVY") <<< "$KEYS";
  [ -n "$HEAVY_PRESENT" ] && echo "$HEAVY_PRESENT"; } > "$ORDER"
# resumable: an existing log's PASS/ROWS-ONLY verdicts are kept and
# their keys skipped; FAIL/TIMEOUT/ERROR keys RE-RUN on resume (a
# transient timeout under load must not stick for the whole campaign
# — r15 advice). Later verdict lines override earlier ones in
# sweep_assemble.py, so the re-run's verdict wins.
[ -f "$LOG" ] || : > "$LOG"
while read -r key; do
  [ -z "$key" ] && continue
  grep -qE "^$key :: (PASS|ROWS-ONLY)" "$LOG" && continue
  # Collapse the verdict to ONE line per key: on failure check.py
  # prints BOTH an empty "PASS (0):" summary and a FAIL detail line,
  # and logging them raw double-counts the key in a `grep -c PASS`
  # tally (the r13 accounting trap). FAIL/TIMEOUT lines win; the
  # PASS summary is kept only when it actually lists the key.
  out=$(timeout 1000 python3 tools/check.py "$SFDIR" "$DUMP" \
    --skip-verify --alts --timeout=900 --mem=${SWEEP_MEM:-40GB} \
    ${SWEEP_THREADS:+--threads=$SWEEP_THREADS} "$key" 2>&1 |
    grep -E "^PASS|^FAIL|^ROWS-ONLY|^TIMEOUT")
  bad=$(grep -E "^FAIL|^TIMEOUT" <<< "$out" | paste -sd' | ' -)
  [ -n "$bad" ] && out="$bad" || out=$(paste -sd' | ' - <<< "$out")
  # a crashed check.py (or a key absent from its output) yields an
  # empty grep — log it as ERROR so it can't read as a silent pass
  [ -z "$out" ] && out="ERROR (check.py produced no verdict line)"
  echo "$key :: $out" >> "$LOG"
  # reap per-process DuckDB spill dirs whose owner died: a killed or
  # OOM'd check.py leaves its temp_directory behind (16GB+ each at
  # 1000x — two of these took the disk down in r20) and DuckDB only
  # cleans up on graceful close
  for d in /tmp/duckdb_tmp_*; do
    pid=${d##*_}
    [ -d "$d" ] && ! kill -0 "$pid" 2>/dev/null && rm -rf "$d"
  done
done < "$ORDER"
rm -f "$ORDER"
echo SWEEP_DONE >> "$LOG"

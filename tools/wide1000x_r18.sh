#!/bin/bash
# r18 WIDE 1000x correctness campaign (r17 verdict #6): the full gate
# minus d_embedding_neardup (all-pairs by declared semantics —
# adjudicated OFF >=1000x boards in r17; its volume-bounded twin
# d_embedding_neardup_s IS in the sweep), plus the two r18 keys.
# Spark dump first (hours), then the per-key DuckDB sweep with
# --alts --timeout=900 (resumable; heavy keys last). Waits for the
# r18 renewal phases to release the memory before starting.
set -eu
cd "$(dirname "$0")/.."
while ! grep -q ALL_PHASES_DONE /tmp/renew_r18.log 2>/dev/null; do sleep 60; done
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
 --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
 --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SF=/tmp/graft_sf_x1000
DUMP=/tmp/graft_verify_x1000_r18wide
KEYS=$(cat /tmp/r18_wide_keys.txt)
if [ ! -f "$DUMP/oracle_sql.json" ]; then
  SPARK_GRAFT_CPUS=32 java $ADDOPENS -Xmx64g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify "$SF" "$DUMP" $KEYS
  cp "$DUMP/oracle_sql.partial.json" "$DUMP/oracle_sql.json"
  cp "$DUMP/oracle_alt.partial.json" "$DUMP/oracle_alt.json"
fi
echo WIDE_DUMP_DONE
tools/sweep_nx.sh "$SF" "$DUMP" /tmp/sweep_nx_r18_1000xwide.log
echo WIDE_SWEEP_DONE

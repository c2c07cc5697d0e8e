#!/bin/bash
# r20 100x renewal (r19 verdict #3): fresh subset dump + check for the
# 4 keys r19 changed (t_classifier_val_q's cut columns, s_reindex_topk
# under the two-level rule at 448 cells, m_video_mjpeg_gradv's first
# 100x proof, p_stream_sessions' parquet-sink path) plus the new r20
# key m_video_mjpeg_plane.
set -u
cd "$(dirname "$0")/.."
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
 --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
 --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SF=/tmp/graft_sf_x100
DUMP=/tmp/gv20_100x
CP="${FROZEN_CP:-/tmp/classes_r20_frozen}:/opt/spark/jars/*"
if [ ! -f "$DUMP/oracle_sql.json" ]; then
  rm -rf "$DUMP"
  SPARK_GRAFT_CPUS=${DUMP_CPUS:-24} java $ADDOPENS -Xmx48g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.driver.maxResultSize=8g -cp "$CP" \
    graft.Verify "$SF" "$DUMP" t_classifier_val_q s_reindex_topk \
    m_video_mjpeg_gradv p_stream_sessions m_video_mjpeg_plane
  cp "$DUMP/oracle_sql.partial.json" "$DUMP/oracle_sql.json"
  cp "$DUMP/oracle_alt.partial.json" "$DUMP/oracle_alt.json"
fi
echo RENEW_DUMP_DONE
SWEEP_THREADS=${THREADS:-8} SWEEP_MEM=${MEM:-24GB} \
  tools/sweep_nx.sh "$SF" "$DUMP" /tmp/sweep_100x_r20.log
echo RENEW_SWEEP_DONE

#!/bin/bash
# r17 100x correctness renewal: subset re-dump + re-sweep of keys new
# or code-touched this round; sweep_assemble merges with the r16 logs
# (later-log override) into CORRECTNESS_100x_r17.json.
set -eu
cd "$(dirname "$0")/.."
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
 --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
 --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# new gate keys + every assign-path key (NearestCell/OffsetArgmin) +
# classifier keys (kernel clone) + m_audio_real (openPcm fallback path)
KEYS="d_embedding_neardup_s s_filtered_recall m_video_mjpeg \
 s_ivf_topk s_ivf_recall s_pq_topk s_pq_recall s_ivfpq_topk s_ivfpq_recall \
 s_ivfpq_tuning s_ivfpq_indexed s_filtered_topk s_reindex_topk d_pq_semdedup \
 d_stream_pqdedup d_stream_pqdedup_res s_block_profile s_centroid_dist \
 t_classifier_score t_classifier_calib t_classifier_val m_audio_real"
SF=/tmp/graft_sf_x100
DUMP=/tmp/graft_verify_x100_r17sub
rm -rf "$DUMP"
SPARK_GRAFT_CPUS=32 java $ADDOPENS -Xmx64g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$DUMP" $KEYS
cp "$DUMP/oracle_sql.partial.json" "$DUMP/oracle_sql.json"
cp "$DUMP/oracle_alt.partial.json" "$DUMP/oracle_alt.json"
tools/sweep_nx.sh "$SF" "$DUMP" /tmp/sweep_nx_r17_100xsub.log
echo RENEW100X_DONE

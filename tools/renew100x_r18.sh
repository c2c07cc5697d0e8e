#!/bin/bash
# r18 100x correctness renewal + 1000x reindex-ALT retry.
# Phase 1: subset re-dump + re-sweep at 100x of every key code-touched
# this round (probeCells -> CellScores kernel: the whole probe-path
# search family; Classifier.fit block-release internals: the classifier
# family + the NEW t_classifier_val_q; kmeans trainCentroids release:
# the centroid-consuming keys; clearStore ownership: the store-built
# dedup family). sweep_assemble merges with the r17 logs (later-log
# override) into CORRECTNESS_100x_r18.json.
# Phase 2: s_reindex_topk subset dump at 1000x, swept with the NEW
# array-native ALT oracle (the r17 campaign's one oracle-budget
# timeout) -> closes the 1000x scale-shape campaign at 17/17.
set -eu
cd "$(dirname "$0")/.."
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
 --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
 --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
KEYS="s_ivf_topk s_ivf_recall s_pq_topk s_pq_recall s_ivfpq_topk s_ivfpq_recall \
 s_ivfpq_tuning s_ivfpq_indexed s_filtered_topk s_filtered_recall s_reindex_topk \
 d_pq_semdedup d_stream_pqdedup d_stream_pqdedup_res \
 t_classifier_score t_classifier_calib t_classifier_val t_classifier_val_q \
 d_semdedup d_sem_clusters d_cluster_purity s_centroid_dist s_block_profile"
SF=/tmp/graft_sf_x100
DUMP=/tmp/graft_verify_x100_r18sub
rm -rf "$DUMP"
SPARK_GRAFT_CPUS=32 java $ADDOPENS -Xmx64g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$DUMP" $KEYS
cp "$DUMP/oracle_sql.partial.json" "$DUMP/oracle_sql.json"
cp "$DUMP/oracle_alt.partial.json" "$DUMP/oracle_alt.json"
tools/sweep_nx.sh "$SF" "$DUMP" /tmp/sweep_nx_r18_100xsub.log

SF2=/tmp/graft_sf_x1000
DUMP2=/tmp/graft_verify_x1000_r18re
rm -rf "$DUMP2"
SPARK_GRAFT_CPUS=32 java $ADDOPENS -Xmx64g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF2" "$DUMP2" s_reindex_topk
cp "$DUMP2/oracle_sql.partial.json" "$DUMP2/oracle_sql.json"
cp "$DUMP2/oracle_alt.partial.json" "$DUMP2/oracle_alt.json"
tools/sweep_nx.sh "$SF2" "$DUMP2" /tmp/sweep_nx_r18_1000xre.log
echo ALL_PHASES_DONE

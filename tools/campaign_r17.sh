#!/bin/bash
# r17 1000x campaign: subset dump of the scale-SHAPE keys at
# /tmp/graft_sf_x1000 (2M vectors / 5M docs / 600M lineitem), then the
# per-key DuckDB sweep. The quadratic full-corpus d_embedding_neardup
# and the fixed-6-plane d_semdedup family are EXCLUDED by design (the
# r16 verdict's adjudicated bucket); d_embedding_neardup_s is the
# bounded exact-pair yardstick.
set -eu
cd "$(dirname "$0")/.."
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
 --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
 --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
KEYS="t_classifier_score t_classifier_calib t_classifier_val \
 s_ivfpq_topk s_ivfpq_recall s_ivfpq_tuning s_ivfpq_indexed \
 s_filtered_topk s_filtered_recall s_reindex_topk \
 d_stream_neardup d_stream_pqdedup d_stream_pqdedup_res \
 d_shuffle_export t_seq_pack d_embedding_neardup_s d_pq_semdedup"
SF=/tmp/graft_sf_x1000
DUMP=/tmp/graft_verify_x1000
rm -rf "$DUMP"
SPARK_GRAFT_CPUS=32 java $ADDOPENS -Xmx80g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$DUMP" $KEYS
# subset dump writes .partial.json; this dir is subset-only, promote
cp "$DUMP/oracle_sql.partial.json" "$DUMP/oracle_sql.json"
cp "$DUMP/oracle_alt.partial.json" "$DUMP/oracle_alt.json"
tools/sweep_nx.sh "$SF" "$DUMP" /tmp/sweep_nx_r17_1000x.log
echo CAMPAIGN_DUMP_AND_SWEEP_DONE

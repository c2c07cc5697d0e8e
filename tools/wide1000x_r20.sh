#!/bin/bash
# r20 wide-1000x board completion (r19 verdict #1): re-dump + re-sweep
# the 21 keys whose r19 board entries were stale crashed-lane ERRORs,
# the 4 shingle-store keys + 3 semantic keys + d_simhash that were
# mid-dump/never-attempted, and the two new MJPEG ramp keys. Dumps run
# from a FROZEN classpath (/tmp/classes_r20_frozen) so foreground work
# cannot disturb the campaign; each pack is its own JVM so one crash
# loses one pack. Sweeps run per pack as it completes (the lane flow).
set -u
cd "$(dirname "$0")/.."
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
 --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
 --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SF=/tmp/graft_sf_x1000
CP="${FROZEN_CP:-/tmp/classes_r20_frozen}:/opt/spark/jars/*"
LOG=/tmp/sweep_1000x_r20.log

dump() {  # dir keys...
  local dir=$1; shift
  if [ -f "$dir/oracle_sql.json" ]; then echo "DUMP_SKIP $dir"; return; fi
  rm -rf "$dir"
  SPARK_GRAFT_CPUS=${DUMP_CPUS:-24} java $ADDOPENS -Xmx48g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.driver.maxResultSize=8g -cp "$CP" \
    graft.Verify "$SF" "$dir" "$@" || { echo "DUMP_FAIL $dir"; return; }
  cp "$dir/oracle_sql.partial.json" "$dir/oracle_sql.json"
  cp "$dir/oracle_alt.partial.json" "$dir/oracle_alt.json"
  echo "DUMP_DONE $dir"
}
# up to 4 sweeps can overlap while later packs dump: cap each DuckDB
# at 24GB/8 threads so the worst case (4 x 24GB + a 48GB dump JVM)
# stays under the 128GB box
sweep() {  # dir
  SWEEP_THREADS=${THREADS:-8} SWEEP_MEM=${MEM:-24GB} \
    tools/sweep_nx.sh "$SF" "$1" "$LOG"
}

# pack A: text keys over 5M docs (14 of the 21 stale-ERROR keys)
dump /tmp/gv20_a t_tokens t_langid t_zipf t_pii_scrub t_repetition \
  t_char_entropy t_corpus_stats t_doc_chunk t_dsir_weight t_filter_chain \
  t_length_hist t_pack_stats t_tfidf_top t_bigram_nll
sweep /tmp/gv20_a &

# pack B: media + search + source (7 stale + d_simhash re-dump + the
# two ramp keys needing their first 1000x numbers)
dump /tmp/gv20_b m_audio_real m_video_mjpeg_grad m_video_mjpeg_gradv \
  m_video_mjpeg_plane s_block_profile s_centroid_dist s_lsh_topk \
  d_source_dup_rate d_source_overlap d_simhash
sweep /tmp/gv20_b &

# pack C: the 4 shingle-store keys (one JVM: they share the
# shingle-overlap session store, so the build amortizes)
dump /tmp/gv20_c d_ngram_jaccard d_containment_dup d_lsh_calibration \
  d_neardup_venn
sweep /tmp/gv20_c &

# pack D: the 3 semantic keys (ALT oracles; share the embedding family)
dump /tmp/gv20_d d_semdedup d_sem_clusters s_knn_degree
sweep /tmp/gv20_d &

wait
echo ALL_R20_LANES_DONE

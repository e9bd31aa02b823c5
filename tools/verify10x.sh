#!/bin/bash
# 10x correctness gate (round-13 verdict task 1): run the DuckDB oracle
# compare on a 10x scale fixture for the cardinality/overflow-sensitive
# board rows — the classes where a larger id*position product overflows
# or a silent cap bites (integer checksums, ppm shares, prefix-sum
# packers, md5-mod draws, bitmap positions, id-arithmetic windows).
# The committed sf0.01/sf0.1 gates never exercise ids past ~1e6; the
# scale fixture's k*1e9 id offsets do (first catch: mm_audio/mm_flac/
# mm_vad's LCG product overflowed INT64 — DuckDB refused, the JVM
# silently wrapped).
#
# Usage: tools/verify10x.sh  (from the repo root; ~4 min Verify + ~4 min
# oracle on a quiet host). Writes CORRECTNESS_10X.json.
set -e
FIXTURE=${FIXTURE:-/tmp/scale10}
OUT=${OUT:-/tmp/v10x_gate}

# Sensitive subset, by failure class:
ROWS="
  mm_binary mm_frames mm_audio mm_flac mm_vad mm_warc mm_gif mm_gif_anim
  mm_tiff mm_scene_cut mm_pitch mm_mp3_probe mm_mp4_probe
  mm_ahash_pairs mm_ahash_clusters
  tx_fingerprint tx_winnow dd_winnow_pairs tx_cdc_chunks dd_simhash
  v_random_walk v_neighbor_sample q_hash_sample q_split_assign
  tx_weighted_sample q_stratified q_reservoir_group pl_epoch_shuffle
  dd_cross_split_leak
  pl_pack tx_pack_chunks pl_shard_balance pl_length_buckets pl_loss_mask
  pl_curriculum
  q_apportion q_mix_alloc q_benford tx_zipf q_key_skew
  q_bitmap_distinct q_zone_map q_zorder q_compact_bins q_equidepth_hist
  q_tpch18 tx_tokens tx_ngram_coverage q_user_entropy
  q_islands q_sequence_match q_funnel_steps q_retention
  dd_snm q_markov q_window_range v_quantize
"
ROWS=$(echo $ROWS)

if [ ! -d "$FIXTURE/lineitem.parquet" ] && [ ! -f "$FIXTURE/lineitem.parquet" ]; then
  echo "== generating 10x fixture at $FIXTURE"
  SPARK_GRAFT_CPUS=16 sbt -batch \
    "runMain graft.tools.ScaleFixture /root/testdata/sf0.1 $FIXTURE 10"
fi

echo "== Verify ($(echo $ROWS | wc -w) rows) at $FIXTURE"
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-8g} sbt -batch \
  "runMain graft.Verify $FIXTURE $OUT $ROWS"

echo "== DuckDB oracle compare"
python3 tools/compare.py --json CORRECTNESS_10X.json "$FIXTURE" "$OUT" $ROWS

#!/bin/bash
# Round-5 TPU job queue: chained single-tenant jobs (one TPU process at a
# time — CLAUDE.md).  Launch detached:  setsid bash scripts/round5_tpu_queue.sh
#
#   0. held-out smoke (N=16, 400 steps) — validates the new generalization
#      plumbing on-chip before committing hours to it; aborts the queue on rc!=0
#   1. GENERALIZATION run (round-4 VERDICT missing #1): VG N=64 flagship
#      geometry, 8192-graph synthetic population, genuinely held-out 512-graph
#      test split, reusable-triplet popularity (node_alpha=0.02/edge_alpha=0.05
#      -> triplet-TV iid ceiling ~0.23 vs 1.45 default, measured in
#      BASELINE.md round-5), reference recipe, 40k steps.
#   2. CONVERGENCE resume (VERDICT weak #1/#4): resume .quality/vg64 @36k to
#      100k steps — degree MMD horizon + EMA-0.9999 past 3+ post-ramp horizons.
#   3. real-TPU product-CLI train->eval cycle (VERDICT missing #2).
#   4. bench capture x2 (warmup_s/mfu keys + artifact_load_s cold-vs-warm).
cd /root/repo || exit 1
Q=/root/repo/.quality
mkdir -p "$Q"
log() { echo "$1 $(date)" >> "$Q/queue5.log"; }

export DSG_SYNTH_CACHE_DIR=$Q/synth_cache

# -- 0. held-out smoke --
QUALITY_DIR=$Q/gen16_smoke QUALITY_CONFIG=vg QUALITY_MAX_NODES=16 \
QUALITY_HELDOUT=1 QUALITY_NUM_TRAIN=512 QUALITY_NUM_TEST=128 \
QUALITY_POP_NODE_ALPHA=0.02 QUALITY_POP_EDGE_ALPHA=0.05 \
QUALITY_STEPS=400 QUALITY_EVAL_EVERY=400 QUALITY_FUSE_STEPS=8 \
QUALITY_SKIP_INITIAL_EVALS=1 \
  timeout 2400 python scripts/train_quality_tpu.py > "$Q/gen16_smoke.log" 2>&1
rc=$?
log "gen16_smoke rc=$rc"
if [ $rc -ne 0 ]; then log "ABORT (smoke failed)"; exit 1; fi

# -- 1. generalization run at the flagship geometry --
QUALITY_DIR=$Q/gen64 QUALITY_CONFIG=vg QUALITY_MAX_NODES=64 \
QUALITY_HELDOUT=1 QUALITY_NUM_TRAIN=8192 QUALITY_NUM_TEST=512 \
QUALITY_POP_NODE_ALPHA=0.02 QUALITY_POP_EDGE_ALPHA=0.05 \
QUALITY_STEPS=40000 QUALITY_EVAL_EVERY=8000 QUALITY_FUSE_STEPS=8 \
  timeout 14400 python scripts/train_quality_tpu.py > "$Q/gen64.log" 2>&1
log "gen64 rc=$?"

# -- 2. flagship convergence resume 36k -> 100k --
QUALITY_DIR=$Q/vg64 QUALITY_CONFIG=vg QUALITY_MAX_NODES=64 \
QUALITY_STEPS=100000 QUALITY_EVAL_EVERY=16000 QUALITY_FUSE_STEPS=4 \
  timeout 18000 python scripts/train_quality_tpu.py > "$Q/vg64_resume.log" 2>&1
log "vg64_resume rc=$?"

# -- 3. product-CLI train->eval cycle on the chip --
timeout 7200 bash scripts/round5_cli_cycle.sh > "$Q/cli_cycle.log" 2>&1
log "cli_cycle rc=$?"

# -- 4. bench telemetry captures (cold then warm artifact load) --
sync; echo 3 > /proc/sys/vm/drop_caches 2>/dev/null  # cold page cache if permitted
timeout 1800 python bench.py > "$Q/bench_r5_cold.log" 2>&1
log "bench_cold rc=$?"
timeout 1200 python bench.py > "$Q/bench_r5_warm.log" 2>&1
log "bench_warm rc=$?"
echo ALL_DONE >> "$Q/queue5.log"

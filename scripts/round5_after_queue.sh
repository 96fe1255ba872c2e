#!/bin/bash
# Waits for round5_tpu_queue.sh (ALL_DONE marker), then:
#   1. degree-MMD sampling diagnostics on the resumed vg64 checkpoint
#      (VERDICT item 7) — and on the generalization run's checkpoint;
#   2. one unattended FULL test-suite run on the then-quiet box
#      (VERDICT weak #5).
cd /root/repo || exit 1
Q=/root/repo/.quality
while ! grep -q ALL_DONE "$Q/queue5.log" 2>/dev/null; do sleep 30; done
log() { echo "$1 $(date)" >> "$Q/queue5.log"; }

export DSG_SYNTH_CACHE_DIR=$Q/synth_cache
QUALITY_DIR=$Q/vg64 QUALITY_CONFIG=vg QUALITY_MAX_NODES=64 \
  timeout 3600 python scripts/degree_diag_tpu.py > "$Q/degree_diag_vg64.log" 2>&1
log "degree_diag_vg64 rc=$?"

QUALITY_DIR=$Q/gen64 QUALITY_CONFIG=vg QUALITY_MAX_NODES=64 \
QUALITY_HELDOUT=1 QUALITY_NUM_TRAIN=8192 QUALITY_NUM_TEST=512 \
QUALITY_POP_NODE_ALPHA=0.02 QUALITY_POP_EDGE_ALPHA=0.05 \
  timeout 3600 python scripts/degree_diag_tpu.py > "$Q/degree_diag_gen64.log" 2>&1
log "degree_diag_gen64 rc=$?"

timeout 9000 python -m pytest tests/ -q > "$Q/full_tests_r5.log" 2>&1
log "full_tests rc=$? tail=$(tail -1 $Q/full_tests_r5.log)"
echo AFTER_QUEUE_DONE >> "$Q/queue5.log"

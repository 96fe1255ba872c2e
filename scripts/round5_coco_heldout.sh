#!/bin/bash
# Round-5 stretch: generalization regime on the SECOND dataset family —
# COCO N=40, 8192-graph population, held-out 512-graph test split,
# reusable-triplet popularity, then churn-0 evals of the final checkpoint.
cd /root/repo || exit 1
Q=/root/repo/.quality
log() { echo "$1 $(date)" >> "$Q/queue5.log"; }
export DSG_SYNTH_CACHE_DIR=$Q/synth_cache
ENV="QUALITY_DIR=$Q/gencoco QUALITY_CONFIG=coco QUALITY_MAX_NODES=40 \
QUALITY_HELDOUT=1 QUALITY_NUM_TRAIN=8192 QUALITY_NUM_TEST=512 \
QUALITY_POP_NODE_ALPHA=0.02 QUALITY_POP_EDGE_ALPHA=0.05"

env $ENV QUALITY_STEPS=16000 QUALITY_EVAL_EVERY=8000 QUALITY_FUSE_STEPS=8 \
  timeout 10800 python scripts/train_quality_tpu.py > "$Q/gencoco.log" 2>&1
log "gencoco rc=$?"

env $ENV EVAL_S_CHURN=0 timeout 3000 python scripts/eval_ckpt_quality_tpu.py \
  > "$Q/gencoco_churn0.log" 2>&1
log "gencoco_churn0 rc=$?"
env $ENV EVAL_S_CHURN=0 EVAL_EMA_IDX=1 timeout 3000 \
  python scripts/eval_ckpt_quality_tpu.py \
  > "$Q/gencoco_churn0_ema9999.log" 2>&1
log "gencoco_churn0_ema9999 rc=$?"
echo COCO_HELDOUT_DONE >> "$Q/queue5.log"

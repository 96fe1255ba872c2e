#!/bin/bash
# Round-5 stretch: extend the generalization run 40k -> 80k steps (resumes
# from .quality/gen64/ckpt_resume @40k) and evaluate the final checkpoint
# at s_churn=0 — pushing the held-out metrics toward their iid ceilings
# with the measured topology lever applied.
cd /root/repo || exit 1
Q=/root/repo/.quality
log() { echo "$1 $(date)" >> "$Q/queue5.log"; }
export DSG_SYNTH_CACHE_DIR=$Q/synth_cache
GEN_ENV="QUALITY_DIR=$Q/gen64 QUALITY_CONFIG=vg QUALITY_MAX_NODES=64 \
QUALITY_HELDOUT=1 QUALITY_NUM_TRAIN=8192 QUALITY_NUM_TEST=512 \
QUALITY_POP_NODE_ALPHA=0.02 QUALITY_POP_EDGE_ALPHA=0.05"

env $GEN_ENV QUALITY_STEPS=80000 QUALITY_EVAL_EVERY=8000 QUALITY_FUSE_STEPS=8 \
  timeout 12600 python scripts/train_quality_tpu.py >> "$Q/gen64_ext.log" 2>&1
log "gen64_extend rc=$?"

env $GEN_ENV EVAL_S_CHURN=0 \
  timeout 3000 python scripts/eval_ckpt_quality_tpu.py \
  > "$Q/gen64_80k_churn0.log" 2>&1
log "gen64_80k_churn0 rc=$?"
env $GEN_ENV EVAL_S_CHURN=0 EVAL_EMA_IDX=1 \
  timeout 3000 python scripts/eval_ckpt_quality_tpu.py \
  > "$Q/gen64_80k_churn0_ema9999.log" 2>&1
log "gen64_80k_churn0_ema9999 rc=$?"
echo EXTEND_DONE >> "$Q/queue5.log"

#!/bin/bash
# Round-4 TPU job queue: chained single-tenant jobs (one TPU process at a
# time — CLAUDE.md).  Launch detached:  setsid bash scripts/round4_tpu_queue.sh
# Waits for the in-flight COCO N=40 quality run, then runs the
# conditional-completion quality evals (round-3 VERDICT item 4):
#   1. inpaint eval on the trained VG N=64 flagship ckpt (null regime:
#      halves independent -> expect cond == uncond + exact carry);
#   2. short alpha-clustered N=16 train (within-graph correlation);
#   3. inpaint eval on that ckpt (paired per-graph metrics: cond must win).
cd /root/repo || exit 1
Q=/root/repo/.quality
mkdir -p "$Q"

# -- wait for the COCO quality run (pid recorded by the launcher) --
if [ -f /tmp/coco.pid ]; then
  COCO=$(cat /tmp/coco.pid)
  while kill -0 "$COCO" 2>/dev/null; do sleep 20; done
fi
echo "coco done $(date)" >> "$Q/queue.log"

# -- 1. VG64 inpaint quality eval (same QUALITY_* env as the train run) --
QUALITY_DIR=$Q/vg64 QUALITY_MAX_NODES=64 QUALITY_CONFIG=vg \
DSG_SYNTH_CACHE_DIR=$Q/synth_cache \
  timeout 2400 python scripts/eval_inpaint_quality_tpu.py \
  > "$Q/inpaint_vg64.log" 2>&1
echo "inpaint_vg64 rc=$? $(date)" >> "$Q/queue.log"

# -- 2. alpha-clustered N=16 train (ckpt-only: skip floor evals) --
QUALITY_DIR=$Q/alpha16 QUALITY_MAX_NODES=16 QUALITY_CONFIG=vg \
QUALITY_STEPS=12000 QUALITY_EVAL_EVERY=12000 QUALITY_FUSE_STEPS=4 \
QUALITY_SYNTH_ALPHA=5.0 QUALITY_SKIP_INITIAL_EVALS=1 \
DSG_SYNTH_CACHE_DIR=$Q/synth_cache \
  timeout 3600 python scripts/train_quality_tpu.py \
  > "$Q/alpha16_train.log" 2>&1
echo "alpha16_train rc=$? $(date)" >> "$Q/queue.log"

# -- 3. alpha16 inpaint quality eval (clustered regime: cond should win) --
QUALITY_DIR=$Q/alpha16 QUALITY_MAX_NODES=16 QUALITY_CONFIG=vg \
QUALITY_SYNTH_ALPHA=5.0 DSG_SYNTH_CACHE_DIR=$Q/synth_cache \
  timeout 2400 python scripts/eval_inpaint_quality_tpu.py \
  > "$Q/inpaint_alpha16.log" 2>&1
echo "inpaint_alpha16 rc=$? $(date)" >> "$Q/queue.log"
echo ALL_DONE >> "$Q/queue.log"

#!/bin/bash
# Round-5 recovery queue: used when the TPU tunnel died mid-queue.
# Probes the backend until it answers (CLAUDE.md: outages can last hours;
# probe with a bounded jax.devices() and retry), then resumes the remaining
# jobs.  gen64 restarts from its last resume checkpoint automatically
# (QUALITY_DIR unchanged -> ckpt_resume @32k).
# Launch detached AFTER killing the original queue's process group:
#   setsid bash scripts/round5_tpu_queue2.sh
cd /root/repo || exit 1
Q=/root/repo/.quality
log() { echo "$1 $(date)" >> "$Q/queue5.log"; }
export DSG_SYNTH_CACHE_DIR=$Q/synth_cache

log "queue2 start: probing tunnel"
until timeout 120 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; do
  sleep 600
done
log "tunnel up"

# -- 1b. generalization run: resume to 40k --
QUALITY_DIR=$Q/gen64 QUALITY_CONFIG=vg QUALITY_MAX_NODES=64 \
QUALITY_HELDOUT=1 QUALITY_NUM_TRAIN=8192 QUALITY_NUM_TEST=512 \
QUALITY_POP_NODE_ALPHA=0.02 QUALITY_POP_EDGE_ALPHA=0.05 \
QUALITY_STEPS=40000 QUALITY_EVAL_EVERY=8000 QUALITY_FUSE_STEPS=8 \
  timeout 10800 python scripts/train_quality_tpu.py >> "$Q/gen64.log" 2>&1
log "gen64_resume rc=$?"

# -- 2. flagship convergence resume 36k -> 100k --
QUALITY_DIR=$Q/vg64 QUALITY_CONFIG=vg QUALITY_MAX_NODES=64 \
QUALITY_STEPS=100000 QUALITY_EVAL_EVERY=16000 QUALITY_FUSE_STEPS=4 \
  timeout 18000 python scripts/train_quality_tpu.py > "$Q/vg64_resume.log" 2>&1
log "vg64_resume rc=$?"

# -- 3. product-CLI train->eval cycle on the chip --
timeout 7200 bash scripts/round5_cli_cycle.sh > "$Q/cli_cycle.log" 2>&1
log "cli_cycle rc=$?"

# -- 4. bench telemetry captures (cold then warm artifact load) --
sync; echo 3 > /proc/sys/vm/drop_caches 2>/dev/null
timeout 1800 python bench.py > "$Q/bench_r5_cold.log" 2>&1
log "bench_cold rc=$?"
timeout 1200 python bench.py > "$Q/bench_r5_warm.log" 2>&1
log "bench_warm rc=$?"
echo ALL_DONE >> "$Q/queue5.log"

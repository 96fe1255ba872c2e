#!/bin/bash
# Real-TPU product-CLI cycle (round-4 VERDICT missing #2): the reference's
# deliverable workflow — `python train.py -c cfg.yaml` -> checkpoints ->
# `python eval.py -p <run>` -> artifact tree — executed through THIS repo's
# product entry points on the chip (Pallas on, bf16), not through scripts/.
# Reference: DiffuseSG/train.py:77-120, eval.py:80-101, README.md:46-76.
set -x
cd /root/repo || exit 1
Q=/root/repo/.quality/cli_cycle
mkdir -p "$Q"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
export DSG_SYNTH_CACHE_DIR=/root/repo/.quality/synth_cache

python - "$Q" <<'EOF'
import sys, yaml
q = sys.argv[1]
raw = yaml.safe_load(open("configs/edm_diffuse_sg_regular_visual_genome.yaml"))
raw["exp_dir"] = q + "/exp"
raw["dataset"]["subset"] = 512
raw["train"]["batch_size"] = 64
raw["train"]["max_epoch"] = 250          # 512/64 = 8 steps/epoch -> 2000 steps
raw["train"]["save_interval"] = 50
raw["train"]["sample_interval"] = 200    # one in-training sampling pass
raw["train"]["node_encoding"] = "bits"   # the reference's actual recipe
raw["train"]["edge_encoding"] = "bits"   # (README.md:62-76)
raw["train"]["iou_loss_type"] = "giou"
raw["test"]["batch_size"] = 64
raw["test"]["eval_size"] = 256
raw["mcmc"]["num_steps"] = 100
yaml.safe_dump(raw, open(q + "/cfg.yaml", "w"))
EOF

timeout 4800 python -m diffusesg_tpu.cli.train -c "$Q/cfg.yaml" \
  --data_root /nonexistent || exit 1

RUN=$(ls -dt "$Q"/exp/*/* | head -1)
echo "RUN_DIR=$RUN"
timeout 2400 python -m diffusesg_tpu.cli.eval -p "$RUN" \
  --data_root /nonexistent --ema_weights 0.999 --min_epoch 200 || exit 1

echo "==== artifact tree ===="
find "$Q/exp" -type f | sed "s|$Q/exp/||" | sort
echo "==== eval_results.csv ===="
cat $(find "$Q/exp" -name eval_results.csv | head -2)
echo CLI_CYCLE_OK

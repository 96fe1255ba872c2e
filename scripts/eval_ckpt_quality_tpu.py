"""Standalone full-metric eval of a quality-run checkpoint on TPU.

Loads `QUALITY_DIR/ckpt_final` (or ckpt_resume) under the same QUALITY_*
env the run used and evaluates one EMA track through sg_go_sampling —
useful for sampler-knob ablations on a trained model without retraining,
e.g. the churn ablation (BASELINE.md round-5 degree-MMD diagnostics):

  QUALITY_DIR=.quality/gen64 QUALITY_HELDOUT=1 ... EVAL_S_CHURN=0 \
    python scripts/eval_ckpt_quality_tpu.py

One TPU process at a time.  Prints one JSON row.
"""
import sys, os, json, logging
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.WARNING)
import jax, numpy as np
from quality_common import enable_compile_cache, load_quality_ckpt, quality_config
enable_compile_cache()
from diffusesg_tpu.data import load_data
from diffusesg_tpu.models import build_model
from diffusesg_tpu.sampling import get_mc_sampler
from diffusesg_tpu.sampling.orchestrator import sg_go_sampling

OUT = os.environ.get("QUALITY_DIR", "/tmp/quality")
EMA_IDX = int(os.environ.get("EVAL_EMA_IDX", 0))

cfg = quality_config(OUT)
with cfg.unlocked():
    cfg.mcmc.num_steps = int(os.environ.get("EVAL_STEPS", cfg.mcmc.num_steps))
    if os.environ.get("EVAL_S_CHURN") is not None:
        cfg.mcmc.s_churn = float(os.environ["EVAL_S_CHURN"])
bundle = load_data(cfg, data_root="/nonexistent")
model = build_model(cfg)
params, step, beta, ckpt = load_quality_ckpt(OUT, EMA_IDX)
sampler = get_mc_sampler(cfg)
m = sg_go_sampling(model, params, sampler, cfg, bundle, epoch=step // 1000)
row = {k: round(float(v), 4) for k, v in m.items()
       if not k.startswith("_") and isinstance(v, (int, float, np.floating))}
print(json.dumps({"tag": "ckpt_eval", "ckpt": ckpt, "ckpt_step": step,
                  "ema_beta": beta, "s_churn": sampler.S_churn, **row}),
      flush=True)

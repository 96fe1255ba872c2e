"""Real-TPU check of the serving subsystem.

Verifies that jax.export round-trips the FULL VG sampler — including the
Pallas v3 Swin kernels (tpu_custom_call) — and that the served results
match the live-jitted path bit-exactly.  Short schedule (8 steps) to keep
the program under the tunnel watchdog; the compiled artifact embeds the
same per-eval compute as the headline config.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
from diffusesg_tpu.config import load_config
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params
from diffusesg_tpu.sampling import get_mc_sampler
from diffusesg_tpu.serving.export import (export_sampler, load_artifact,
                                          make_serving_fn, save_artifact)

B = int(os.environ.get("BENCH_BATCH", 8))
cfg = load_config("configs/edm_diffuse_sg_regular_visual_genome.yaml")
with cfg.unlocked():
    cfg.tpu.compute_dtype = "bfloat16"
    cfg.tpu.use_pallas_attention = True
    cfg.mcmc.num_steps = 8

model = build_model(cfg)
params = init_params(model, cfg, jax.random.PRNGKey(0))
sampler = get_mc_sampler(cfg)
serve_fn = make_serving_fn(model, params, sampler, cfg)
N = cfg.dataset.max_node_num
flags = np.zeros((B, N), bool)
flags[:, :40] = True

t0 = time.time()
ref = jax.jit(serve_fn)(np.int32(3), flags)
ref = [np.asarray(r) for r in ref]
print(f"live path ok ({time.time()-t0:.1f}s incl. compile)", flush=True)

t0 = time.time()
exported = export_sampler(model, params, sampler, cfg, batch_size=B)
save_artifact("/tmp/dsg_artifact", exported, cfg, B)
sz = os.path.getsize("/tmp/dsg_artifact/sampler.bin")
print(f"exported in {time.time()-t0:.1f}s, artifact {sz/1e6:.1f} MB", flush=True)

loaded, meta = load_artifact("/tmp/dsg_artifact")
t0 = time.time()
got = [np.asarray(r) for r in loaded(np.int32(3), flags)]
print(f"artifact run {time.time()-t0:.1f}s (incl. compile)", flush=True)
for r, g, name in zip(ref, got, ["adj", "node", "bbox"]):
    if not np.array_equal(r, g):
        print(f"MISMATCH in {name}: max abs diff",
              np.max(np.abs(r.astype(np.float64) - g.astype(np.float64))))
        sys.exit(1)
print("platforms:", meta["platforms"])
print("SERVING_TPU_OK")

"""COCO full-forward on TPU: fused Pallas vs XLA, parity + scan-amortized
timing (per-dispatch overhead through the tunneled backend is milliseconds,
so sequential-dispatch timing is unreliable)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from diffusesg_tpu.config import load_config
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params

cfg = load_config('configs/edm_diffuse_sg_regular_coco.yaml')
with cfg.unlocked():
    cfg.tpu.compute_dtype = 'bfloat16'
B, N = 64, 40
rs = np.random.RandomState(0)
adj = jnp.asarray(rs.randn(B, N, N).astype(np.float32))
node = jnp.asarray(rs.randn(B, N, 5).astype(np.float32))
flags = jnp.ones((B, N), dtype=bool)

params = None
outs = {}
for pallas in [False, True]:
    with cfg.unlocked():
        cfg.tpu.use_pallas_attention = pallas
    model = build_model(cfg)
    if params is None:
        params = init_params(model, cfg, jax.random.PRNGKey(0))

    def fwd(a, x):
        return model.apply(params, a, x, flags, jnp.zeros((B,)))

    @jax.jit
    def loop(a, x):
        def body(c, _):
            da, dx = fwd(*c)
            return (da, dx), ()
        out, _ = jax.lax.scan(body, (a, x), None, length=20)
        return out

    r = jax.jit(fwd)(adj, node)
    outs[pallas] = (np.asarray(r[0]), np.asarray(r[1]))
    o = loop(adj, node)
    jax.block_until_ready(o)
    _ = float(np.asarray(o[0][0, 0, 0]))
    t0 = time.time()
    o = loop(adj, node)
    jax.block_until_ready(o)
    _ = float(np.asarray(o[0][0, 0, 0]))
    print(f'coco forward pallas={pallas}: {(time.time()-t0)/20*1000:.2f} ms',
          flush=True)

err = max(np.abs(outs[True][0] - outs[False][0]).max(),
          np.abs(outs[True][1] - outs[False][1]).max())
print(f'coco pallas-vs-xla max err {err:.5f}', flush=True)

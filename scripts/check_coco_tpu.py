import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from diffusesg_tpu.config import load_config
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params

cfg = load_config('configs/edm_diffuse_sg_regular_coco.yaml')
with cfg.unlocked():
    cfg.tpu.compute_dtype = 'bfloat16'
for pallas in [False, True]:
    with cfg.unlocked():
        cfg.tpu.use_pallas_attention = pallas
    model = build_model(cfg)
    if not pallas:
        params = init_params(model, cfg, jax.random.PRNGKey(0))
    B, N = 64, 40
    rs = np.random.RandomState(0)
    adj = jnp.asarray(rs.randn(B, N, N).astype(np.float32))
    node = jnp.asarray(rs.randn(B, N, 5).astype(np.float32))
    flags = jnp.ones((B, N), dtype=bool)
    f = jax.jit(lambda a, x: model.apply(params, a, x, flags, jnp.zeros((B,))))
    r = f(adj, node); _ = np.asarray(r[0][0, 0, :2])
    t0 = time.time()
    for _ in range(10): r = f(adj, node)
    _ = np.asarray(r[0][0, 0, :2])
    print(f'coco pallas={pallas}: {(time.time()-t0)/10*1000:.2f} ms', flush=True)
    if not pallas:
        ref_out = (np.asarray(r[0]), np.asarray(r[1]))
    else:
        err = max(np.abs(np.asarray(r[0]) - ref_out[0]).max(),
                  np.abs(np.asarray(r[1]) - ref_out[1]).max())
        print(f'coco pallas-vs-xla max err {err:.5f}', flush=True)

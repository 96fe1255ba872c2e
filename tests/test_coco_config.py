"""COCO-Stuff config coverage: window=10, depths (1,2,6), N=40 — exercises
the non-power-of-two window path (L=100) and a 3-stage U-Net with a
full-grid fallback at the deepest stage (reference config:
config/edm_diffuse_sg/edm_diffuse_sg_regular_coco.yaml)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full COCO model builds

from diffusesg_tpu.config import load_config
from diffusesg_tpu.models import build_model, count_params
from diffusesg_tpu.models.factory import init_params, example_inputs


@pytest.fixture(scope="module")
def coco_small():
    cfg = load_config("configs/edm_diffuse_sg_regular_coco.yaml")
    with cfg.unlocked():
        # shrink for CPU testing but keep the structural properties:
        # window 10, 3 stages, resolutions 20/10/5
        cfg.dataset.max_node_num = 20
        cfg.model.feature_dims = [48]
        cfg.model.depths = [1, 2]
        cfg.tpu.compute_dtype = "float32"
        cfg.tpu.use_pallas_attention = False
    return cfg


def test_coco_model_forward(coco_small):
    cfg = coco_small
    model = build_model(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    adj, node, flags, sigmas = example_inputs(cfg, 2)
    flags = flags.at[0, 15:].set(False)
    adj = jax.random.normal(jax.random.PRNGKey(1), adj.shape)
    node = jax.random.normal(jax.random.PRNGKey(2), node.shape)
    a_out, x_out = model.apply(params, adj, node, flags, jnp.log(sigmas) / 4)
    assert a_out.shape == adj.shape
    assert x_out.shape == node.shape
    f = np.asarray(flags)
    assert (np.asarray(a_out)[0][~(f[0][:, None] & f[0][None, :])] == 0).all()


def test_coco_full_config_builds():
    cfg = load_config("configs/edm_diffuse_sg_regular_coco.yaml")
    with cfg.unlocked():
        cfg.tpu.use_pallas_attention = False
        cfg.tpu.compute_dtype = "float32"
    model = build_model(cfg)
    # N=40, window 10; resolutions 40/20/10 with depths [1,2,6]
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    n = count_params(params)
    assert n > 10_000_000  # full-size model


def test_coco_gt_sampling(coco_small):
    from diffusesg_tpu.data import load_data
    from diffusesg_tpu.sampling import get_mc_sampler
    from diffusesg_tpu.sampling.orchestrator import sg_go_sampling
    cfg = coco_small
    with cfg.unlocked():
        cfg.exp_dir = "/tmp/coco_test"
        cfg.logdir = "/tmp/coco_test/run"
        cfg.dataset.subset = 8
        cfg.train.batch_size = 8
        cfg.test.batch_size = 8
        cfg.test.eval_size = 8
        cfg.mcmc.num_steps = 6
    bundle = load_data(cfg, data_root="/nonexistent")
    model = build_model(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    metrics = sg_go_sampling(model, params, get_mc_sampler(cfg), cfg, bundle,
                             epoch=0, sanity_check=True)
    assert metrics["node_type_mmd_gaussian"] < 1e-6
    assert metrics["edge_type_mmd_gaussian"] < 1e-6

"""End-to-end train+sample smoke tests for the ablation modes: bits/one_hot
encodings, binary_edge, node_only (reference configs' ablation surface)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # train+sample e2e per encoding (compile-bound)

from diffusesg_tpu.config import load_config
from diffusesg_tpu.data import load_data
from diffusesg_tpu.models import build_model
from diffusesg_tpu.models.factory import init_params
from diffusesg_tpu.sampling import get_mc_sampler
from diffusesg_tpu.sampling.orchestrator import sg_go_sampling
from diffusesg_tpu.train import (
    TrainStepConfig, create_train_state, make_optimizer, make_train_step,
    train_step_config_from,
)


def _cfg(tmp_path, **train_overrides):
    cfg = load_config("configs/vg_small_test.yaml")
    with cfg.unlocked():
        cfg.exp_dir = str(tmp_path)
        cfg.logdir = str(tmp_path)
        cfg.model_ckpt_dir = str(tmp_path / "models_ckpt")
        cfg.model_save_dir = str(tmp_path / "models")
        cfg.dataset.max_node_num = 8
        cfg.dataset.subset = 8
        cfg.train.batch_size = 8
        cfg.test.batch_size = 8
        cfg.test.eval_size = 8
        cfg.mcmc.num_steps = 6
        for k, v in train_overrides.items():
            setattr(cfg.train, k, v)
    return cfg


def _one_train_step(cfg):
    bundle = load_data(cfg, data_root="/nonexistent")
    model = build_model(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3, 1.0, 1)
    state = create_train_state(params, [0.9], opt)
    step = jax.jit(make_train_step(model.apply, opt, train_step_config_from(cfg)))
    adjs, nodes, flags = (jnp.asarray(bundle.train.adjs),
                          jnp.asarray(bundle.train.nodes),
                          jnp.asarray(bundle.train.node_flags))
    state, metrics = step(state, jax.random.PRNGKey(1), adjs, nodes, flags)
    assert np.isfinite(float(metrics["loss"]))
    return cfg, bundle, model, state


@pytest.mark.parametrize("encoding", ["bits", "one_hot"])
def test_encoding_train_and_sample(tmp_path, encoding):
    cfg = _cfg(tmp_path, node_encoding=encoding, edge_encoding=encoding)
    cfg, bundle, model, state = _one_train_step(cfg)
    metrics = sg_go_sampling(model, state.params, get_mc_sampler(cfg), cfg,
                             bundle, epoch=0, sanity_check=True)
    # GT-fed sampling must reproduce the dataset for every encoding
    assert metrics["node_type_mmd_gaussian"] < 1e-6
    assert metrics["edge_type_mmd_gaussian"] < 1e-6


@pytest.mark.parametrize("node_enc,edge_enc",
                         [("bits", "ddpm"), ("ddpm", "one_hot")])
def test_mixed_encodings(tmp_path, node_enc, edge_enc):
    """node_encoding != edge_encoding (reference keeps separate config keys
    and independent decode paths, sampler_node_adj.py:221-293)."""
    cfg = _cfg(tmp_path, node_encoding=node_enc, edge_encoding=edge_enc)
    cfg, bundle, model, state = _one_train_step(cfg)
    metrics = sg_go_sampling(model, state.params, get_mc_sampler(cfg), cfg,
                             bundle, epoch=0, sanity_check=True)
    assert metrics["node_type_mmd_gaussian"] < 1e-6
    assert metrics["edge_type_mmd_gaussian"] < 1e-6


def test_binary_edge_mode(tmp_path):
    cfg = _cfg(tmp_path, binary_edge=True)
    cfg, bundle, model, state = _one_train_step(cfg)
    metrics = sg_go_sampling(model, state.params, get_mc_sampler(cfg), cfg,
                             bundle, epoch=0, sanity_check=True)
    assert metrics["node_type_mmd_gaussian"] < 1e-6


def test_node_only_mode(tmp_path):
    cfg = _cfg(tmp_path, node_only=True)
    with cfg.unlocked():
        cfg.dataset.max_node_num = 6  # grid 6x6 >= 33 allowed nodes? 36 >= 33 ok
    cfg, bundle, model, state = _one_train_step(cfg)
    metrics = sg_go_sampling(model, state.params, get_mc_sampler(cfg), cfg,
                             bundle, epoch=0, sanity_check=True)
    assert metrics["node_type_mmd_gaussian"] < 1e-6

"""Invariant tests for the DiffuseSG flax model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusesg_tpu.config import load_config
from diffusesg_tpu.models import DiffuseSG, build_model, count_params
from diffusesg_tpu.models.factory import init_params, example_inputs
from diffusesg_tpu.models.layers import (
    window_partition, window_reverse, relative_position_index,
    shifted_window_attn_mask,
)


@pytest.fixture(scope="module")
def small_cfg():
    return load_config("configs/vg_small_test.yaml")


@pytest.fixture(scope="module")
def model_and_params(small_cfg):
    model = build_model(small_cfg)
    params = init_params(model, small_cfg, jax.random.PRNGKey(0))
    return model, params


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 5).astype(np.float32))
    w = window_partition(x, 8)
    assert w.shape == (2 * 4, 8, 8, 5)
    back = window_reverse(w, 8, 16, 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_properties():
    idx = relative_position_index(8)
    assert idx.shape == (64, 64)
    assert idx.min() >= 0 and idx.max() < 15 * 15
    assert (np.diag(idx) == idx[0, 0]).all()  # self-offset is constant


def test_shifted_window_mask():
    m = shifted_window_attn_mask(16, 16, 8, 4)
    assert m.shape == (4, 64, 64)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # the first (interior) window attends freely
    assert (m[0] == 0).all()


def test_forward_shapes_and_masking(small_cfg, model_and_params):
    model, params = model_and_params
    adj, node, flags, sigmas = example_inputs(small_cfg, 2)
    flags = flags.at[0, 10:].set(False)
    adj = jax.random.normal(jax.random.PRNGKey(1), adj.shape)
    node = jax.random.normal(jax.random.PRNGKey(2), node.shape)
    a_out, x_out = model.apply(params, adj, node, flags, jnp.log(sigmas) / 4)
    assert a_out.shape == adj.shape
    assert x_out.shape == node.shape
    f = np.asarray(flags)
    pair = f[:, :, None] & f[:, None, :]
    assert (np.asarray(a_out)[~pair] == 0).all()
    assert (np.asarray(x_out)[~f] == 0).all()


def test_symmetric_mode_output():
    model = DiffuseSG(img_size=8, patch_size=1, in_chans=3, embed_dim=48,
                      depths=(1,), num_heads=(3,), window_size=8,
                      out_chans_adj=1, out_chans_node=1, symmetric_noise=True)
    adj = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8))
    node = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
    flags = jnp.ones((2, 8), dtype=bool)
    params = model.init(jax.random.PRNGKey(0), adj, node, flags, jnp.zeros((2,)))
    a_out, _ = model.apply(params, adj, node, flags, jnp.zeros((2,)))
    a = np.asarray(a_out)
    np.testing.assert_allclose(a, a.transpose(0, 2, 1), atol=1e-6)


def test_self_conditioning_channels():
    model = DiffuseSG(img_size=8, patch_size=1, in_chans=6, embed_dim=48,
                      depths=(1,), num_heads=(3,), window_size=8,
                      out_chans_adj=1, out_chans_node=1, self_condition=True,
                      symmetric_noise=False)
    adj = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8))
    node = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 2))  # (1+4)//... C_x=2
    flags = jnp.ones((2, 8), dtype=bool)
    params = model.init(jax.random.PRNGKey(0), adj, node, flags, jnp.zeros((2,)))
    # None self-cond == explicit zeros self-cond
    a0, x0 = model.apply(params, adj, node, flags, jnp.zeros((2,)))
    a1, x1 = model.apply(params, adj, node, flags, jnp.zeros((2,)),
                         jnp.zeros_like(adj), jnp.zeros_like(node))
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1), atol=1e-6)
    # nonzero self-cond changes the output
    a2, _ = model.apply(params, adj, node, flags, jnp.zeros((2,)),
                        jnp.ones_like(adj), jnp.ones_like(node))
    assert not np.allclose(np.asarray(a0), np.asarray(a2))


def test_invalid_nodes_do_not_affect_valid_outputs(small_cfg, model_and_params):
    """Padding invariance: garbage in padded node slots must not leak into
    valid outputs (the point of all the masking)."""
    model, params = model_and_params
    adj, node, flags, sigmas = example_inputs(small_cfg, 1)
    flags = flags.at[0, 8:].set(False)
    rng = jax.random.PRNGKey(3)
    adj = jax.random.normal(rng, adj.shape)
    node = jax.random.normal(jax.random.PRNGKey(4), node.shape)
    from diffusesg_tpu.ops import mask_adjs, mask_nodes
    adj_m = mask_adjs(adj, flags)
    node_m = mask_nodes(node, flags)
    a1, x1 = model.apply(params, adj_m, node_m, flags, jnp.log(sigmas) / 4)
    # corrupt the padded region
    adj_bad = adj_m + 100.0 * (1 - np.asarray(mask_adjs(jnp.ones_like(adj), flags)))
    node_bad = node_m + 100.0 * (1 - np.asarray(mask_nodes(jnp.ones_like(node), flags)))
    a2, x2 = model.apply(params, jnp.asarray(adj_bad), jnp.asarray(node_bad), flags,
                         jnp.log(sigmas) / 4)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-4)


def test_param_count_reasonable(small_cfg, model_and_params):
    _, params = model_and_params
    n = count_params(params)
    assert 100_000 < n < 10_000_000

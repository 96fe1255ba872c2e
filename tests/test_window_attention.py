"""Fused Pallas window attention vs the XLA reference path (interpret mode
on the CPU harness; the same kernel compiles natively on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusesg_tpu.ops import window_attention as wa
from diffusesg_tpu.ops.window_attention import (
    fused_window_attention_qkhd, _attention_xla,
)


@pytest.fixture(autouse=True)
def _force_kernel_interpret():
    """Off-TPU the op now falls back to XLA; force the kernel (interpret
    mode) so these tests exercise the kernel itself."""
    wa.INTERPRET = True
    yield
    wa.INTERPRET = False


def _inputs(rs, nwb=16, nh=3, L=64, hd=32, with_mask=True, nw=8):
    q = jnp.asarray(rs.randn(nwb, nh, L, hd).astype(np.float32))
    k = jnp.asarray(rs.randn(nwb, nh, L, hd).astype(np.float32))
    v = jnp.asarray(rs.randn(nwb, nh, L, hd).astype(np.float32))
    rel_bias = jnp.asarray(rs.randn(nh, L, L).astype(np.float32) * 0.1)
    mask = None
    if with_mask:
        m = rs.choice([0.0, -100.0], size=(nw, L, L), p=[0.8, 0.2])
        mask = jnp.asarray(m.astype(np.float32))
    return q, k, v, rel_bias, mask


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_matches_xla(with_mask):
    rs = np.random.RandomState(0)
    q, k, v, rel_bias, mask = _inputs(rs, with_mask=with_mask)
    scale = 32 ** -0.5
    got = fused_window_attention_qkhd(q, k, v, rel_bias, mask, scale)
    expect = _attention_xla(q, k, v, rel_bias, mask, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5, rtol=1e-4)


def test_fused_odd_window_counts():
    # nW not divisible by 8 -> smaller tile fallback
    rs = np.random.RandomState(1)
    q, k, v, rel_bias, mask = _inputs(rs, nwb=12, nw=4, L=16, hd=16)
    got = fused_window_attention_qkhd(q, k, v, rel_bias, mask, 0.25)
    expect = _attention_xla(q, k, v, rel_bias, mask, 0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5, rtol=1e-4)


def test_fused_gradients_match_xla():
    rs = np.random.RandomState(2)
    q, k, v, rel_bias, mask = _inputs(rs, nwb=8, nw=4, L=16, hd=16)
    scale = 0.25

    def loss_fused(q, k, v, b):
        return (fused_window_attention_qkhd(q, k, v, b, mask, scale) ** 2).sum()

    def loss_xla(q, k, v, b):
        return (_attention_xla(q, k, v, b, mask, scale) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, rel_bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, rel_bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_model_with_pallas_matches_without():
    from diffusesg_tpu.models import DiffuseSG
    kw = dict(img_size=16, patch_size=1, in_chans=11, embed_dim=48,
              depths=(1, 1), num_heads=(3, 6), window_size=8,
              out_chans_adj=1, out_chans_node=5, symmetric_noise=False)
    m_xla = DiffuseSG(use_pallas=False, **kw)
    m_pal = DiffuseSG(use_pallas=True, **kw)
    rs = np.random.RandomState(3)
    adj = jnp.asarray(rs.randn(2, 16, 16).astype(np.float32))
    node = jnp.asarray(rs.randn(2, 16, 5).astype(np.float32))
    flags = jnp.ones((2, 16), dtype=bool)
    noise = jnp.asarray(rs.rand(2).astype(np.float32))
    params = m_xla.init(jax.random.PRNGKey(0), adj, node, flags, noise)
    a1, x1 = m_xla.apply(params, adj, node, flags, noise)
    a2, x2 = m_pal.apply(params, adj, node, flags, noise)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=5e-5, rtol=1e-4)

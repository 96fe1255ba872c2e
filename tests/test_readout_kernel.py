"""Fused readout-head kernel vs the XLA composition (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusesg_tpu.ops import readout_kernel as rk


def _case(n, c, hidden, out, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(n, c), jnp.float32)
    w1 = jnp.asarray(rs.randn(c, hidden) * c ** -0.5, jnp.float32)
    b1 = jnp.asarray(rs.randn(hidden) * 0.01, jnp.float32)
    w2 = jnp.asarray(rs.randn(hidden, out) * hidden ** -0.5, jnp.float32)
    b2 = jnp.asarray(rs.randn(out) * 0.01, jnp.float32)
    return x, w1, b1, w2, b2


# (n, c, hidden, out): adj head (out 1/2/26), node head (out 5/9/16...)
@pytest.mark.parametrize("n,c,hidden,out", [
    (4096, 96, 96, 1), (4096, 96, 96, 5), (2048, 128, 128, 26),
    (512, 96, 96, 16), (96, 64, 64, 3),
])
def test_fused_readout_matches_xla(n, c, hidden, out):
    args = _case(n, c, hidden, out)
    want = rk.readout_mlp_xla(*args)
    rk.INTERPRET = True
    try:
        got = rk._fwd_impl(*args)
    finally:
        rk.INTERPRET = False
    # tanh vs erf GELU: small systematic deviation
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=5e-3)


def test_fused_readout_grads():
    args = _case(256, 64, 64, 5)

    def loss_f(w1):
        a = list(args)
        a[1] = w1
        return jnp.sum(rk.fused_readout_mlp(*a) ** 2)

    def loss_x(w1):
        a = list(args)
        a[1] = w1
        return jnp.sum(rk.readout_mlp_xla(*a) ** 2)

    gf = jax.grad(loss_f)(args[1])
    gx = jax.grad(loss_x)(args[1])
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-5, atol=1e-5)

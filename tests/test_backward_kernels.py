"""Analytic backward kernels vs jax.grad through the XLA compositions
(interpret mode).  The forward kernels use tanh-GELU while the XLA
reference uses exact erf, so gradient tolerances are ~1e-3."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas backward kernels

from diffusesg_tpu.ops import mlp_block_kernel as mlpk


def _mlp_case(n, c, hidden, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(n, c), jnp.float32)
    g = jnp.asarray(rs.randn(c) * 0.1 + 1.0, jnp.float32)
    b = jnp.asarray(rs.randn(c) * 0.1, jnp.float32)
    w1 = jnp.asarray(rs.randn(c, hidden) * c ** -0.5, jnp.float32)
    b1 = jnp.asarray(rs.randn(hidden) * 0.01, jnp.float32)
    w2 = jnp.asarray(rs.randn(hidden, c) * hidden ** -0.5, jnp.float32)
    b2 = jnp.asarray(rs.randn(c) * 0.01, jnp.float32)
    return x, g, b, w1, b1, w2, b2


def test_legal_bwd_tiles_are_always_lowerable():
    """Every candidate tile must satisfy Pallas' block rule: sublanes % 8
    == 0 or block == array dim.  n=300 (odd COCO batch x 100 tokens) used
    to be halved to an illegal 150-row block (TPU lowering error)."""
    for n in [300, 100, 280, 512, 64, 24, 8, 4096, 1000]:
        for hidden in [384, 1536, 3072]:
            for t in mlpk._legal_bwd_tiles(n, hidden):
                assert (t % 8 == 0 and n % t == 0) or t == n, (n, hidden, t)
    # 300 has no multiple-of-8 divisor: whole-axis only (within budget)
    assert mlpk._legal_bwd_tiles(300, 384) == [300]
    assert mlpk._legal_bwd_tiles(300, 4096)[:1] != [300]  # over 4MB budget


@pytest.mark.parametrize("n,c,hidden", [(512, 96, 384), (256, 192, 768),
                                        (128, 384, 1536),
                                        (64, 768, 3072),  # export mode
                                        (300, 96, 384)])  # whole-axis tile
def test_mlp_bwd_kernel_matches_xla_grads(n, c, hidden):
    args = _mlp_case(n, c, hidden)
    x, g, b, w1, b1, w2, b2 = args
    ct = jnp.asarray(np.random.RandomState(1).randn(n, c), jnp.float32)

    def loss(x, g, b, w1, b1, w2, b2):
        # tanh-GELU composition: the kernel's exact math (the erf-vs-tanh
        # forward deviation is a separate, documented ~3e-3 approximation)
        h = mlpk._layer_norm(x.astype(jnp.float32), g, b)
        h = jnp.dot(h, w1) + b1
        h = jax.nn.gelu(h, approximate=True)
        out = x + jnp.dot(h, w2) + b2
        return jnp.sum(out * ct)

    want = jax.grad(loss, argnums=tuple(range(7)))(*args)

    mlpk.INTERPRET = True
    try:
        got = mlpk.mlp_bwd_call(x, g, b, w1, b1, w2, ct)
    finally:
        mlpk.INTERPRET = False
    assert got is not None
    # order: dx, dgamma, dbeta, dw1, db1, dw2, db2 vs grads (x,g,b,w1,b1,w2,b2)
    names = ["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"]
    for name, gk, gw in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gw), rtol=5e-3, atol=5e-3,
            err_msg=name)


def _tanh_mlp(y, g2, b2n, w1, b1, w2, b2):
    import diffusesg_tpu.ops.mlp_block_kernel as mk
    h = mk._layer_norm(y.astype(jnp.float32), g2, b2n)
    h = jnp.dot(h, w1) + b1
    h = jax.nn.gelu(h, approximate=True)
    return y + jnp.dot(h, w2) + b2


# subset of stage geometries: plain, shifted, multi-group, single-window
SWIN_BWD_SHAPES = [
    (2, 32, 32, 96, 3, 8, False),    # rp packing, G=3, n_grp=1
    (2, 16, 16, 128, 8, 8, True),    # shifted, n_grp=2 (G=4? hd=16 -> G=8)
    (4, 8, 8, 128, 4, 8, False),     # window covers grid: batch pairing
    (2, 20, 20, 64, 4, 10, False),   # COCO-like L=100
    (2, 8, 8, 768, 24, 8, False),    # VG deepest width: export-dqkv mode
    (2, 10, 10, 384, 12, 10, False),  # COCO 10x10: L=100 needs P=2 (sublane
                                      # alignment) + export mode
]


@pytest.mark.parametrize("b,h,w,c,nh,window,shifted", SWIN_BWD_SHAPES)
def test_swin_v3_analytic_bwd_matches_tanh_composition(b, h, w, c, nh,
                                                       window, shifted):
    from diffusesg_tpu.ops import swin_block_v3 as v3
    from diffusesg_tpu.ops.swin_block_kernel import swin_attn_block_xla
    from tests.test_swin_full_block import _case
    import diffusesg_tpu.ops.mlp_block_kernel as mk

    if shifted and min(h, w) <= window:
        pytest.skip("no shift when the window covers the grid")
    args = _case(b, h, w, c, nh, window, shifted)

    def ref(*a16):
        (x, ss, g1, b1n, wq, bq, wp, bp, rel, mask2,
         g2, b2n, w1, bb1, w2, bb2) = a16
        y = swin_attn_block_xla(x, ss, g1, b1n, wq, bq, wp, bp, rel,
                                args[9], num_heads=nh, window=window)
        out = _tanh_mlp(y.reshape(b, h * w, c), g2, b2n, w1, bb1, w2, bb2)
        return jnp.sum(out ** 2)

    def fused(*a16):
        return jnp.sum(v3.fused_swin_block_v3(*a16, nh, window) ** 2)

    argnums = (0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13, 14, 15)
    gr = jax.grad(ref, argnums=argnums)(*args)
    v3.INTERPRET = True
    mk.INTERPRET = True
    try:
        gf = jax.grad(fused, argnums=argnums)(*args)
    finally:
        v3.INTERPRET = False
        mk.INTERPRET = False
    names = ["x", "ss", "ln1_g", "ln1_b", "wqkv", "bqkv", "wproj", "bproj",
             "rel", "ln2_g", "ln2_b", "w1", "b1", "w2", "b2"]
    for name, a, bb in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_swin_v3_bwd_finite_under_extreme_score_spread():
    """Regression for the mid-training NaN: with one head's scores blown up
    (>87 above the others), forward AND gradients must stay finite — the
    per-head softmax max guarantees every head's denominator >= 1."""
    from diffusesg_tpu.ops import swin_block_v3 as v3
    from tests.test_swin_full_block import _case
    import diffusesg_tpu.ops.mlp_block_kernel as mk

    b, h, w, c, nh, window = 2, 16, 16, 64, 2, 8
    args = list(_case(b, h, w, c, nh, window, shifted=False))
    wqkv = np.array(args[4])
    wqkv[:, : c // 2] *= 500.0  # head 0 q-scale blow-up
    args[4] = jnp.asarray(wqkv)

    def loss(x, wq):
        a = list(args)
        a[0], a[4] = x, wq
        return jnp.sum(v3.fused_swin_block_v3(*a, nh, window) ** 2)

    v3.INTERPRET = True
    mk.INTERPRET = True
    try:
        val, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(
            args[0], args[4])
    finally:
        v3.INTERPRET = False
        mk.INTERPRET = False
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(gx, np.float32)).all()
    assert np.isfinite(np.asarray(gw, np.float32)).all()


def test_fused_mlp_block_custom_vjp_uses_kernel_in_interpret():
    n, c, hidden = 256, 96, 384
    x, g, b, w1, b1, w2, b2 = _mlp_case(n, c, hidden)
    x3 = x.reshape(2, n // 2, c)

    def loss_fused(w1_):
        return jnp.sum(mlpk.fused_mlp_block(x3, g, b, w1_, b1, w2, b2) ** 2)

    def loss_xla(w1_):
        h = mlpk._layer_norm(x3.astype(jnp.float32), g, b)
        h = jnp.dot(h, w1_) + b1
        h = jax.nn.gelu(h, approximate=True)
        return jnp.sum((x3 + jnp.dot(h, w2) + b2) ** 2)

    mlpk.INTERPRET = True
    try:
        gf = jax.grad(loss_fused)(w1)
    finally:
        mlpk.INTERPRET = False
    gx = jax.grad(loss_xla)(w1)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=5e-3, atol=5e-3)


def test_readout_bwd_differentiates_the_tanh_forward():
    """The kernel forward is tanh-GELU; its custom_vjp must differentiate the
    SAME (tanh) function, not exact erf — strict tolerance catches a mixed
    fwd/bwd pair that the looser kernel-vs-kernel tests would mask."""
    from diffusesg_tpu.ops import readout_kernel as rok

    rs = np.random.RandomState(3)
    n, c, hidden, out = 64, 96, 256, 5
    x = jnp.asarray(rs.randn(n, c), jnp.float32)
    w1 = jnp.asarray(rs.randn(c, hidden) * c ** -0.5, jnp.float32)
    b1 = jnp.asarray(rs.randn(hidden) * 0.01, jnp.float32)
    w2 = jnp.asarray(rs.randn(hidden, out) * hidden ** -0.5, jnp.float32)
    b2 = jnp.asarray(rs.randn(out) * 0.01, jnp.float32)

    def loss_fused(w1_):
        return jnp.sum(rok.fused_readout_mlp(x, w1_, b1, w2, b2) ** 2)

    def loss_tanh(w1_):
        return jnp.sum(rok.readout_mlp_xla(x, w1_, b1, w2, b2,
                                           approximate=True) ** 2)

    def loss_erf(w1_):
        return jnp.sum(rok.readout_mlp_xla(x, w1_, b1, w2, b2,
                                           approximate=False) ** 2)

    rok.INTERPRET = True
    try:
        gf = jax.grad(loss_fused)(w1)
    finally:
        rok.INTERPRET = False
    gt = jax.grad(loss_tanh)(w1)
    ge = jax.grad(loss_erf)(w1)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gt),
                               rtol=1e-5, atol=1e-6)
    # sanity: erf and tanh grads genuinely differ at this tolerance,
    # so the assert above is discriminating
    assert np.abs(np.asarray(gt) - np.asarray(ge)).max() > 1e-5


def test_swin_full_block_bwd_differentiates_the_tanh_forward():
    """fused_swin_block's vjp goes through swin_block_xla; it must pick the
    tanh MLP half whenever the kernel (tanh) produced the forward value."""
    from diffusesg_tpu.ops import swin_full_block as sfb

    rs = np.random.RandomState(5)
    b, h, w, c, nh, window = 1, 8, 8, 32, 2, 4
    hidden = 4 * c
    L = window * window
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    ss = jnp.asarray(rs.randn(b, 2 * c) * 0.1, jnp.float32)
    ln1_g = jnp.ones(c); ln1_b = jnp.zeros(c)
    wqkv = jnp.asarray(rs.randn(c, 3 * c) * c ** -0.5, jnp.float32)
    bqkv = jnp.zeros(3 * c)
    wproj = jnp.asarray(rs.randn(c, c) * c ** -0.5, jnp.float32)
    bproj = jnp.zeros(c)
    rel = jnp.asarray(rs.randn(nh, L, L) * 0.02, jnp.float32)
    ln2_g = jnp.ones(c); ln2_b = jnp.zeros(c)
    w1 = jnp.asarray(rs.randn(c, hidden) * c ** -0.5, jnp.float32)
    b1 = jnp.zeros(hidden)
    w2 = jnp.asarray(rs.randn(hidden, c) * hidden ** -0.5, jnp.float32)
    b2 = jnp.zeros(c)

    def loss_fused(w1_):
        return jnp.sum(sfb.fused_swin_block(
            x, ss, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj, rel, None,
            ln2_g, ln2_b, w1_, b1, w2, b2, nh, window) ** 2)

    def loss_tanh(w1_):
        return jnp.sum(sfb.swin_block_xla(
            x, ss, ln1_g, ln1_b, wqkv, bqkv, wproj, bproj, rel, None,
            ln2_g, ln2_b, w1_, b1, w2, b2, nh, window,
            approximate=True) ** 2)

    sfb.INTERPRET = True
    mlpk.INTERPRET = True
    try:
        gf = jax.grad(loss_fused)(w1)
    finally:
        sfb.INTERPRET = False
        mlpk.INTERPRET = False
    gt = jax.grad(loss_tanh)(w1)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gt),
                               rtol=1e-4, atol=1e-5)

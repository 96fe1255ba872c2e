"""Fully-fused Swin block kernel (block-diagonal head-group attention +
in-kernel MLP) vs the XLA reference composition, in Pallas interpret mode on
CPU — validates the v2 kernel's packing logic (multi-row tiles, head groups,
block-diag scratch, fused/unfused MLP) for every VG and COCO stage shape."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode fused Swin block kernels

from diffusesg_tpu.ops import swin_full_block as sfb
from diffusesg_tpu.ops import mlp_block_kernel as mlpk
from diffusesg_tpu.ops.swin_full_block import _head_group, _plan


def _case(b, h, w, c, nh, window, shifted, hidden_ratio=4, seed=0):
    rs = np.random.RandomState(seed)
    L = window * window
    hidden = hidden_ratio * c
    x = rs.randn(b, h, w, c).astype(np.float32)
    ss = rs.randn(b, 2 * c).astype(np.float32) * 0.1
    g1 = rs.randn(c).astype(np.float32) * 0.1 + 1.0
    b1n = rs.randn(c).astype(np.float32) * 0.1
    wqkv = rs.randn(c, 3 * c).astype(np.float32) * (c ** -0.5)
    bqkv = rs.randn(3 * c).astype(np.float32) * 0.01
    wproj = rs.randn(c, c).astype(np.float32) * (c ** -0.5)
    bproj = rs.randn(c).astype(np.float32) * 0.01
    rel = rs.randn(nh, L, L).astype(np.float32) * 0.05
    g2 = rs.randn(c).astype(np.float32) * 0.1 + 1.0
    b2n = rs.randn(c).astype(np.float32) * 0.1
    w1 = rs.randn(c, hidden).astype(np.float32) * (c ** -0.5)
    bb1 = rs.randn(hidden).astype(np.float32) * 0.01
    w2 = rs.randn(hidden, c).astype(np.float32) * (hidden ** -0.5)
    bb2 = rs.randn(c).astype(np.float32) * 0.01
    mask = None
    if shifted:
        from diffusesg_tpu.models.layers import shifted_window_attn_mask
        mask = jnp.asarray(shifted_window_attn_mask(h, w, window, window // 2))
    return tuple(jnp.asarray(a) for a in
                 (x, ss, g1, b1n, wqkv, bqkv, wproj, bproj, rel)) + (mask,) + \
        tuple(jnp.asarray(a) for a in (g2, b2n, w1, bb1, w2, bb2))


# (b, h, w, c, heads, window): stage shapes of both shipped configs,
# scaled-down c where possible for test speed but same packing geometry
STAGE_SHAPES = [
    (2, 64, 64, 96, 3, 8),     # VG stage 0: rp row packing, G=3
    (4, 32, 32, 96, 6, 8),     # VG stage 1 (c scaled): G=6
    (4, 16, 16, 128, 4, 8),    # VG stage 2-like
    (8, 8, 8, 128, 4, 8),      # VG deepest: full-grid window, rb packing
    (8, 10, 10, 128, 4, 10),   # COCO deepest: L=100, single window
    (4, 20, 20, 64, 4, 10),    # COCO mid: 2x2 windows
    (2, 16, 16, 768, 24, 8),   # VG deepest true width: G=8, MLP unfused
    (2, 40, 40, 96, 3, 10),    # COCO stage 0 exact channels
    (2, 10, 10, 384, 12, 10),  # COCO deepest exact channels: n_grp=2
]


@pytest.mark.parametrize("b,h,w,c,nh,window", STAGE_SHAPES)
@pytest.mark.parametrize("shifted", [False, True])
def test_fused_swin_block_matches_xla(b, h, w, c, nh, window, shifted):
    if shifted and min(h, w) <= window:
        pytest.skip("no shift when the window covers the grid")
    args = _case(b, h, w, c, nh, window, shifted)
    want = sfb.swin_block_xla(*args, num_heads=nh, window=window)
    sfb.INTERPRET = True
    mlpk.INTERPRET = True
    try:
        got = sfb._fwd_impl(*args, num_heads=nh, window=window)
    finally:
        sfb.INTERPRET = False
        mlpk.INTERPRET = False
    # in-kernel GELU is the tanh approximation (Mosaic has no erf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=5e-3)


def test_head_group_sizes():
    # hd = 32 for every shipped config: G*32 <= 256 lanes
    assert _head_group(3, 32) == 3
    assert _head_group(6, 32) == 6
    assert _head_group(12, 32) == 6
    assert _head_group(24, 32) == 8


def test_plan_vg_stages():
    # VG full config at bench batch 64: every stage must multi-pack
    rb, rp, G, fuse = _plan(64, 64, 64, 96, 8, 3, 384)
    assert rp >= 2 and fuse                        # stage 0 packs rows
    rb, rp, G, fuse = _plan(64, 8, 8, 768, 8, 24, 3072)
    assert rb >= 4 and not fuse                    # stage 3 packs batch,
    #                                                MLP weights too big
    for res, c, nh in [(64, 96, 3), (32, 192, 6), (16, 384, 12), (8, 768, 24)]:
        rb, rp, G, fuse = _plan(64, res, res, c, 8, nh, 4 * c)
        assert rb >= 1 and rp >= 1 and G >= 1
        assert 64 % rb == 0 and (res // 8) % rp == 0
        assert rb * rp * 8 * res <= 4096  # token-tile cap the plan promises


def test_gradients_flow_through_custom_vjp():
    """Backward recompute path: grads exist and match XLA-only grads."""
    b, h, w, c, nh, window = 2, 16, 16, 64, 4, 8
    args = _case(b, h, w, c, nh, window, shifted=False)

    def loss_fused(x, wqkv):
        a = list(args)
        a[0], a[4] = x, wqkv
        return jnp.sum(sfb.fused_swin_block(*a, nh, window) ** 2)

    def loss_xla(x, wqkv):
        a = list(args)
        a[0], a[4] = x, wqkv
        return jnp.sum(sfb.swin_block_xla(*a, num_heads=nh, window=window) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(args[0], args[4])
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(args[0], args[4])
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_x),
                               rtol=1e-5, atol=1e-5)

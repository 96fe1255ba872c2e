"""Fused Swin-attention / MLP half-block kernels vs their XLA references, in
Pallas interpret mode on CPU — validates the batch-packed kernel logic
(multiple batch elements per program; flattened batch*token MLP tiles) for
the shapes of every VG and COCO stage without TPU hardware."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode fused kernels

from diffusesg_tpu.ops import mlp_block_kernel as mlpk
from diffusesg_tpu.ops import swin_block_kernel as swink
from diffusesg_tpu.ops.swin_block_kernel import _pick_batch_pack


def _attn_case(b, h, w, c, nh, window, shifted, seed=0):
    rs = np.random.RandomState(seed)
    L = window * window
    x = rs.randn(b, h, w, c).astype(np.float32)
    ss = rs.randn(b, 2 * c).astype(np.float32) * 0.1
    g = rs.randn(c).astype(np.float32) * 0.1 + 1.0
    be = rs.randn(c).astype(np.float32) * 0.1
    wqkv = rs.randn(c, 3 * c).astype(np.float32) * (c ** -0.5)
    bqkv = rs.randn(3 * c).astype(np.float32) * 0.01
    wproj = rs.randn(c, c).astype(np.float32) * (c ** -0.5)
    bproj = rs.randn(c).astype(np.float32) * 0.01
    rel = rs.randn(nh, L, L).astype(np.float32) * 0.05
    mask = None
    if shifted:
        from diffusesg_tpu.models.layers import shifted_window_attn_mask
        mask = jnp.asarray(shifted_window_attn_mask(h, w, window, window // 2))
    return tuple(jnp.asarray(a) for a in
                 (x, ss, g, be, wqkv, bqkv, wproj, bproj, rel)) + (mask,)


# (b, h, w, c, heads, window): the stage shapes of both shipped configs
STAGE_SHAPES = [
    (4, 16, 16, 64, 4, 8),    # VG mid-stage-like (small c for test speed)
    (8, 8, 8, 128, 4, 8),     # VG deepest: full-grid window, rb-packing
    (8, 10, 10, 128, 4, 10),  # COCO deepest: L=100, single window
    (4, 20, 20, 64, 4, 10),   # COCO mid: 2x2 windows
]


@pytest.mark.parametrize("b,h,w,c,nh,window", STAGE_SHAPES)
@pytest.mark.parametrize("shifted", [False, True])
def test_fused_attn_block_matches_xla(b, h, w, c, nh, window, shifted):
    if shifted and min(h, w) <= window:
        pytest.skip("no shift when the window covers the grid")
    args = _attn_case(b, h, w, c, nh, window, shifted)
    want = swink.swin_attn_block_xla(*args, num_heads=nh, window=window)
    swink.INTERPRET = True
    try:
        got = swink._fwd_impl(*args, num_heads=nh, window=window)
    finally:
        swink.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("b,h,w,c,nh,window", STAGE_SHAPES)
def test_batch_pack_heuristic(b, h, w, c, nh, window):
    rb = _pick_batch_pack(b, window, w, c, nh, w // window)
    assert b % rb == 0 and rb >= 1
    # small grids must actually pack (the round-1 COCO regression)
    if window * w <= 128 and b >= 4:
        assert rb >= 2


@pytest.mark.parametrize("b,L,c,hidden", [
    (4, 64, 96, 384),     # VG deepest tokens
    (8, 100, 128, 512),   # COCO deepest: L=100 not 8-divisible alone
    (2, 256, 96, 384),
])
def test_fused_mlp_block_matches_xla(b, L, c, hidden):
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(b, L, c).astype(np.float32))
    g = jnp.asarray(rs.randn(c).astype(np.float32) * 0.1 + 1.0)
    be = jnp.asarray(rs.randn(c).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rs.randn(c, hidden).astype(np.float32) * (c ** -0.5))
    b1 = jnp.asarray(rs.randn(hidden).astype(np.float32) * 0.01)
    w2 = jnp.asarray(rs.randn(hidden, c).astype(np.float32) * (hidden ** -0.5))
    b2 = jnp.asarray(rs.randn(c).astype(np.float32) * 0.01)
    want = mlpk.mlp_block_xla(x, g, be, w1, b1, w2, b2)
    mlpk.INTERPRET = True
    try:
        got = mlpk._fwd_impl(x, g, be, w1, b1, w2, b2)
    finally:
        mlpk.INTERPRET = False
    # in-kernel GELU is the tanh approximation (Mosaic has no erf) — the XLA
    # reference uses exact erf, so compare at the approximation's tolerance
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=5e-3)

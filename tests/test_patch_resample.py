"""Fused PatchMerging/PatchBreakup kernels vs the XLA compositions in
interpret mode, for every stage boundary of the VG and COCO configs."""
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode patch merge/breakup kernels

from diffusesg_tpu.ops import patch_resample as pr


def _merge_case(b, h, w, c, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    g = jnp.asarray(rs.randn(4 * c) * 0.1 + 1.0, jnp.float32)
    bt = jnp.asarray(rs.randn(4 * c) * 0.1, jnp.float32)
    wred = jnp.asarray(rs.randn(4 * c, 2 * c) * (4 * c) ** -0.5, jnp.float32)
    return x, g, bt, wred


# (b, h, w, c): VG boundaries 64/32/16 and COCO 40/20
MERGE_SHAPES = [(2, 64, 64, 96), (4, 32, 32, 192), (8, 16, 16, 384),
                (2, 40, 40, 64), (4, 20, 20, 128)]


@pytest.mark.parametrize("b,h,w,c", MERGE_SHAPES)
def test_fused_patch_merge_matches_xla(b, h, w, c):
    x, g, bt, wred = _merge_case(b, h, w, c)
    want = pr.patch_merge_xla(x, g, bt, wred)
    pr.INTERPRET = True
    try:
        got = pr._merge_fwd_impl(x, g, bt, wred)
    finally:
        pr.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_merge_channel_order_matches_reference_gather():
    """The 4C concat order must be [x(0,0), x(1,0), x(0,1), x(1,1)]
    (reference diffusesg.py:313-320: k = wo*2 + ho)."""
    b, h, w, c = 1, 4, 4, 8
    x = jnp.asarray(np.arange(b * h * w * c).reshape(b, h, w, c), jnp.float32)
    g = jnp.ones((4 * c,))
    bt = jnp.zeros((4 * c,))
    wred = jnp.asarray(np.eye(4 * c)[:, : 2 * c], jnp.float32)
    # identity-ish projection exposes the pre-LN gather through LN monotonic..
    # instead compare the raw gather: reference composition
    ref = np.asarray(x).reshape(b, h // 2, 2, w // 2, 2, c)
    ref = ref.transpose(0, 1, 3, 4, 2, 5).reshape(b, h // 2, w // 2, 4 * c)
    got = np.asarray(pr.patch_merge_xla(x, g, bt, jnp.eye(4 * c)))
    # undo the LN analytically: same mean/var per position for both
    mean = ref.mean(-1, keepdims=True)
    var = ref.var(-1, keepdims=True)
    np.testing.assert_allclose(got, (ref - mean) / np.sqrt(var + 1e-6),
                               rtol=1e-4, atol=1e-4)


def _breakup_case(b, h, w, cin, dim, seed=0):
    rs = np.random.RandomState(seed)
    c_out = dim // 4
    x = jnp.asarray(rs.randn(b, h, w, cin), jnp.float32)
    w_in = jnp.asarray(rs.randn(cin, dim) * cin ** -0.5, jnp.float32)
    g1 = jnp.asarray(rs.randn(dim) * 0.1 + 1.0, jnp.float32)
    b1 = jnp.asarray(rs.randn(dim) * 0.1, jnp.float32)
    g2 = jnp.asarray(rs.randn(c_out) * 0.1 + 1.0, jnp.float32)
    b2 = jnp.asarray(rs.randn(c_out) * 0.1, jnp.float32)
    w_out = jnp.asarray(rs.randn(c_out, c_out) * c_out ** -0.5, jnp.float32)
    return x, w_in, g1, b1, g2, b2, w_out


# (b, h, w, cin, dim): skip-concat inputs at each VG up boundary + COCO
BREAKUP_SHAPES = [(8, 8, 8, 1536, 1536), (4, 16, 16, 768, 768),
                  (2, 32, 32, 384, 384), (4, 10, 10, 512, 512)]


@pytest.mark.parametrize("b,h,w,cin,dim", BREAKUP_SHAPES)
def test_fused_patch_breakup_matches_xla(b, h, w, cin, dim):
    args = _breakup_case(b, h, w, cin, dim)
    want = pr.patch_breakup_xla(*args)
    pr.INTERPRET = True
    try:
        got = pr._breakup_fwd_impl(*args)
    finally:
        pr.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_merge_then_breakup_roundtrip_shapes():
    b, h, w, c = 2, 16, 16, 64
    x, g, bt, wred = _merge_case(b, h, w, c)
    y = pr.patch_merge_xla(x, g, bt, wred)
    assert y.shape == (b, h // 2, w // 2, 2 * c)
    args = _breakup_case(b, h // 2, w // 2, 2 * c, 4 * (c // 2))
    z = pr.patch_breakup_xla(*args)
    assert z.shape == (b, h, w, c // 2)

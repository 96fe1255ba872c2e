"""v3 pair-packed Swin block kernel vs the XLA reference composition, in
Pallas interpret mode on CPU — validates pair M-packing, tile-and-mask
block-diag K/V, matmul-normalized softmax, and the in-kernel window reorder
for every VG and COCO stage geometry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas v3 kernels

from diffusesg_tpu.ops import swin_block_v3 as v3
from diffusesg_tpu.ops import mlp_block_kernel as mlpk
from diffusesg_tpu.ops.swin_block_v3 import _plan_v3
from tests.test_swin_full_block import _case, STAGE_SHAPES


@pytest.mark.parametrize("b,h,w,c,nh,window", STAGE_SHAPES)
@pytest.mark.parametrize("shifted", [False, True])
def test_v3_matches_xla(b, h, w, c, nh, window, shifted):
    if shifted and min(h, w) <= window:
        pytest.skip("no shift when the window covers the grid")
    args = _case(b, h, w, c, nh, window, shifted)
    want = v3.swin_block_xla(*args, num_heads=nh, window=window)
    v3.INTERPRET = True
    mlpk.INTERPRET = True
    try:
        got = v3._fwd_impl(*args, num_heads=nh, window=window)
    finally:
        v3.INTERPRET = False
        mlpk.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=5e-3)


def test_plan_v3_vg_stages():
    # batch 64, full VG config: every stage must pair-pack (P=2)
    for res, c, nh in [(64, 96, 3), (32, 192, 6), (16, 384, 12), (8, 768, 24)]:
        rb, rp, P, G, fuse = _plan_v3(64, res, res, c, 8, nh, 4 * c)
        assert P == 2, (res, c)
        assert 64 % rb == 0 and (res // 8) % max(rp, 1) == 0
    # deepest stage: MLP weights exceed VMEM -> unfused, batch-pair packing
    rb, rp, P, G, fuse = _plan_v3(64, 8, 8, 768, 8, 24, 3072)
    assert not fuse and rb >= 2


def test_v3_underflow_guard():
    """A head block >87 below the global row max must yield finite output."""
    b, h, w, c, nh, window = 2, 16, 16, 64, 2, 8
    args = list(_case(b, h, w, c, nh, window, shifted=False))
    # blow up head 0's Q scale so head 1's scores sit far below the row max
    wqkv = np.array(args[4])
    wqkv[:, : c // 2] *= 400.0
    args[4] = jnp.asarray(wqkv)
    v3.INTERPRET = True
    mlpk.INTERPRET = True
    try:
        got = v3._fwd_impl(*args, num_heads=nh, window=window)
    finally:
        v3.INTERPRET = False
        mlpk.INTERPRET = False
    assert np.isfinite(np.asarray(got, np.float32)).all()


def test_v3_gradients_flow_through_custom_vjp():
    b, h, w, c, nh, window = 2, 16, 16, 64, 4, 8
    args = _case(b, h, w, c, nh, window, shifted=False)

    def loss_fused(x, wqkv):
        a = list(args)
        a[0], a[4] = x, wqkv
        return jnp.sum(v3.fused_swin_block_v3(*a, nh, window) ** 2)

    def loss_xla(x, wqkv):
        a = list(args)
        a[0], a[4] = x, wqkv
        return jnp.sum(v3.swin_block_xla(*a, num_heads=nh, window=window) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(args[0], args[4])
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(args[0], args[4])
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_x),
                               rtol=1e-5, atol=1e-5)


def test_plan_v3_exact_mask_accounting():
    """Round-4: the shifted-window mask tile is counted exactly and only for
    masked (shifted) blocks — no 4 MB allowance constant.  The shipped,
    chip-validated plans are unchanged under the exact model (re-verified on
    TPU, BASELINE.md round-4)."""
    # the only geometries that actually carry a mask in the shipped configs
    # (shift>0 exists only on odd block indices of the depth>1 stages):
    # VG 16x16/c384 and COCO 20x20/c192
    assert _plan_v3(64, 16, 16, 384, 8, 12, 1536, has_mask=True) == (1, 2, 2, 6, True)
    assert _plan_v3(64, 20, 20, 192, 10, 6, 768, has_mask=True) == (1, 2, 2, 6, True)
    # unmasked plans can never be smaller than masked ones (monotonicity:
    # the mask only ADDs VMEM)
    for b, r, c, w, nh in [(64, 64, 96, 8, 3), (64, 32, 192, 8, 6),
                           (64, 16, 384, 8, 12), (64, 40, 96, 10, 3),
                           (64, 20, 192, 10, 6), (128, 64, 96, 8, 3)]:
        pm = _plan_v3(b, r, r, c, w, nh, 4 * c, has_mask=True)
        pu = _plan_v3(b, r, r, c, w, nh, 4 * c, has_mask=False)
        assert pu[0] * pu[1] >= pm[0] * pm[1], (b, r, c)

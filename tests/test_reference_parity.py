"""Numerical parity vs the PyTorch reference model on identical weights.

Loads the reference denoiser (read-only at /root/reference), transfers its
weights into the flax DiffuseSG, and compares fp32 forward outputs.  This
validates every architectural detail at once: patch embed, noise affine,
window attention + relative position bias, shifted-window masks, patch
merging/breakup scatter order, skip wiring, readouts, masking, pooling.

The reference imports timm; only DropPath/to_2tuple/trunc_normal_ are used
(and drop_path_rate=0 in all shipped configs), so a minimal shim suffices.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/DiffuseSG"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

torch = pytest.importorskip("torch")


def _install_timm_shim():
    import itertools
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return tuple(itertools.repeat(x, 2)) if not isinstance(x, tuple) else x

    def trunc_normal_(tensor, std=1.0, mean=0.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(-2 * std, 2 * std)
        return tensor

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", models)
    sys.modules.setdefault("timm.models.layers", layers)


@pytest.fixture(scope="module")
def ref_module():
    _install_timm_shim()
    sys.path.insert(0, REF)
    import importlib
    mod = importlib.import_module("model.diffusesg.diffusesg")
    yield mod
    sys.path.remove(REF)


# The torch->flax weight mapping lives in the production import tool
# (utils/torch_import.py, used by cli/import_ckpt.py); these parity tests
# double as its fp32 cross-validation against the live reference model.
from diffusesg_tpu.utils.torch_import import state_dict_to_flax as _transfer  # noqa: E402


@pytest.mark.parametrize("self_condition", [False, True])
def test_forward_parity_small(ref_module, self_condition):
    import jax
    import jax.numpy as jnp
    from diffusesg_tpu.models import DiffuseSG

    torch.manual_seed(0)
    n, embed_dim, window = 16, 48, 8
    depths, heads = [1, 1], [3, 6]
    c_a, c_x = 3, 5
    in_chans = c_a + 2 * c_x

    ref = ref_module.DiffuseSG(
        img_size=n, patch_size=1, in_chans=in_chans, embed_dim=embed_dim,
        depths=depths, num_heads=heads, window_size=window, mlp_ratio=4.0,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
        out_chans_adj=c_a, out_chans_node=c_x,
        self_condition=self_condition, symmetric_noise=False).eval()
    sd = ref.state_dict()

    model = DiffuseSG(img_size=n, patch_size=1, in_chans=in_chans,
                      embed_dim=embed_dim, depths=tuple(depths),
                      num_heads=tuple(heads), window_size=window,
                      out_chans_adj=c_a, out_chans_node=c_x,
                      self_condition=self_condition, symmetric_noise=False)
    params = _transfer(sd, depths, patch_size=1)
    params = jax.tree.map(jnp.asarray, params)

    rs = np.random.RandomState(0)
    b = 2
    adj = rs.randn(b, n, n, c_a).astype(np.float32)
    node = rs.randn(b, n, c_x).astype(np.float32)
    flags = np.ones((b, n), dtype=bool)
    flags[0, 11:] = False
    noise = rs.rand(b).astype(np.float32)
    sc_a = rs.randn(b, n, n, c_a).astype(np.float32) if self_condition else None
    sc_x = rs.randn(b, n, c_x).astype(np.float32) if self_condition else None

    with torch.no_grad():
        ref_a, ref_x = ref(
            torch.from_numpy(adj).permute(0, 3, 1, 2),  # reference: [B, C, N, N]
            torch.from_numpy(node),
            torch.from_numpy(flags),
            torch.from_numpy(noise),
            torch.from_numpy(sc_a).permute(0, 3, 1, 2) if self_condition else None,
            torch.from_numpy(sc_x) if self_condition else None)
    got_a, got_x = model.apply(params, jnp.asarray(adj), jnp.asarray(node),
                               jnp.asarray(flags), jnp.asarray(noise),
                               jnp.asarray(sc_a) if self_condition else None,
                               jnp.asarray(sc_x) if self_condition else None)

    ref_a = ref_a.permute(0, 2, 3, 1).numpy() if ref_a.dim() == 4 else ref_a.numpy()
    np.testing.assert_allclose(np.asarray(got_a), ref_a, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_x), ref_x.numpy(), atol=2e-4, rtol=1e-3)


def test_precond_forward_parity(ref_module):
    """Full preconditioned denoiser evaluation D = c_skip*x + c_out*F vs the
    reference NodeAdjPrecond (reference: model/precond/precond.py:60-110),
    self-conditioning disabled for determinism."""
    import importlib
    import jax
    import jax.numpy as jnp
    from diffusesg_tpu.models import DiffuseSG
    from diffusesg_tpu.models.precond import precond_forward

    sys.path.insert(0, REF)
    try:
        precond_mod = importlib.import_module("model.precond.precond")
    finally:
        sys.path.remove(REF)

    torch.manual_seed(1)
    n, embed_dim, window = 16, 48, 8
    depths, heads = [1, 1], [3, 6]
    c_a, c_x = 1, 5
    in_chans = c_a + 2 * c_x
    ref_net = ref_module.DiffuseSG(
        img_size=n, patch_size=1, in_chans=in_chans, embed_dim=embed_dim,
        depths=depths, num_heads=heads, window_size=window,
        drop_path_rate=0.0, out_chans_adj=c_a, out_chans_node=c_x,
        self_condition=False, symmetric_noise=False).eval()
    ref_precond = precond_mod.NodeAdjPrecond(
        precond="edm", model=ref_net, self_condition=False,
        symmetric_noise=False).eval()

    model = DiffuseSG(img_size=n, patch_size=1, in_chans=in_chans,
                      embed_dim=embed_dim, depths=tuple(depths),
                      num_heads=tuple(heads), window_size=window,
                      out_chans_adj=c_a, out_chans_node=c_x,
                      self_condition=False, symmetric_noise=False)
    import jax.numpy as jnp
    params = _transfer(ref_net.state_dict(), depths, patch_size=1)
    params = jax.tree.map(jnp.asarray, params)

    rs = np.random.RandomState(3)
    b = 2
    adj = rs.randn(b, n, n).astype(np.float32)
    node = rs.randn(b, n, c_x).astype(np.float32)
    flags = np.ones((b, n), dtype=bool)
    flags[1, 9:] = False
    sigmas = np.asarray([0.3, 2.5], np.float32)

    with torch.no_grad():
        ref_a, ref_x = ref_precond(
            torch.from_numpy(adj), torch.from_numpy(node),
            torch.from_numpy(flags), torch.from_numpy(sigmas))

    def denoiser_fn(a, x, f, c_noise, sc_a, sc_x):
        return model.apply(params, a, x, f, c_noise, sc_a, sc_x)

    got_a, got_x = precond_forward(denoiser_fn, "edm", jnp.asarray(adj),
                                   jnp.asarray(node), jnp.asarray(flags),
                                   jnp.asarray(sigmas))
    np.testing.assert_allclose(np.asarray(got_a), ref_a.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_x), ref_x.numpy(), atol=2e-4, rtol=1e-3)

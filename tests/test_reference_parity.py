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


def _t2j(t):
    return np.asarray(t.detach().cpu().numpy())


def _dense(sd, prefix):
    return {"kernel": _t2j(sd[f"{prefix}.weight"]).T, "bias": _t2j(sd[f"{prefix}.bias"])}


def _dense_nobias(sd, prefix):
    return {"kernel": _t2j(sd[f"{prefix}.weight"]).T}


def _ln(sd, prefix):
    return {"scale": _t2j(sd[f"{prefix}.weight"]), "bias": _t2j(sd[f"{prefix}.bias"])}


def _mlp(sd, prefix):
    return {"fc1_kernel": _t2j(sd[f"{prefix}.fc1.weight"]).T,
            "fc1_bias": _t2j(sd[f"{prefix}.fc1.bias"]),
            "fc2_kernel": _t2j(sd[f"{prefix}.fc2.weight"]).T,
            "fc2_bias": _t2j(sd[f"{prefix}.fc2.bias"])}


def _swin_block(sd, prefix):
    return {
        "Dense_0": _dense(sd, f"{prefix}.affine"),
        "norm1_scale": _t2j(sd[f"{prefix}.norm1.weight"]),
        "norm1_bias": _t2j(sd[f"{prefix}.norm1.bias"]),
        "relative_position_bias_table": _t2j(sd[f"{prefix}.attn.relative_position_bias_table"]),
        "qkv_kernel": _t2j(sd[f"{prefix}.attn.qkv.weight"]).T,
        "qkv_bias": _t2j(sd[f"{prefix}.attn.qkv.bias"]),
        "proj_kernel": _t2j(sd[f"{prefix}.attn.proj.weight"]).T,
        "proj_bias": _t2j(sd[f"{prefix}.attn.proj.bias"]),
        "norm2_scale": _t2j(sd[f"{prefix}.norm2.weight"]),
        "norm2_bias": _t2j(sd[f"{prefix}.norm2.bias"]),
        "mlp_fc1_kernel": _t2j(sd[f"{prefix}.mlp.fc1.weight"]).T,
        "mlp_fc1_bias": _t2j(sd[f"{prefix}.mlp.fc1.bias"]),
        "mlp_fc2_kernel": _t2j(sd[f"{prefix}.mlp.fc2.weight"]).T,
        "mlp_fc2_bias": _t2j(sd[f"{prefix}.mlp.fc2.bias"]),
    }


def _basic_layer(sd, prefix, depth, has_down, has_up):
    out = {}
    if has_up:
        out["PatchBreakup_0"] = {
            "pre_kernel": _t2j(sd[f"{prefix}.upsample.pre_linear.weight"]).T,
            "norm1_scale": _t2j(sd[f"{prefix}.upsample.norm.weight"]),
            "norm1_bias": _t2j(sd[f"{prefix}.upsample.norm.bias"]),
            "norm2_scale": _t2j(sd[f"{prefix}.upsample.post_norm.weight"]),
            "norm2_bias": _t2j(sd[f"{prefix}.upsample.post_norm.bias"]),
            "post_kernel": _t2j(sd[f"{prefix}.upsample.post_linear.weight"]).T,
        }
    for i in range(depth):
        out[f"SwinBlock_{i}"] = _swin_block(sd, f"{prefix}.blocks.{i}")
    if has_down:
        out["PatchMerging_0"] = {
            "norm_scale": _t2j(sd[f"{prefix}.downsample.norm.weight"]),
            "norm_bias": _t2j(sd[f"{prefix}.downsample.norm.bias"]),
            "reduction_kernel": _t2j(sd[f"{prefix}.downsample.reduction.weight"]).T,
        }
    return out


def _transfer(sd, depths, patch_size):
    """torch state_dict -> flax params tree for DiffuseSG."""
    p = patch_size
    # patch_embed.proj: Conv2d [D, Cin, p, p] -> Dense [(p p Cin), D] in
    # feature order (kh, kw, cin) matching the space-to-depth flatten
    w = _t2j(sd["patch_embed.proj.weight"])  # [D, Cin, p, p]
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])
    params = {
        "patch_embed": {
            "Dense_0": {"kernel": kernel, "bias": _t2j(sd["patch_embed.proj.bias"])},
            "LayerNorm_0": _ln(sd, "patch_embed.norm"),
            "NoiseAffine_0": {"Dense_0": _dense(sd, "patch_embed.affine")},
        },
        "map_layer0": _dense(sd, "map_layer0"),
        "map_layer1": _dense(sd, "map_layer1"),
        "final_norm": _ln(sd, "norm"),
        "readout_adj_mlp": _mlp(sd, "readout_adj_mlp"),
        "readout_node_mlp": _mlp(sd, "readout_node_mlp"),
    }
    # read_out: ConvTranspose2d [Cin, Cout, p, p] -> Dense [Cin, (p p Cout)];
    # output feature order must be (kh, kw, cout) to match depth-to-space
    wt = _t2j(sd["read_out.0.weight"])  # [Cin, Cout, p, p]
    k0 = wt.transpose(0, 2, 3, 1).reshape(wt.shape[0], -1)
    b0 = np.tile(_t2j(sd["read_out.0.bias"]), p * p) if p > 1 else _t2j(sd["read_out.0.bias"])
    w1 = _t2j(sd["read_out.1.weight"])[:, :, 0, 0]
    w2 = _t2j(sd["read_out.2.weight"])[:, :, 0, 0]
    params["read_out"] = {
        "Dense_0": {"kernel": k0, "bias": b0},
        "Dense_1": {"kernel": w1.T, "bias": _t2j(sd["read_out.1.bias"])},
        "Dense_2": {"kernel": w2.T, "bias": _t2j(sd["read_out.2.bias"])},
    }
    L = len(depths)
    for i in range(L):
        params[f"down_layers_{i}"] = _basic_layer(
            sd, f"down_layers.{i}", depths[i], has_down=i < L - 1, has_up=False)
    for i in range(L):
        rest = L - i - 1
        params[f"up_layers_{i}"] = _basic_layer(
            sd, f"up_layers.{i}", depths[rest], has_down=False, has_up=i > 0)
    return {"params": params}


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

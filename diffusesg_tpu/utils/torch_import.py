"""Import PyTorch reference checkpoints into this framework.

The reference saves ``{'model': state_dict, 'config': dict, 'epoch',
'train_loss', 'test_loss', 'model_ema_beta_{beta:.4f}': state_dict x K}``
(reference: DiffuseSG/runner/trainer/trainer_utils.py:168-185), where the
state dicts belong to ``NodeAdjPrecond`` (denoiser weights under a
``model.`` prefix; a ``module.`` prefix is added under DDP/DP training,
reference: utils/sampling_utils.py:34-60).

This module converts those torch weights into the flax ``DiffuseSG``
parameter tree — the exact mapping is cross-validated at fp32 atol 2e-4
against the live reference model by ``tests/test_reference_parity.py``,
which uses these functions — and writes a complete orbax run directory
that ``cli/eval.py`` (and ``--resume`` training) consume directly.  A
user of the reference can bring any trained ``.pth`` (including the
published checkpoints) straight to TPU:

    python -m diffusesg_tpu.cli.import_ckpt visual_genome_00999.pth -o runs/imported

Only the conversion entry points require torch; the tree-mapping helpers
are pure numpy so the parity tests can drive them on raw state dicts.
"""
from __future__ import annotations

import logging
import os
import re
from typing import Any

import numpy as np


# ---------------------------------------------------------------------------
# state-dict -> flax tree mapping (numpy only)
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    """torch tensor or array-like -> numpy (no torch import needed)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _dense(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _mlp(sd, prefix):
    return {"fc1_kernel": _np(sd[f"{prefix}.fc1.weight"]).T,
            "fc1_bias": _np(sd[f"{prefix}.fc1.bias"]),
            "fc2_kernel": _np(sd[f"{prefix}.fc2.weight"]).T,
            "fc2_bias": _np(sd[f"{prefix}.fc2.bias"])}


def _swin_block(sd, prefix):
    return {
        "Dense_0": _dense(sd, f"{prefix}.affine"),
        "norm1_scale": _np(sd[f"{prefix}.norm1.weight"]),
        "norm1_bias": _np(sd[f"{prefix}.norm1.bias"]),
        "relative_position_bias_table": _np(sd[f"{prefix}.attn.relative_position_bias_table"]),
        "qkv_kernel": _np(sd[f"{prefix}.attn.qkv.weight"]).T,
        "qkv_bias": _np(sd[f"{prefix}.attn.qkv.bias"]),
        "proj_kernel": _np(sd[f"{prefix}.attn.proj.weight"]).T,
        "proj_bias": _np(sd[f"{prefix}.attn.proj.bias"]),
        "norm2_scale": _np(sd[f"{prefix}.norm2.weight"]),
        "norm2_bias": _np(sd[f"{prefix}.norm2.bias"]),
        "mlp_fc1_kernel": _np(sd[f"{prefix}.mlp.fc1.weight"]).T,
        "mlp_fc1_bias": _np(sd[f"{prefix}.mlp.fc1.bias"]),
        "mlp_fc2_kernel": _np(sd[f"{prefix}.mlp.fc2.weight"]).T,
        "mlp_fc2_bias": _np(sd[f"{prefix}.mlp.fc2.bias"]),
    }


def _basic_layer(sd, prefix, depth, has_down, has_up):
    out = {}
    if has_up:
        out["PatchBreakup_0"] = {
            "pre_kernel": _np(sd[f"{prefix}.upsample.pre_linear.weight"]).T,
            "norm1_scale": _np(sd[f"{prefix}.upsample.norm.weight"]),
            "norm1_bias": _np(sd[f"{prefix}.upsample.norm.bias"]),
            "norm2_scale": _np(sd[f"{prefix}.upsample.post_norm.weight"]),
            "norm2_bias": _np(sd[f"{prefix}.upsample.post_norm.bias"]),
            "post_kernel": _np(sd[f"{prefix}.upsample.post_linear.weight"]).T,
        }
    for i in range(depth):
        out[f"SwinBlock_{i}"] = _swin_block(sd, f"{prefix}.blocks.{i}")
    if has_down:
        out["PatchMerging_0"] = {
            "norm_scale": _np(sd[f"{prefix}.downsample.norm.weight"]),
            "norm_bias": _np(sd[f"{prefix}.downsample.norm.bias"]),
            "reduction_kernel": _np(sd[f"{prefix}.downsample.reduction.weight"]).T,
        }
    return out


def state_dict_to_flax(sd: dict, depths, patch_size: int) -> dict:
    """Raw DiffuseSG torch state_dict -> flax params tree ``{'params': ...}``.

    Layout conversions (torch stores [out, in] / NCHW, flax [in, out] / NHWC):
      * ``patch_embed.proj`` Conv2d [D, Cin, p, p] -> Dense [(p p Cin), D] in
        (kh, kw, cin) feature order, matching the model's space-to-depth
        flatten of the input patches.
      * ``read_out.0`` ConvTranspose2d [Cin, Cout, p, p] -> Dense
        [Cin, (p p Cout)] in (kh, kw, cout) order (depth-to-space output),
        bias tiled p*p times; the two 1x1 convs become plain Dense layers.
      * every Linear kernel transposed; LayerNorm weight/bias -> scale/bias.
    """
    p = patch_size
    w = _np(sd["patch_embed.proj.weight"])  # [D, Cin, p, p]
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])
    params = {
        "patch_embed": {
            "Dense_0": {"kernel": kernel, "bias": _np(sd["patch_embed.proj.bias"])},
            "LayerNorm_0": _ln(sd, "patch_embed.norm"),
            "NoiseAffine_0": {"Dense_0": _dense(sd, "patch_embed.affine")},
        },
        "map_layer0": _dense(sd, "map_layer0"),
        "map_layer1": _dense(sd, "map_layer1"),
        "final_norm": _ln(sd, "norm"),
        "readout_adj_mlp": _mlp(sd, "readout_adj_mlp"),
        "readout_node_mlp": _mlp(sd, "readout_node_mlp"),
    }
    wt = _np(sd["read_out.0.weight"])  # [Cin, Cout, p, p]
    k0 = wt.transpose(0, 2, 3, 1).reshape(wt.shape[0], -1)
    b0 = np.tile(_np(sd["read_out.0.bias"]), p * p) if p > 1 else _np(sd["read_out.0.bias"])
    w1 = _np(sd["read_out.1.weight"])[:, :, 0, 0]
    w2 = _np(sd["read_out.2.weight"])[:, :, 0, 0]
    params["read_out"] = {
        "Dense_0": {"kernel": k0, "bias": b0},
        "Dense_1": {"kernel": w1.T, "bias": _np(sd["read_out.1.bias"])},
        "Dense_2": {"kernel": w2.T, "bias": _np(sd["read_out.2.bias"])},
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


# ---------------------------------------------------------------------------
# reference checkpoint schema handling
# ---------------------------------------------------------------------------

def denoiser_state_dict(sd: dict) -> dict:
    """Strip the DDP ``module.`` and precond-wrapper ``model.`` prefixes down
    to raw DiffuseSG keys (reference key reconciliation:
    utils/sampling_utils.py:34-60).  A state dict already at denoiser level
    (carrying ``patch_embed.proj.weight``) passes through unchanged.
    """
    for prefix in ("module.", "model."):
        if "patch_embed.proj.weight" in sd:
            break
        stripped = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
        if stripped:
            sd = stripped
    if "patch_embed.proj.weight" not in sd:
        raise ValueError(
            "state dict does not look like a DiffuseSG denoiser (no "
            f"patch_embed.proj.weight); keys start with {sorted(sd)[:3]}")
    return sd


_EMA_KEY = re.compile(r"^model_ema_beta_([0-9.]+)$")


def ema_items(ckpt_data: dict) -> list[tuple[float, dict]]:
    """(beta, state_dict) pairs from the reference checkpoint, beta-ascending
    (the reference builds its EMA list over sorted(ema_coef),
    learning_utils.py:158-161)."""
    out = []
    for key, val in ckpt_data.items():
        m = _EMA_KEY.match(key)
        if m:
            out.append((float(m.group(1)), val))
    return sorted(out, key=lambda kv: kv[0])


def _check_like(template: dict, got: dict) -> None:
    """Tree-structure + leaf-shape check against a freshly initialized model."""
    import jax

    t_struct = jax.tree_util.tree_structure(template)
    g_struct = jax.tree_util.tree_structure(got)
    if t_struct != g_struct:
        t_paths = {jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_flatten_with_path(template)[0]}
        g_paths = {jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_flatten_with_path(got)[0]}
        raise ValueError(
            "imported checkpoint does not match the model built from the "
            f"config: missing={sorted(t_paths - g_paths)[:5]} "
            f"unexpected={sorted(g_paths - t_paths)[:5]}")
    bad = [(jax.tree_util.keystr(p), tuple(a.shape), tuple(b.shape))
           for (p, a), b in zip(jax.tree_util.tree_flatten_with_path(template)[0],
                                jax.tree_util.tree_leaves(got))
           if tuple(a.shape) != tuple(b.shape)]
    if bad:
        raise ValueError(f"imported leaf shapes differ from the model's: {bad[:5]}")


def config_from_ckpt(ckpt_data: dict):
    """Locked ConfigDict from the dict the reference embeds in every
    checkpoint (trainer_utils.py:172-175); flag_sg re-derived if absent
    (reference derives it under unlocked(), arg_parser.py:275-283)."""
    from ..config import ConfigDict

    cfg = ConfigDict(dict(ckpt_data["config"]))
    if "flag_sg" not in cfg:
        cfg.flag_sg = any(n in cfg.dataset.name
                          for n in ("visual_genome", "coco_stuff"))
    return cfg.lock()


def import_reference_checkpoint(ckpt_data: dict, config) -> dict:
    """Reference ``.pth`` payload -> our checkpoint payload.

    Returns ``{step, params, opt_state, ema_params, ema_betas, extra}`` with
    a FRESH optimizer state (the reference never stores one,
    learning_utils.py:95-98 restores weights only) and the K EMA weight sets
    stacked beta-ascending the way ``TrainState`` holds them.
    """
    import jax
    import jax.numpy as jnp

    from ..models import build_model
    from ..models.factory import init_params
    from ..train.train_state import make_optimizer

    depths = list(config.model.depths)
    patch = int(config.model.patch_size)

    model = build_model(config)
    template = init_params(model, config, jax.random.PRNGKey(0))

    params = state_dict_to_flax(denoiser_state_dict(ckpt_data["model"]), depths, patch)
    _check_like(template, params)
    params = jax.tree.map(jnp.asarray, params)

    emas = ema_items(ckpt_data)
    betas = [b for b, _ in emas]
    trees = []
    for beta, sd in emas:
        tree = state_dict_to_flax(denoiser_state_dict(sd), depths, patch)
        _check_like(template, tree)
        trees.append(tree)
    if trees:
        ema_params = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                                  *trees)
    else:  # no EMAs in the ckpt: empty [0, ...] stack, eval falls back to raw
        ema_params = jax.tree.map(
            lambda p: jnp.zeros((0,) + p.shape, p.dtype), params)

    epoch = int(ckpt_data.get("epoch", 0) or 0)
    optimizer = make_optimizer(config.train.lr_init, config.train.lr_dacey,
                               steps_per_epoch=1, weight_decay=config.train.weight_decay)
    # orbax StandardCheckpointer stores numeric leaves only — mark the
    # torch-reference provenance with a flag, not a string
    extra = {"epoch": epoch, "imported_from_torch": 1}
    for k in ("train_loss", "test_loss"):
        if k in ckpt_data and ckpt_data[k] is not None:
            extra[k] = float(ckpt_data[k])
    return {
        "step": jnp.zeros((), jnp.int32),
        "params": params,
        "opt_state": optimizer.init(params),
        "ema_params": ema_params,
        "ema_betas": jnp.asarray(betas, jnp.float32),
        "extra": extra,
    }


def write_imported_run_dir(ckpt_data: dict, config, out_dir: str) -> str:
    """Materialize a run directory ``cli/eval.py -p <out_dir>`` (and
    ``--resume``) consume: ``config.yaml`` + ``models_ckpt/<epoch>/``.
    Returns the checkpoint path."""
    import orbax.checkpoint as ocp

    from ..config import save_config

    payload = import_reference_checkpoint(ckpt_data, config)
    extra = payload.pop("extra")
    epoch = extra["epoch"]
    os.makedirs(out_dir, exist_ok=True)
    save_config(config, os.path.join(out_dir, "config.yaml"))
    ckpt_path = os.path.abspath(os.path.join(out_dir, "models_ckpt", str(epoch)))
    payload["extra"] = extra
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_path, payload, force=True)
    ckptr.wait_until_finished()
    logging.info("imported reference checkpoint -> %s (epoch %d, %d EMA sets)",
                 ckpt_path, epoch, int(np.asarray(payload["ema_betas"]).shape[0]))
    return ckpt_path


def load_reference_pth(path: str) -> dict:
    """torch.load a reference checkpoint on CPU (config is a plain dict,
    so weights_only-safe loading is not possible; the file is trusted user
    input, same as the reference's own torch.load, eval.py:49)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)

"""Model factory: config -> DiffuseSG module + init (reference:
DiffuseSG/utils/learning_utils.py:33-123 get_network / count_model_params)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .channels import get_node_adj_model_input_output_channels
from .diffusesg import DiffuseSG

# heads are fixed per stage in the reference factory (learning_utils.py:56)
FIXED_NUM_HEADS = (3, 6, 12, 24)


def build_model(config) -> DiffuseSG:
    """Build the flagship denoiser from a reference-style config."""
    if config.model.name != "diffuse_sg":
        raise ValueError(f"unknown model name {config.model.name}")
    in_chans, out_chans_adj, out_chans_node = get_node_adj_model_input_output_channels(config)
    feature_dims = config.model.get("feature_dims", [96])
    depths = tuple(config.model.depths)
    tpu_cfg = config.get("tpu", None)
    compute_dtype = jnp.float32
    use_pallas = False
    remat = False
    if tpu_cfg is not None:
        compute_dtype = jnp.dtype(tpu_cfg.get("compute_dtype", "float32"))
        use_pallas = bool(tpu_cfg.get("use_pallas_attention", False))
        remat = bool(tpu_cfg.get("remat", False))
    return DiffuseSG(
        img_size=config.dataset.max_node_num,
        patch_size=config.model.patch_size,
        in_chans=in_chans,
        embed_dim=feature_dims[-1],
        depths=depths,
        num_heads=FIXED_NUM_HEADS[:len(depths)],
        window_size=config.model.window_size,
        mlp_ratio=4.0,
        out_chans_adj=out_chans_adj,
        out_chans_node=out_chans_node,
        self_condition=config.train.self_cond,
        symmetric_noise=not config.flag_sg,
        dtype=compute_dtype,
        use_pallas=use_pallas,
        remat=remat,
    )


def example_inputs(config, batch_size: int = 2):
    """Zero-filled example inputs for model.init / shape checks."""
    from .channels import get_node_adj_num_type
    info = get_node_adj_num_type(config.dataset.name, config.flag_sg,
                                 config.train.node_encoding,
                                 flag_node_only=config.train.get("node_only", False),
                                 edge_encoding=config.train.edge_encoding)
    n = config.dataset.max_node_num
    c_a = info["in_chans_adj"]
    c_x = info["in_chans_node"] // 2
    adj = jnp.zeros((batch_size, n, n) if c_a == 1 else (batch_size, n, n, c_a))
    node = jnp.zeros((batch_size, n, c_x))
    flags = jnp.ones((batch_size, n), dtype=bool)
    sigmas = jnp.full((batch_size,), 0.5)
    return adj, node, flags, sigmas


def init_params(model: DiffuseSG, config, rng: jax.Array):
    adj, node, flags, sigmas = example_inputs(config)
    c_noise = jnp.log(sigmas) / 4.0
    return model.init(rng, adj, node, flags, c_noise)


def count_params(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))

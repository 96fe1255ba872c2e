"""DiffuseSG denoiser: Swin-Transformer U-Net over the N x N node-pair grid.

TPU-native flax implementation of the reference denoiser
(reference: DiffuseSG/model/diffusesg/diffusesg.py:587-830).  Differences are
layout-only (channels-last), not semantic:

  inputs:  adj   [B, N, N] or [B, N, N, C_a]   (reference: [B, C_a, N, N])
           node  [B, N]    or [B, N, C_x]
           node_flags [B, N] (or [B, N, N] in node-only mode)
           noise_labels [B]
           self-cond tensors with the same shapes as adj/node (or None)
  outputs: (adj_out, node_out) with out_chans squeezed when == 1,
           masked, and adj symmetrized when symmetric_noise.

The node features are tiled onto the grid as [node_i ; node_j] channel pairs
and concatenated with the adjacency channels, exactly like the reference
(diffusesg.py:797-802); channel order is [adj ; node_i ; node_j] to keep a
1:1 correspondence for parity checks.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masking import mask_adjs, mask_nodes, symmetrize
from .layers import (
    BasicLayer, Mlp, PatchEmbed, PositionalEmbedding, ReadOut, DENSE_KW,
)

NOISE_EMB_CHANNELS = 512


class DiffuseSG(nn.Module):
    """Joint node+adjacency denoiser (reference: diffusesg.py:587-830)."""
    img_size: int = 64
    patch_size: int = 1
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    out_chans_adj: int = 1
    out_chans_node: int = 1
    patch_norm: bool = True
    self_condition: bool = False
    symmetric_noise: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    remat: bool = False

    def setup(self):
        num_layers = len(self.depths)
        pres = self.img_size // self.patch_size
        self.patches_resolution = (pres, pres)
        in_chans = self.in_chans * 2 if self.self_condition else self.in_chans

        self.patch_embed = PatchEmbed(self.img_size, self.patch_size, self.embed_dim,
                                      self.patch_norm, dtype=self.dtype)

        down = []
        for i in range(num_layers):
            down.append(BasicLayer(
                dim=int(self.embed_dim * 2 ** i),
                input_resolution=(pres // 2 ** i, pres // 2 ** i),
                depth=self.depths[i], num_heads=self.num_heads[i],
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                downsample=i < num_layers - 1, upsample=False,
                dtype=self.dtype, use_pallas=self.use_pallas, remat=self.remat))
        self.down_layers = down

        up = []
        for i in range(num_layers):
            rest = num_layers - i - 1
            scale = 2 ** rest if i == 0 else 2 ** (rest + 1)
            up.append(BasicLayer(
                dim=int(self.embed_dim * 2 ** rest),
                input_resolution=(pres // scale, pres // scale),
                depth=self.depths[rest], num_heads=self.num_heads[rest],
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                downsample=False, upsample=i > 0,
                dtype=self.dtype, use_pallas=self.use_pallas, remat=self.remat))
        self.up_layers = up

        self.map_noise = PositionalEmbedding(self.embed_dim)
        self.map_layer0 = nn.Dense(NOISE_EMB_CHANNELS, dtype=self.dtype, **DENSE_KW)
        self.map_layer1 = nn.Dense(NOISE_EMB_CHANNELS, dtype=self.dtype, **DENSE_KW)

        self.final_norm = nn.LayerNorm(dtype=self.dtype)
        self.read_out = ReadOut(self.patch_size, self.embed_dim, dtype=self.dtype)
        self.readout_adj_mlp = Mlp(self.embed_dim, self.out_chans_adj,
                                   dtype=self.dtype, use_pallas=self.use_pallas)
        self.readout_node_mlp = Mlp(self.embed_dim, self.out_chans_node,
                                    dtype=self.dtype, use_pallas=self.use_pallas)

    def _forward_features(self, x, emb):
        """U-Net core over [B, H, W, C_in] (reference: diffusesg.py:739-763)."""
        x = self.patch_embed(x, emb)  # [B, L, D]
        skips = []
        for layer in self.down_layers:
            x = layer(x, emb)
            skips.append(x)
        for layer in self.up_layers:
            # the deepest layer's skip is popped and discarded (diffusesg.py:750-756)
            skip = skips.pop()
            if layer.upsample:
                x = jnp.concatenate([x, skip], axis=-1)
            x = layer(x, emb)
        x = self.final_norm(x)
        ph, pw = self.patches_resolution
        return self.read_out(x, ph, pw)  # [B, H, W, D]

    def __call__(self, adj, node, node_flags, noise_labels,
                 self_cond_adj=None, self_cond_node=None):
        flag_node_only = node_flags.ndim == 3

        # noise embedding MLP (reference: diffusesg.py:768-771)
        emb = self.map_noise(noise_labels)
        emb = nn.silu(self.map_layer0(emb.astype(self.dtype)))
        emb = nn.silu(self.map_layer1(emb))

        # canonicalize to channels-last with explicit channel axes
        if adj.ndim == 3:
            adj = adj[..., None]            # [B, N, N, 1]
        node = node.astype(jnp.float32)
        if node.ndim == 2:
            node = node[..., None]          # [B, N, 1]

        if self.self_condition:
            sc_a = jnp.zeros_like(adj) if self_cond_adj is None else (
                self_cond_adj[..., None] if self_cond_adj.ndim == 3 else self_cond_adj)
            sc_x = jnp.zeros_like(node) if self_cond_node is None else (
                self_cond_node[..., None] if self_cond_node.ndim == 2 else self_cond_node)
            adj = jnp.concatenate([sc_a, adj], axis=-1)
            node = jnp.concatenate([sc_x, node], axis=-1)

        n = node.shape[1]
        # tile node features onto the pair grid (reference: diffusesg.py:797-802)
        node_mat = jnp.broadcast_to(node[:, :, None, :], (node.shape[0], n, n, node.shape[-1]))
        node_mat_t = jnp.swapaxes(node_mat, 1, 2)
        node_cat = mask_adjs(jnp.concatenate([node_mat, node_mat_t], axis=-1), node_flags)

        x = jnp.concatenate([adj, node_cat], axis=-1).astype(self.dtype)
        shared = self._forward_features(x, emb)  # [B, N, N, D], model dtype
        # keep the readout pipeline in the compute dtype: upcasting here
        # costs a full [B,N,N,D] fp32 round-trip; outputs are cast below

        # per-entry adjacency readout (reference: diffusesg.py:805-809)
        adj_out = self.readout_adj_mlp(shared).astype(jnp.float32)
        if self.out_chans_adj == 1:
            adj_out = adj_out[..., 0]

        # padding-aware pooled node readout (reference: diffusesg.py:812-818):
        # mask invalid pairs, mean over the column axis (full N divisor, as in
        # the reference's masked .mean(dim=-1)); fp32 accumulation
        shared_masked = mask_adjs(shared, node_flags)
        node_feat = jnp.mean(shared_masked, axis=2,
                             dtype=jnp.float32).astype(self.dtype)  # [B, N, D]
        node_out = self.readout_node_mlp(node_feat).astype(jnp.float32)
        if self.out_chans_node == 1:
            node_out = node_out[..., 0]

        if not flag_node_only:
            node_out = mask_nodes(node_out, node_flags)
        else:
            node_out = node_out * 0.0
        adj_out = mask_adjs(adj_out, node_flags)
        if self.symmetric_noise:
            adj_out = symmetrize(adj_out)
        return adj_out, node_out

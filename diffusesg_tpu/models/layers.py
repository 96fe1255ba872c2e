"""Swin-Transformer building blocks for the DiffuseSG denoiser (flax.linen).

TPU-native redesign of the reference blocks
(reference: DiffuseSG/model/diffusesg/diffusesg.py:9-584):
  * channels-LAST everywhere ([B, H, W, C]) so C maps to TPU lanes;
  * patch embed / read-out as space-to-depth + Dense (== strided conv but
    guaranteed to hit the MXU as one big matmul);
  * window partition/reverse as reshape/transpose (free under XLA);
  * shifted-window attention masks precomputed as static numpy constants;
  * noise conditioning as per-block affine: silu(shift + x * (scale + 1));
  * attention can route through the fused Pallas window-attention kernel
    (ops/window_attention.py) or a pure-XLA einsum path.
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def trunc_normal_init(std: float = 0.02):
    """Truncated-normal initializer matching the reference init
    (diffusesg.py:722-729, timm trunc_normal_ std=0.02)."""
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


DENSE_KW = dict(kernel_init=trunc_normal_init(), bias_init=nn.initializers.zeros)


class Mlp(nn.Module):
    """Two-layer GELU MLP readout head (reference: diffusesg.py:9-25).

    The second projection's output width is tiny (1-16 channels); XLA
    lowers such narrow dots to a VPU multiply+reduce loop (~0.5 ms on the
    [B,N,N,C] grid).  On TPU the whole head runs as one Pallas pass
    (ops/readout_kernel.py) with both dots on the MXU."""
    hidden_features: int
    out_features: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.readout_kernel import fused_readout_mlp, readout_mlp_xla
        c = x.shape[-1]
        w1 = self.param("fc1_kernel", trunc_normal_init(),
                        (c, self.hidden_features))
        b1 = self.param("fc1_bias", nn.initializers.zeros,
                        (self.hidden_features,))
        w2 = self.param("fc2_kernel", trunc_normal_init(),
                        (self.hidden_features, self.out_features))
        b2 = self.param("fc2_bias", nn.initializers.zeros, (self.out_features,))
        fn = fused_readout_mlp if self.use_pallas else readout_mlp_xla
        out = fn(x.reshape(-1, c).astype(self.dtype), w1.astype(self.dtype),
                 b1, w2.astype(self.dtype), b2)
        return out.reshape(x.shape[:-1] + (self.out_features,)).astype(self.dtype)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """[B, H, W, C] -> [B * nH * nW, window, window, C] (diffusesg.py:28-40)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window, window, c)


def window_reverse(windows: jax.Array, window: int, h: int, w: int) -> jax.Array:
    """Inverse of window_partition (diffusesg.py:43-57)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // window) * (w // window))
    x = windows.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def relative_position_index(window: int) -> np.ndarray:
    """Static [window^2, window^2] lookup into the (2w-1)^2 bias table
    (reference: diffusesg.py:87-98)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)  # [2, w*w]
    rel = flat[:, :, None] - flat[:, None, :]  # [2, w*w, w*w]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


def shifted_window_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Static [nW, w*w, w*w] additive mask (0 / -100) for SW-MSA
    (reference: diffusesg.py:207-230)."""
    img_mask = np.zeros((1, h, w, 1), dtype=np.float32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, h // window, window, w // window, window, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """Window multi-head self-attention with relative position bias
    (reference: diffusesg.py:60-139).

    Input: [nWB, L=window^2, C]; optional additive mask [nW, L, L].
    """
    dim: int
    window: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, mask: np.ndarray | None = None):
        nwb, L, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        bias_table = self.param(
            "relative_position_bias_table", trunc_normal_init(),
            ((2 * self.window - 1) ** 2, self.num_heads))
        rel_idx = relative_position_index(self.window).reshape(-1)
        rel_bias = bias_table[rel_idx].reshape(L, L, self.num_heads)
        rel_bias = rel_bias.transpose(2, 0, 1)  # [nH, L, L]

        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, **DENSE_KW)(x)
        qkv = qkv.reshape(nwb, L, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [nWB, L, nH, hd]

        mask_arr = None if mask is None else jnp.asarray(mask, jnp.float32)
        if self.use_pallas:
            from ..ops.window_attention import fused_window_attention_qkhd
            out = fused_window_attention_qkhd(
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2), rel_bias.astype(jnp.float32),
                mask_arr, scale)
            out = jnp.swapaxes(out, 1, 2)
        else:
            attn = jnp.einsum("blhd,bmhd->bhlm", q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = attn + rel_bias[None].astype(jnp.float32)
            if mask_arr is not None:
                nw = mask_arr.shape[0]
                m = jnp.tile(mask_arr[:, None], (nwb // nw, 1, 1, 1))
                attn = attn + m
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhlm,bmhd->blhd", attn, v)
        out = out.reshape(nwb, L, c)
        return nn.Dense(self.dim, dtype=self.dtype, **DENSE_KW)(out)


class NoiseAffine(nn.Module):
    """Per-block noise conditioning: silu(shift + x * (scale + 1))
    (reference: diffusesg.py:195,237-240)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        params = nn.Dense(self.dim * 2, dtype=self.dtype, **DENSE_KW)(emb)  # [B, 2C]
        scale, shift = jnp.split(params[:, None, :], 2, axis=-1)  # [B, 1, C] x2
        return nn.silu(shift + x * (scale + 1.0))


class SwinBlock(nn.Module):
    """One Swin transformer block with noise conditioning
    (reference: diffusesg.py:158-277).

    The attention half — noise affine, LayerNorm, (shifted-)window attention,
    residual — runs either as plain XLA ops or as ONE fused Pallas kernel
    (ops/swin_block_kernel.py) that reads the spatial layout directly and
    keeps scores/weights VMEM-resident.  Both paths share the exact same
    parameters (declared flat on this module).
    """
    dim: int
    input_resolution: tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, emb):
        from ..ops.swin_block_kernel import swin_attn_block_xla

        h, w = self.input_resolution
        b, L, c = x.shape
        window, shift = self.window_size, self.shift_size
        if min(h, w) <= window:
            # window covers the whole grid: no partitioning benefit, no shift
            # (reference: diffusesg.py:189-192)
            window, shift = min(h, w), 0

        # parameters (shared by the XLA and Pallas paths)
        scale_shift = nn.Dense(self.dim * 2, dtype=self.dtype, **DENSE_KW)(emb)  # [B, 2C]
        ln_gamma = self.param("norm1_scale", nn.initializers.ones, (c,))
        ln_beta = self.param("norm1_bias", nn.initializers.zeros, (c,))
        wqkv = self.param("qkv_kernel", trunc_normal_init(), (c, 3 * c))
        bqkv = self.param("qkv_bias", nn.initializers.zeros, (3 * c,))
        wproj = self.param("proj_kernel", trunc_normal_init(), (c, c))
        bproj = self.param("proj_bias", nn.initializers.zeros, (c,))
        bias_table = self.param("relative_position_bias_table", trunc_normal_init(),
                                ((2 * window - 1) ** 2, self.num_heads))
        rel_idx = relative_position_index(window).reshape(-1)
        rel_bias = bias_table[rel_idx].reshape(window * window, window * window,
                                               self.num_heads).transpose(2, 0, 1)

        mask = None
        if shift > 0:
            mask = jnp.asarray(shifted_window_attn_mask(h, w, window, shift))

        # MLP-half parameters (both paths)
        hidden = int(self.dim * self.mlp_ratio)
        ln2_gamma = self.param("norm2_scale", nn.initializers.ones, (c,))
        ln2_beta = self.param("norm2_bias", nn.initializers.zeros, (c,))
        w1 = self.param("mlp_fc1_kernel", trunc_normal_init(), (c, hidden))
        b1 = self.param("mlp_fc1_bias", nn.initializers.zeros, (hidden,))
        w2 = self.param("mlp_fc2_kernel", trunc_normal_init(), (hidden, c))
        b2 = self.param("mlp_fc2_bias", nn.initializers.zeros, (c,))

        xs = x.reshape(b, h, w, c).astype(self.dtype)
        if shift > 0:
            xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
        if self.use_pallas:
            # whole block (attn + MLP halves) as ONE fused TPU kernel
            # (v3: pair-packed window attention, ops/swin_block_v3.py)
            from ..ops.swin_block_v3 import fused_swin_block_v3 as fused_swin_block
            out = fused_swin_block(
                xs, scale_shift.astype(self.dtype), ln_gamma, ln_beta,
                wqkv.astype(self.dtype), bqkv, wproj.astype(self.dtype),
                bproj, rel_bias, mask, ln2_gamma, ln2_beta,
                w1.astype(self.dtype), b1, w2.astype(self.dtype), b2,
                self.num_heads, window)
            if shift > 0:
                out = jnp.roll(out, (shift, shift), axis=(1, 2))
            return out.reshape(b, L, c)

        out = swin_attn_block_xla(
            xs, scale_shift.astype(self.dtype), ln_gamma, ln_beta,
            wqkv.astype(self.dtype), bqkv, wproj.astype(self.dtype),
            bproj, rel_bias, mask, num_heads=self.num_heads, window=window)
        if shift > 0:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        x = out.reshape(b, L, c)
        from ..ops.mlp_block_kernel import mlp_block_xla
        return mlp_block_xla(x, ln2_gamma, ln2_beta, w1.astype(self.dtype),
                             b1, w2.astype(self.dtype), b2)


class PatchMerging(nn.Module):
    """2x downsample: gather 2x2 neighborhoods, LayerNorm, Dense 4C->2C
    (reference: diffusesg.py:298-344).

    Runs as ONE fused Pallas pass on TPU (ops/patch_resample.py) — the
    XLA lowering of the 6-D gather materializes fp32 transpose copies that
    cost more than the neighbouring attention blocks."""
    input_resolution: tuple[int, int]
    dim: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.patch_resample import fused_patch_merge, patch_merge_xla
        h, w = self.input_resolution
        b, L, c = x.shape
        g = self.param("norm_scale", nn.initializers.ones, (4 * c,))
        bt = self.param("norm_bias", nn.initializers.zeros, (4 * c,))
        wred = self.param("reduction_kernel", trunc_normal_init(),
                          (4 * c, 2 * self.dim))
        xs = x.reshape(b, h, w, c).astype(self.dtype)
        fn = fused_patch_merge if self.use_pallas else patch_merge_xla
        out = fn(xs, g, bt, wred.astype(self.dtype))
        return out.reshape(b, (h // 2) * (w // 2), 2 * self.dim)


class PatchBreakup(nn.Module):
    """2x upsample, inverse of PatchMerging with skip handling
    (reference: diffusesg.py:347-412).  Fused Pallas pass on TPU, like
    PatchMerging."""
    input_resolution: tuple[int, int]
    dim: int  # channel count of the (possibly skip-concatenated) input
    skip_connection: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.patch_resample import fused_patch_breakup, patch_breakup_xla
        h, w = self.input_resolution
        b, L, c = x.shape
        # chunk k -> offset (ho=k%2, wo=k//2); dim_inner == 4*c_out always
        dim_inner = self.dim if self.skip_connection else 2 * self.dim
        c_out = dim_inner // 4
        w_in = self.param("pre_kernel", trunc_normal_init(), (c, dim_inner))
        g1 = self.param("norm1_scale", nn.initializers.ones, (dim_inner,))
        b1 = self.param("norm1_bias", nn.initializers.zeros, (dim_inner,))
        g2 = self.param("norm2_scale", nn.initializers.ones, (c_out,))
        b2 = self.param("norm2_bias", nn.initializers.zeros, (c_out,))
        w_out = self.param("post_kernel", trunc_normal_init(), (c_out, c_out))
        xs = x.reshape(b, h, w, c).astype(self.dtype)
        fn = fused_patch_breakup if self.use_pallas else patch_breakup_xla
        out = fn(xs, w_in.astype(self.dtype), g1, b1, g2, b2,
                 w_out.astype(self.dtype))
        return out.reshape(b, 4 * h * w, c_out)


class BasicLayer(nn.Module):
    """A stage: optional upsample -> depth x SwinBlock -> optional downsample
    (reference: diffusesg.py:415-494)."""
    dim: int
    input_resolution: tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    downsample: bool = False
    upsample: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x, emb):
        res = self.input_resolution
        if self.upsample:
            # always with skip connection when upsampling (diffusesg.py:448-451)
            # fused kernel: XLA lowers the breakup's depth-to-space chain with
            # fp32 T(2,128) layouts (~3.2ms at 32->64 vs 1.7ms fused); the
            # merge direction is layout-friendly in XLA, so it stays unfused
            x = PatchBreakup(res, self.dim * 4, skip_connection=True,
                             dtype=self.dtype, use_pallas=self.use_pallas)(x)
            res = (res[0] * 2, res[1] * 2)
        block_cls = nn.remat(SwinBlock) if self.remat else SwinBlock
        for i in range(self.depth):
            x = block_cls(self.dim, res, self.num_heads, self.window_size,
                          shift_size=0 if i % 2 == 0 else self.window_size // 2,
                          mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                          use_pallas=self.use_pallas)(x, emb)
        if self.downsample:
            # fused: XLA hoists the LN's fp32 convert before the 2x2 gather
            # transpose, moving 100MB+ in fp32 T(2,128) layouts (~2.5ms at
            # 64->32 vs 1.1ms fused)
            x = PatchMerging(res, self.dim, dtype=self.dtype,
                             use_pallas=self.use_pallas)(x)
        return x


class PositionalEmbedding(nn.Module):
    """Sin/cos timestep embedding, EDM/DDPM++ style (reference: diffusesg.py:500-513)."""
    num_channels: int
    max_positions: int = 10000
    endpoint: bool = False

    @nn.compact
    def __call__(self, x):
        half = self.num_channels // 2
        freqs = jnp.arange(half, dtype=jnp.float32)
        freqs = freqs / (half - (1 if self.endpoint else 0))
        freqs = (1.0 / self.max_positions) ** freqs
        args = x[:, None].astype(jnp.float32) * freqs[None, :]
        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class PatchEmbed(nn.Module):
    """Patchify + project + norm + noise affine (reference: diffusesg.py:516-584).

    The reference's strided Conv2d is realized as space-to-depth + Dense —
    mathematically identical for kernel == stride == patch, and a single
    MXU matmul on TPU.
    """
    img_size: int
    patch_size: int
    embed_dim: int
    patch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        b, h, w, c = x.shape
        p = self.patch_size
        ph, pw = h // p, w // p
        x = x.reshape(b, ph, p, pw, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, ph * pw, p * p * c)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, **DENSE_KW)(x)
        if self.patch_norm:
            x = nn.LayerNorm(dtype=self.dtype)(x)
        return NoiseAffine(self.embed_dim, self.dtype)(x, emb)


class ReadOut(nn.Module):
    """Un-patchify + two pointwise layers (reference: diffusesg.py:705-709
    ConvTranspose2d(p) + two 1x1 convs, as depth-to-space + Dense)."""
    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ph, pw):
        b, L, c = x.shape
        p = self.patch_size
        x = nn.Dense(p * p * self.embed_dim, dtype=self.dtype, **DENSE_KW)(x)
        x = x.reshape(b, ph, pw, p, p, self.embed_dim).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, ph * p, pw * p, self.embed_dim)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, **DENSE_KW)(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, **DENSE_KW)(x)
        return x

"""diffusesg_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for joint grounded
scene-graph diffusion, providing the capabilities of ubc-vision/DiffuseSG.

The framework jointly denoises:
  * per-node discrete object labels,
  * per-node continuous bounding-box coordinates (cx, cy, w, h),
  * per-node-pair discrete predicate (edge) labels,
represented as padded, masked dense tensors.  It uses the EDM (Karras et al.
2022) continuous-time diffusion formulation with a Swin-Transformer U-Net
denoiser operating on the N x N node-pair grid.

Layout conventions (TPU-native; deliberately channels-LAST, unlike the
PyTorch reference which is channels-first):
  * adjacency tensors:  [B, N, N] or [B, N, N, C]
  * node tensors:       [B, N]    or [B, N, C]
  * node flags:         [B, N] bool (or [B, N, N] bool in node-only mode)
All shapes are static; masking is multiplicative / where-based so that every
op is jit-safe and XLA can fuse the full pipeline.
"""

__version__ = "0.2.0"

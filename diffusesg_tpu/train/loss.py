"""Training losses: masked per-sample regression ("rainbow") loss + auxiliary
bbox IoU loss.

JAX counterpart of the reference loss layer
(reference: DiffuseSG/loss/rainbow_loss.py:6-101 and the IoU aux loss in
DiffuseSG/runner/trainer/trainer_node_adj.py:130-159).  Shapes are
channels-last; per-sample normalization reproduces the reference exactly:
  adj:  sum / (num_valid_nodes^2) [/ C if multichannel]
  node: sum / num_valid_nodes     [/ C if multichannel]
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.box_ops import (
    box_cxcywh_to_xyxy, box_iou_aligned,
    complete_box_iou_loss, distance_box_iou_loss, generalized_box_iou_loss,
)
from ..ops.masking import mask_adjs, mask_nodes


@dataclasses.dataclass(frozen=True)
class NodeAdjRainbowLoss:
    """Masked, EDM-weighted MSE on (D - clean) for both modalities
    (reference: rainbow_loss.py:36-99, reduction='none' path)."""
    edge_loss_weight: float = 1.0
    node_loss_weight: float = 1.0
    objective: str = "edm"

    def __call__(self, pred_adj, pred_node, target_adj, target_node,
                 node_flags, loss_weight=None):
        """@return (loss_adj[B], loss_node[B])."""
        b = pred_adj.shape[0]
        if loss_weight is None:
            loss_weight = jnp.ones((b,), jnp.float32)

        sq_adj = (pred_adj - target_adj) ** 2
        sq_node = (pred_node - target_node) ** 2
        w_a = loss_weight.reshape((b,) + (1,) * (sq_adj.ndim - 1))
        w_x = loss_weight.reshape((b,) + (1,) * (sq_node.ndim - 1))
        sq_adj = mask_adjs(sq_adj * w_a, node_flags)
        sq_node = mask_nodes(sq_node * w_x, node_flags)

        if node_flags.ndim == 2:
            counts = node_flags.astype(jnp.float32).sum(-1)     # [B]
            num_adj_entries = counts ** 2
            num_node_entries = counts
        else:
            counts = node_flags.astype(jnp.float32).sum((-1, -2))
            num_adj_entries = counts
            num_node_entries = counts

        # adj reduction (rainbow_loss.py:88-92); channels-last so the channel
        # divisor is the trailing axis for 4D tensors
        if sq_adj.ndim == 3:
            loss_adj = sq_adj.sum((-1, -2)) / num_adj_entries
        else:
            loss_adj = sq_adj.sum((-1, -2, -3)) / num_adj_entries / sq_adj.shape[-1]
        loss_adj = loss_adj * self.edge_loss_weight

        # node reduction (rainbow_loss.py:94-98)
        if sq_node.ndim == 2:
            loss_node = sq_node.sum(-1) / num_node_entries
        else:
            loss_node = sq_node.sum((-1, -2)) / num_node_entries / sq_node.shape[-1]
        loss_node = loss_node * self.node_loss_weight
        return loss_adj, loss_node


def bbox_iou_aux_loss(pred_node, target_node, node_flags, weights,
                      iou_loss_type: str = "iou"):
    """Auxiliary IoU loss on the trailing bbox slice [..., -4:]
    (reference: trainer_node_adj.py:130-159).

    Note: the reference normalizes each sample's loss by the TOTAL number of
    valid nodes across the batch (node_flags.view(-1).sum()), not per-sample;
    reproduced as-is for loss-value parity.  Consequence under parallelism
    (inherited from the reference, whose objective also changes with world
    size): gspmd sees the GLOBAL batch here (single-GPU semantics), while
    shard_map normalizes per shard and pmeans the grads — exactly reference
    DDP, where each rank divides by its local batch total.  The two agree
    when per-shard valid-node counts are equal, and differ only at
    second order otherwise.

    @return [B] loss already multiplied by the EDM weights.
    """
    pred_bbox = (pred_node[..., -4:] + 1.0) / 2.0
    tgt_bbox = (target_node[..., -4:] + 1.0) / 2.0
    pred_xyxy = jnp.clip(box_cxcywh_to_xyxy(pred_bbox), 0.0, 1.0)
    tgt_xyxy = jnp.clip(box_cxcywh_to_xyxy(tgt_bbox), 0.0, 1.0)

    if iou_loss_type == "iou":
        iou = box_iou_aligned(pred_xyxy, tgt_xyxy)  # [B, N]
        per_node = -(iou ** 2.0)
    elif iou_loss_type == "ciou":
        per_node = complete_box_iou_loss(pred_xyxy, tgt_xyxy)
    elif iou_loss_type == "diou":
        per_node = distance_box_iou_loss(pred_xyxy, tgt_xyxy)
    elif iou_loss_type in ("giou", "giou_squared"):
        per_node = generalized_box_iou_loss(pred_xyxy, tgt_xyxy)
        if iou_loss_type == "giou_squared":
            per_node = per_node ** 2.0
    else:
        raise NotImplementedError(f"unknown iou_loss_type {iou_loss_type}")

    flags_f = node_flags.astype(jnp.float32)
    per_node = per_node * flags_f                     # [B, N]
    total_valid = flags_f.sum()                       # scalar (reference quirk)
    per_sample = per_node.sum(-1) / total_valid       # [B]
    return per_sample * weights

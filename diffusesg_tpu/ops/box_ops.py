"""Pure-JAX bounding-box math.

Replaces the torchvision C++ box ops used by the reference trainer
(reference: DiffuseSG/runner/trainer/trainer_node_adj.py:7,130-159 using
torchvision.ops.{box_convert, box_iou, complete_/distance_/generalized_box_iou_loss}).
All functions operate on aligned pairs [..., 4] and vectorize trivially.
"""
from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(boxes):
    """[..., 4] (cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def _box_area(boxes):
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0) * jnp.clip(boxes[..., 3] - boxes[..., 1], 0)


def box_iou_aligned(boxes1, boxes2, eps: float = 1e-7):
    """Element-wise IoU between aligned boxes [..., 4] in xyxy format."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = _box_area(boxes1) + _box_area(boxes2) - inter
    return inter / (union + eps)


def box_iou_pairwise(boxes1, boxes2, eps: float = 1e-7):
    """Pairwise IoU: [M, 4] x [K, 4] -> [M, K] (xyxy format)."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = _box_area(boxes1)[:, None] + _box_area(boxes2)[None, :] - inter
    return inter / (union + eps)


def generalized_box_iou_loss(boxes1, boxes2, eps: float = 1e-7):
    """GIoU loss 1 - GIoU between aligned boxes [..., 4] in xyxy format."""
    iou = box_iou_aligned(boxes1, boxes2, eps)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    hull = wh[..., 0] * wh[..., 1]
    lt_i = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb_i = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh_i = jnp.clip(rb_i - lt_i, 0)
    inter = wh_i[..., 0] * wh_i[..., 1]
    union = _box_area(boxes1) + _box_area(boxes2) - inter
    giou = iou - (hull - union) / (hull + eps)
    return 1.0 - giou


def distance_box_iou_loss(boxes1, boxes2, eps: float = 1e-7):
    """DIoU loss between aligned boxes [..., 4] in xyxy format."""
    iou = box_iou_aligned(boxes1, boxes2, eps)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    diag_sq = jnp.sum((rb - lt) ** 2, axis=-1) + eps
    c1 = 0.5 * (boxes1[..., :2] + boxes1[..., 2:])
    c2 = 0.5 * (boxes2[..., :2] + boxes2[..., 2:])
    center_sq = jnp.sum((c1 - c2) ** 2, axis=-1)
    return 1.0 - iou + center_sq / diag_sq


def complete_box_iou_loss(boxes1, boxes2, eps: float = 1e-7):
    """CIoU loss between aligned boxes [..., 4] in xyxy format."""
    diou = distance_box_iou_loss(boxes1, boxes2, eps)
    w1 = jnp.clip(boxes1[..., 2] - boxes1[..., 0], eps)
    h1 = jnp.clip(boxes1[..., 3] - boxes1[..., 1], eps)
    w2 = jnp.clip(boxes2[..., 2] - boxes2[..., 0], eps)
    h2 = jnp.clip(boxes2[..., 3] - boxes2[..., 1], eps)
    v = (4.0 / (jnp.pi ** 2)) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    iou = box_iou_aligned(boxes1, boxes2, eps)
    alpha = v / (1.0 - iou + v + eps)
    return diou + alpha * v

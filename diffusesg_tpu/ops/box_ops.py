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
    # RAW signed area, like torchvision box_area/_loss_inter_union: an
    # inverted box (x2 < x1, possible early in training before the network
    # learns w >= 0) must contribute a negative area for loss parity
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou_aligned(boxes1, boxes2, eps: float = 1e-7):
    """Element-wise IoU between aligned boxes [..., 4] in xyxy format.

    ``eps`` guards exactly-zero unions (torchvision's box_iou divides raw
    and yields nan there; zero unions cannot occur for the trainer's
    clipped [0,1] cxcywh-decoded boxes, so values match torchvision)."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = _box_area(boxes1) + _box_area(boxes2) - inter
    return inter / (union + eps)


def generalized_box_iou_loss(boxes1, boxes2, eps: float = 1e-7):
    """GIoU loss 1 - GIoU between aligned boxes [..., 4] in xyxy format.

    The enclosing-hull area is the RAW product (torchvision giou_loss
    semantics): with doubly-inverted inputs both hull extents are negative
    and multiply positive — clamping them to zero would divide by eps."""
    iou = box_iou_aligned(boxes1, boxes2, eps)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    hull = (rb[..., 0] - lt[..., 0]) * (rb[..., 1] - lt[..., 1])
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
    """CIoU loss between aligned boxes [..., 4] in xyxy format.

    Matches torchvision.ops.complete_box_iou_loss: RAW w/h (no clamping)
    and alpha computed under no_grad — differentiating through alpha would
    change the training gradients vs the reference trainer."""
    import jax

    diou = distance_box_iou_loss(boxes1, boxes2, eps)
    w1 = boxes1[..., 2] - boxes1[..., 0]
    h1 = boxes1[..., 3] - boxes1[..., 1]
    w2 = boxes2[..., 2] - boxes2[..., 0]
    h2 = boxes2[..., 3] - boxes2[..., 1]
    v = (4.0 / (jnp.pi ** 2)) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    iou = box_iou_aligned(boxes1, boxes2, eps)
    alpha = jax.lax.stop_gradient(v / (1.0 - iou + v + eps))
    return diou + alpha * v

"""Box-op parity vs the torchvision semantics the reference trainer uses
(reference: trainer_node_adj.py:130-159 with torchvision.ops.box_iou /
generalized_/distance_/complete_box_iou_loss).  torchvision isn't in this
image, so the torch oracle below transcribes its documented formulas —
including the two subtleties that matter for parity: RAW (signed) box
areas for inverted boxes, and CIoU's alpha computed under no_grad."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from diffusesg_tpu.ops.box_ops import (
    box_iou_aligned, complete_box_iou_loss, distance_box_iou_loss,
    generalized_box_iou_loss,
)


def _t_inter_union(b1, b2):
    # torchvision ops.ciou_loss._loss_inter_union: raw areas, clamped overlap
    x1, y1, x2, y2 = b1.unbind(-1)
    x1g, y1g, x2g, y2g = b2.unbind(-1)
    xkis1 = torch.max(x1, x1g); ykis1 = torch.max(y1, y1g)
    xkis2 = torch.min(x2, x2g); ykis2 = torch.min(y2, y2g)
    intsctk = torch.zeros_like(x1)
    mask = (ykis2 > ykis1) & (xkis2 > xkis1)
    intsctk[mask] = (xkis2[mask] - xkis1[mask]) * (ykis2[mask] - ykis1[mask])
    unionk = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsctk
    return intsctk, unionk


def _t_diou(b1, b2, eps=1e-7):
    intsct, union = _t_inter_union(b1, b2)
    iou = intsct / (union + eps)
    x1, y1, x2, y2 = b1.unbind(-1)
    x1g, y1g, x2g, y2g = b2.unbind(-1)
    xc1 = torch.min(x1, x1g); yc1 = torch.min(y1, y1g)
    xc2 = torch.max(x2, x2g); yc2 = torch.max(y2, y2g)
    diag = ((xc2 - xc1) ** 2) + ((yc2 - yc1) ** 2) + eps
    cd = (((x1g + x2g) - (x1 + x2)) ** 2) / 4 + (((y1g + y2g) - (y1 + y2)) ** 2) / 4
    return 1 - iou + cd / diag, iou


def t_diou_loss(b1, b2, eps=1e-7):
    loss, _ = _t_diou(b1, b2, eps)
    return loss


def t_ciou_loss(b1, b2, eps=1e-7):
    diou, iou = _t_diou(b1, b2, eps)
    x1, y1, x2, y2 = b1.unbind(-1)
    x1g, y1g, x2g, y2g = b2.unbind(-1)
    w_pred = x2 - x1; h_pred = y2 - y1
    w_gt = x2g - x1g; h_gt = y2g - y1g
    v = (4 / (torch.pi ** 2)) * torch.pow(
        torch.atan(w_gt / h_gt) - torch.atan(w_pred / h_pred), 2)
    with torch.no_grad():
        alpha = v / (1 - iou + v + eps)
    return diou + alpha * v


def t_giou_loss(b1, b2, eps=1e-7):
    intsct, union = _t_inter_union(b1, b2)
    iou = intsct / (union + eps)
    x1, y1, x2, y2 = b1.unbind(-1)
    x1g, y1g, x2g, y2g = b2.unbind(-1)
    xc1 = torch.min(x1, x1g); yc1 = torch.min(y1, y1g)
    xc2 = torch.max(x2, x2g); yc2 = torch.max(y2, y2g)
    area_c = (xc2 - xc1) * (yc2 - yc1)
    miou = iou - ((area_c - union) / (area_c + eps))
    return 1 - miou


def _boxes(n=64, seed=0, inverted_frac=0.25):
    """Random [0,1] xyxy boxes; a fraction inverted (x2<x1 and/or y2<y1),
    which real training produces before the net learns w,h >= 0."""
    rs = np.random.RandomState(seed)
    a = rs.uniform(0, 1, (n, 4)).astype(np.float32)
    lo = np.minimum(a[:, :2], a[:, 2:]); hi = np.maximum(a[:, :2], a[:, 2:])
    boxes = np.concatenate([lo, hi], -1)
    k = int(n * inverted_frac)
    boxes[:k, [0, 2]] = boxes[:k, [2, 0]]  # invert x
    boxes[:k // 2, [1, 3]] = boxes[:k // 2, [3, 1]]  # and y for half of those
    return boxes


def _pair(seed1, seed2, n=64):
    """A (b1, b2) pair with degenerate rows dropped: with inverted boxes the
    union (and ciou's 1-iou+v) can pass through ~0 where BOTH fp32
    implementations are dominated by eps/rounding — not a parity signal."""
    b1, b2 = _boxes(n * 3, seed=seed1), _boxes(n * 3, seed=seed2)
    t1, t2 = torch.tensor(b1, dtype=torch.float64), torch.tensor(b2, dtype=torch.float64)
    _, union = _t_inter_union(t1, t2)
    keep = union.abs().numpy() > 0.05
    return b1[keep][:n], b2[keep][:n]


ORACLES = {"giou": t_giou_loss, "diou": t_diou_loss, "ciou": t_ciou_loss}
OURS = {"giou": generalized_box_iou_loss, "diou": distance_box_iou_loss,
        "ciou": complete_box_iou_loss}


import pytest


@pytest.mark.parametrize("kind", ["giou", "diou", "ciou"])
def test_iou_loss_values_match_torchvision_formulas(kind):
    b1, b2 = _pair(1, 2)
    want = ORACLES[kind](torch.tensor(b1, dtype=torch.float64),
                         torch.tensor(b2, dtype=torch.float64)).numpy()
    got = np.asarray(OURS[kind](jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("kind", ["giou", "diou", "ciou"])
def test_iou_loss_gradients_match_torchvision_formulas(kind):
    """Gradient parity — in particular CIoU's alpha must be stop_gradient'd
    like torchvision's no_grad block, or training diverges from the
    reference even though loss VALUES agree."""
    b1, b2 = _pair(3, 4)
    t1 = torch.tensor(b1, dtype=torch.float64, requires_grad=True)
    ORACLES[kind](t1, torch.tensor(b2, dtype=torch.float64)).sum().backward()
    want = t1.grad.numpy().astype(np.float32)
    got = np.asarray(jax.grad(
        lambda x: OURS[kind](x, jnp.asarray(b2)).sum())(jnp.asarray(b1)))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_vanilla_iou_inverted_boxes_negative_area():
    """box_iou uses RAW signed areas (torchvision box_area semantics): an
    inverted box must reduce the union, not be clipped to zero area."""
    b1 = np.array([[0.6, 0.0, 0.2, 0.5]], np.float32)  # inverted in x
    b2 = np.array([[0.1, 0.0, 0.7, 0.5]], np.float32)
    area1 = (0.2 - 0.6) * 0.5  # negative
    area2 = 0.6 * 0.5
    # no positive overlap width between [0.6, 0.2] treated as lt/rb clamp
    lt_x, rb_x = max(0.6, 0.1), min(0.2, 0.7)
    inter = max(rb_x - lt_x, 0.0) * 0.5
    want = inter / (area1 + area2 - inter + 1e-7)
    got = float(box_iou_aligned(jnp.asarray(b1), jnp.asarray(b2))[0])
    np.testing.assert_allclose(got, want, rtol=1e-5)

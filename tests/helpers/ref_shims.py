"""Import shims for running REFERENCE code (/root/reference/DiffuseSG) in
this image, which lacks timm / pyemd / torchvision / ema_pytorch.

Each ``install_*`` registers a minimal stand-in in ``sys.modules`` BEFORE the
reference module is imported.  The stand-ins transcribe the exact documented
semantics of the originals (several are already cross-validated elsewhere:
the box-op formulas by tests/test_box_ops.py against our JAX ops, the EMA
warmup schedule by tests/test_train.py::test_ema_warmup_matches_ema_pytorch),
so reference code driven through them behaves like the real deployment.
"""
from __future__ import annotations

import copy
import itertools
import sys
import types

REF = "/root/reference/DiffuseSG"


def install_timm_shim():
    """DropPath / to_2tuple / trunc_normal_ — the only timm symbols the
    reference model uses (reference: model/diffusesg/diffusesg.py:5; all
    shipped configs run drop_path_rate=0)."""
    if "timm" in sys.modules:
        return
    import torch

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
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def install_pyemd_stub():
    """1-D EMD closed form (CDF difference x Toeplitz ground distance) — the
    exact value pyemd computes for the histogram/:distance-matrix shapes the
    reference passes (reference: evaluation/mmd.py:14,48)."""
    if "pyemd" in sys.modules:
        return
    import numpy as np

    stub = types.ModuleType("pyemd")

    def emd(x, y, distance_mtx):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        d = np.asarray(distance_mtx, dtype=np.float64)
        step = d[0, 1] if d.shape[0] > 1 else 1.0
        return float(np.abs(np.cumsum(x - y)).sum() * step)

    stub.emd = emd
    sys.modules["pyemd"] = stub


def install_torchvision_shim():
    """torchvision.ops subset the reference trainer/sampler use
    (reference: runner/trainer/trainer_node_adj.py:7,130-159 and
    runner/sampler/sampler_node_adj.py:12): box_convert, box_iou and the
    generalized/distance/complete IoU losses, transcribed from torchvision's
    implementations (raw signed areas; CIoU alpha under no_grad) — the same
    formulas tests/test_box_ops.py validates our JAX ops against."""
    if "torchvision" in sys.modules:
        return
    import torch

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")

    def box_convert(boxes, in_fmt, out_fmt):
        assert in_fmt == "cxcywh" and out_fmt == "xyxy", (in_fmt, out_fmt)
        cx, cy, w, h = boxes.unbind(-1)
        return torch.stack([cx - 0.5 * w, cy - 0.5 * h,
                            cx + 0.5 * w, cy + 0.5 * h], dim=-1)

    def _area(b):
        # torchvision box_area: raw (possibly negative) product
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def box_iou(boxes1, boxes2):
        lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
        rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        union = _area(boxes1)[:, None] + _area(boxes2)[None, :] - inter
        return inter / union

    def _loss_inter_union(b1, b2):
        x1, y1, x2, y2 = b1.unbind(-1)
        x1g, y1g, x2g, y2g = b2.unbind(-1)
        xkis1 = torch.max(x1, x1g)
        ykis1 = torch.max(y1, y1g)
        xkis2 = torch.min(x2, x2g)
        ykis2 = torch.min(y2, y2g)
        intsctk = torch.zeros_like(x1)
        mask = (ykis2 > ykis1) & (xkis2 > xkis1)
        intsctk[mask] = (xkis2[mask] - xkis1[mask]) * (ykis2[mask] - ykis1[mask])
        unionk = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsctk
        return intsctk, unionk

    def _reduce(loss, reduction):
        if reduction == "none":
            return loss
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        raise ValueError(reduction)

    def generalized_box_iou_loss(b1, b2, reduction="none", eps=1e-7):
        intsct, union = _loss_inter_union(b1, b2)
        iou = intsct / (union + eps)
        x1, y1, x2, y2 = b1.unbind(-1)
        x1g, y1g, x2g, y2g = b2.unbind(-1)
        xc1 = torch.min(x1, x1g)
        yc1 = torch.min(y1, y1g)
        xc2 = torch.max(x2, x2g)
        yc2 = torch.max(y2, y2g)
        area_c = (xc2 - xc1) * (yc2 - yc1)
        miou = iou - ((area_c - union) / (area_c + eps))
        return _reduce(1 - miou, reduction)

    def _diou_iou(b1, b2, eps=1e-7):
        intsct, union = _loss_inter_union(b1, b2)
        iou = intsct / (union + eps)
        x1, y1, x2, y2 = b1.unbind(-1)
        x1g, y1g, x2g, y2g = b2.unbind(-1)
        xc1 = torch.min(x1, x1g)
        yc1 = torch.min(y1, y1g)
        xc2 = torch.max(x2, x2g)
        yc2 = torch.max(y2, y2g)
        diag = ((xc2 - xc1) ** 2) + ((yc2 - yc1) ** 2) + eps
        cd = (((x1g + x2g) - (x1 + x2)) ** 2) / 4 + (((y1g + y2g) - (y1 + y2)) ** 2) / 4
        return 1 - iou + cd / diag, iou

    def distance_box_iou_loss(b1, b2, reduction="none", eps=1e-7):
        loss, _ = _diou_iou(b1, b2, eps)
        return _reduce(loss, reduction)

    def complete_box_iou_loss(b1, b2, reduction="none", eps=1e-7):
        diou, iou = _diou_iou(b1, b2, eps)
        x1, y1, x2, y2 = b1.unbind(-1)
        x1g, y1g, x2g, y2g = b2.unbind(-1)
        w_pred = x2 - x1
        h_pred = y2 - y1
        w_gt = x2g - x1g
        h_gt = y2g - y1g
        v = (4 / (torch.pi ** 2)) * torch.pow(
            torch.atan(w_gt / h_gt) - torch.atan(w_pred / h_pred), 2)
        with torch.no_grad():
            alpha = v / (1 - iou + v + eps)
        return _reduce(diou + alpha * v, reduction)

    ops.box_convert = box_convert
    ops.box_iou = box_iou
    ops.generalized_box_iou_loss = generalized_box_iou_loss
    ops.distance_box_iou_loss = distance_box_iou_loss
    ops.complete_box_iou_loss = complete_box_iou_loss
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops


def install_ema_pytorch_shim():
    """ema_pytorch.EMA with the reference's constructor arguments
    (update_every=1, update_after_step=0, inv_gamma=1, power=1 —
    reference: utils/learning_utils.py:160): call k copies for k <= 2,
    then lerps with decay = min(beta, 1 - 1/k).  Same schedule our
    train_state.ema_effective_decay implements (cross-validated by
    tests/test_train.py::test_ema_warmup_matches_ema_pytorch)."""
    if "ema_pytorch" in sys.modules:
        return
    import torch

    mod = types.ModuleType("ema_pytorch")

    class EMA(torch.nn.Module):
        def __init__(self, model, beta=0.9999, update_every=1,
                     update_after_step=0, inv_gamma=1.0, power=1.0, **_):
            super().__init__()
            assert update_every == 1 and update_after_step == 0
            assert inv_gamma == 1.0 and power == 1.0
            self.beta = beta
            self.online_model = model
            self.ema_model = copy.deepcopy(model)
            for p in self.ema_model.parameters():
                p.requires_grad_(False)
            self.step = 0
            self.initted = False

        def _copy(self):
            self.ema_model.load_state_dict(self.online_model.state_dict())

        @torch.no_grad()
        def update(self):
            cur = self.step
            self.step += 1
            if cur <= 0:  # step <= update_after_step path
                self._copy()
                return
            if not self.initted:
                self._copy()
                self.initted = True
            epoch = max(self.step - 1, 0)
            value = 1.0 - (1.0 + float(epoch)) ** -1.0
            decay = 0.0 if epoch <= 0 else min(max(value, 0.0), self.beta)
            o_sd = self.online_model.state_dict()
            for name, e in self.ema_model.state_dict().items():
                if e.dtype.is_floating_point:
                    e.mul_(decay).add_(o_sd[name], alpha=1.0 - decay)
                else:
                    e.copy_(o_sd[name])

    mod.EMA = EMA
    sys.modules["ema_pytorch"] = mod


def install_matplotlib_compat():
    """The reference filters ``matplotlib.cbook.MatplotlibDeprecationWarning``
    (utils/visual_utils.py:24), an alias modern matplotlib removed from
    cbook — restore it."""
    import matplotlib
    import matplotlib.cbook

    if not hasattr(matplotlib.cbook, "MatplotlibDeprecationWarning"):
        matplotlib.cbook.MatplotlibDeprecationWarning = (
            matplotlib.MatplotlibDeprecationWarning)


def install_networkx_compat():
    """The reference targets networkx 2.x (``nx.from_numpy_matrix``,
    evaluation/stats.py:187); alias it to from_numpy_array on 3.x."""
    import networkx as nx

    if not hasattr(nx, "from_numpy_matrix"):
        nx.from_numpy_matrix = nx.from_numpy_array


def install_all():
    install_timm_shim()
    install_pyemd_stub()
    install_torchvision_shim()
    install_ema_pytorch_shim()
    install_matplotlib_compat()
    install_networkx_compat()


def ref_on_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)

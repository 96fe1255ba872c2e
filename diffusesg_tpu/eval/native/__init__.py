"""Native (C++) evaluation engine: built on demand with g++, loaded via ctypes.

The reference leans on native code for its heavy host-side evaluation
(pyemd C++ EMD, mp.Pool fan-out of the greedy VOC matcher,
reference: DiffuseSG/evaluation/mmd.py:14, bbox_metrics.py:410-430); here the
single genuinely hot host metric — the Pascal-VOC F1 matrix over all
generated x reference scene pairs — gets a tight C++ implementation.  The
numpy implementation (eval/voc_f1.py) remains the always-available fallback
and the correctness oracle.
"""
from __future__ import annotations

import ctypes
import logging
import os

import numpy as np

from ...utils.native_build import load_native_lib

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "voc_f1.cc")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_voc_f1.so")
_LIB = None
_TRIED = False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    lib = load_native_lib(_SRC, _SO)
    if lib is None:
        return None
    try:
        lib.compute_f1_matrix.restype = None
        lib.compute_f1_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        _LIB = lib
    except OSError as e:
        logging.info("native voc_f1 load failed (%s); using numpy", e)
    return _LIB


def compute_bbox_f1_native(node_bbox_gen, node_types_gen, node_flags_gen,
                           node_bbox_ref, node_types_ref, node_flags_ref,
                           class_weight_ls=None, iou_range=None):
    """Drop-in native version of eval.voc_f1.compute_bbox_f1; returns None if
    the native library is unavailable (caller falls back to numpy)."""
    from ..voc_f1 import DEFAULT_IOU_RANGE, _valid_boxes
    lib = get_lib()
    if lib is None:
        return None
    iou_range = DEFAULT_IOU_RANGE if iou_range is None else iou_range

    bg = np.ascontiguousarray(node_bbox_gen, np.float64)
    br = np.ascontiguousarray(node_bbox_ref, np.float64)
    tg = np.ascontiguousarray(node_types_gen, np.int64)
    tr = np.ascontiguousarray(node_types_ref, np.int64)
    fg = np.ascontiguousarray(_valid_boxes(bg, np.asarray(node_flags_gen)), np.uint8)
    fr = np.ascontiguousarray(_valid_boxes(br, np.asarray(node_flags_ref)), np.uint8)
    B_g, N = tg.shape
    B_r = tr.shape[0]
    num_classes = int(max(tg.max(initial=0), tr.max(initial=0))) + 1
    if class_weight_ls is None:
        warr = [np.ones(num_classes)]
    else:
        warr = [np.asarray(w, np.float64) for w in class_weight_ls]
        num_classes = max(num_classes, *(len(w) for w in warr))
        warr = [np.pad(w, (0, num_classes - len(w))) for w in warr]
    W = len(warr)
    if W > 16:
        return None  # static stack buffers in the kernel cap at 16 weightings
    weights = np.ascontiguousarray(np.stack(warr), np.float64)
    thr = np.ascontiguousarray(np.asarray(iou_range, np.float64))
    out = np.zeros((B_g, B_r, W), np.float64)

    c_dp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    c_ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    c_up = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    lib.compute_f1_matrix(c_dp(bg), c_ip(tg), c_up(fg), c_dp(br), c_ip(tr),
                          c_up(fr), B_g, B_r, N, c_dp(thr), len(thr),
                          c_dp(weights), W, num_classes, c_dp(out))
    return out

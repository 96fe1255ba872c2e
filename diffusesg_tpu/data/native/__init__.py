"""Native (C++) batch-assembly engine for the data pipeline.

TPU-native counterpart of the reference DataLoader's native worker pool
(reference: DiffuseSG/utils/dataloader.py:29-32 — torch DataLoader with
pinned memory and up to 6 C++ workers).  The packed-array design makes
batching a row gather; this engine runs that gather in GIL-free C++ threads
with a bounded ring of pre-assembled batches, so the next batches are being
gathered while the current one is consumed (stacking with the device-side
``prefetch_to_device`` double buffering).

Build-on-demand with g++ like eval/native; the pure-numpy gather in
data/loader.py is the always-available fallback and the correctness oracle
(both paths consume the SAME permutation, so they are equivalent by
construction — asserted in tests/test_data.py).

Disable with DSG_NATIVE_LOADER=0.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

from ...utils.native_build import load_native_lib

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "batcher.cc")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_batcher.so")
_LIB = None
_TRIED = False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("DSG_NATIVE_LOADER", "1") == "0":
        return None
    lib = load_native_lib(_SRC, _SO, extra_flags=("-pthread",))
    if lib is None:
        return None
    lib.batcher_create.restype = ctypes.c_void_p
    lib.batcher_create.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int,
    ]
    lib.batcher_next.restype = ctypes.c_int64
    lib.batcher_next.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_void_p)]
    lib.batcher_destroy.restype = None
    lib.batcher_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def iter_batches_native(arrays: list[np.ndarray], perm: np.ndarray,
                        batch_size: int, depth: int = 3,
                        num_threads: int = 2):
    """Yield tuples of per-batch arrays gathered by the native engine.

    Equivalent to ``tuple(a[perm[s:s+bs]] for a in arrays)`` per batch.
    One engine handle per epoch; early generator exit destroys it cleanly.
    Returns None-yielding nothing if the library is unavailable (caller
    falls back).
    """
    lib = get_lib()
    assert lib is not None, "caller must check get_lib() first"
    arrays = [np.ascontiguousarray(a) for a in arrays]
    perm = np.ascontiguousarray(perm, dtype=np.int64)
    if len(perm) and (perm.min() < 0 or perm.max() >= arrays[0].shape[0]):
        raise ValueError("permutation indexes outside the dataset: "
                         f"[{perm.min()}, {perm.max()}] vs {arrays[0].shape[0]} "
                         "rows (the C++ gather would read out of bounds)")
    n_arr = len(arrays)
    bases = (ctypes.c_void_p * n_arr)(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrays])
    row_bytes = (ctypes.c_int64 * n_arr)(
        *[int(a.dtype.itemsize * int(np.prod(a.shape[1:], dtype=np.int64)))
          for a in arrays])
    handle = lib.batcher_create(
        n_arr, bases, row_bytes, int(arrays[0].shape[0]),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(perm),
        int(batch_size), int(depth), int(num_threads))
    if not handle:
        raise ValueError("native batcher rejected the permutation")
    try:
        while True:
            outs = [np.empty((batch_size,) + a.shape[1:], dtype=a.dtype)
                    for a in arrays]
            out_ptrs = (ctypes.c_void_p * n_arr)(
                *[o.ctypes.data_as(ctypes.c_void_p).value for o in outs])
            rows = lib.batcher_next(handle, out_ptrs)
            if rows == 0:
                break
            yield tuple(o[:rows] for o in outs)
    finally:
        lib.batcher_destroy(handle)

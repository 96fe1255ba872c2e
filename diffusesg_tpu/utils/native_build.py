"""Shared build-and-load machinery for the native (C++) engines.

Used by eval/native (VOC F1 matcher) and data/native (batch assembler).
Guarantees:
  * build is ATOMIC: g++ writes a per-process temp file which is
    os.rename()d over the target, so a concurrent process can never dlopen
    a half-written library (multi-host training starts several processes
    at once on a fresh checkout);
  * missing compiler, missing source, or failed load all degrade to None —
    callers fall back to their numpy implementations.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess


def load_native_lib(src: str, so: str, extra_flags: tuple = ()):
    """Build (if stale) and dlopen ``so`` from ``src``; None on any failure."""
    try:
        if not os.path.exists(so) or (os.path.exists(src) and
                                      os.path.getmtime(so) < os.path.getmtime(src)):
            if not os.path.exists(src):
                logging.info("native source %s missing; using numpy fallback", src)
                return None
            tmp = f"{so}.build.{os.getpid()}"
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                            *extra_flags, src, "-o", tmp],
                           check=True, capture_output=True)
            os.rename(tmp, so)  # atomic on POSIX: losers just overwrite
        return ctypes.CDLL(so)
    except Exception as e:  # no compiler / sandboxed build / bad lib
        logging.info("native library %s unavailable (%s); using numpy fallback",
                     os.path.basename(so), e)
        return None

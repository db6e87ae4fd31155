"""Native (C++) host-runtime components, built on demand with g++.

- lap: batched Jonker-Volgenant linear assignment (threaded) for host-side
  metric evaluation.
- loader: threaded pread-based bulk npy block reader for the input pipeline.

Both have pure-Python fallbacks; import failures degrade gracefully.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import os.path as osp
import subprocess
from typing import Optional

_DIR = osp.dirname(osp.abspath(__file__))
_BUILD_DIR = osp.join(_DIR, "_build")


def _build(name: str) -> Optional[str]:
    """Compile <name>.cpp into a cached shared library; returns its path."""
    src = osp.join(_DIR, name + ".cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = osp.join(_BUILD_DIR, f"{name}-{digest}.so")
    if osp.exists(out):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = out + ".tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, out)
        return out
    except Exception:
        return None


_lap_lib = None
_loader_lib = None


def lap_lib() -> Optional[ctypes.CDLL]:
    global _lap_lib
    if _lap_lib is None:
        path = _build("lap")
        if path is not None:
            lib = ctypes.CDLL(path)
            lib.lap_solve_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p,
            ]
            lib.lap_solve_batch.restype = None
            _lap_lib = lib
        else:
            _lap_lib = False
    return _lap_lib or None


def loader_lib() -> Optional[ctypes.CDLL]:
    global _loader_lib
    if _loader_lib is None:
        path = _build("loader")
        if path is not None:
            lib = ctypes.CDLL(path)
            lib.read_blocks.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.read_blocks.restype = ctypes.c_int
            _loader_lib = lib
        else:
            _loader_lib = False
    return _loader_lib or None


def lap_solve_batch(cost, maximize: bool = False, n_threads: int = 8):
    """Batched LAP via the native solver; falls back to scipy.

    :param cost: (B, K, K) float array.  :return: (B, K) int32 col_ind.
    """
    import numpy as np

    cost = np.ascontiguousarray(cost, dtype=np.float32)
    B, K, _ = cost.shape
    lib = lap_lib()
    if lib is None:
        from scipy.optimize import linear_sum_assignment

        out = np.zeros((B, K), dtype=np.int32)
        for b in range(B):
            _, col = linear_sum_assignment(cost[b], maximize=maximize)
            out[b] = col
        return out
    out = np.zeros((B, K), dtype=np.int32)
    lib.lap_solve_batch(
        cost.ctypes.data, B, K, int(maximize), n_threads, out.ctypes.data
    )
    return out

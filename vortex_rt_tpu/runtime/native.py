"""ctypes binding for the native host library (csrc/libvrt.so).

The reference's host runtime is native C++ (drivers, allocator, scene/BVH
build); our native component accelerates the host-side hot path — the
binned-SAH BVH build — with a pure-NumPy fallback when the library isn't
built.  Build once with ``sh csrc/build.sh`` (auto-attempted on first use).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_CSRC, "libvrt.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["sh", os.path.join(_CSRC, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.vrt_build_bvh2.restype = ctypes.c_int
    lib.vrt_build_bvh2.argtypes = [
        f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, i32p, i32p, i32p, ctypes.c_int,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def build_bvh2_native(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                      max_leaf_tris: int = 4, sah_bins: int = 8):
    """Native binned-SAH build; returns accel.bvh2.BVH2 or None if the
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from vortex_rt_tpu.accel.bvh2 import BVH2

    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    t = v0.shape[0]
    cap = 2 * t + 2
    nm = np.empty((cap, 3), np.float32)
    nx = np.empty((cap, 3), np.float32)
    lf = np.empty(cap, np.int32)
    tc = np.empty(cap, np.int32)
    ti = np.empty(t, np.int32)
    n = lib.vrt_build_bvh2(v0, v1, v2, t, max_leaf_tris, sah_bins,
                           nm, nx, lf, tc, ti, cap)
    if n < 0:
        raise RuntimeError(f"vrt_build_bvh2 failed ({n})")
    return BVH2(node_min=nm[:n].copy(), node_max=nx[:n].copy(),
                left_first=lf[:n].copy(), tri_count=tc[:n].copy(),
                tri_idx=ti)

"""ctypes binding for the native host-grid library (csrc/hostgrid.c).

The TPU compute path is JAX/Pallas; the runtime AROUND it keeps some
host-side hot loops (cell bucketing for capacity planning, the tier
band audit) whose Python fallbacks scale poorly past ~10^6 particles.
This module compiles csrc/hostgrid.c once into build/ and exposes the
entry points; every caller has a numpy fallback, so a missing compiler
degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "hostgrid.c")
_SO = os.path.join(_REPO, "build", "libhostgrid.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            os.makedirs(os.path.dirname(_SO), exist_ok=True)
            subprocess.run(
                ["cc", "-O3", "-march=native", "-shared", "-fPIC",
                 _SRC, "-o", _SO, "-lm"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        D = ctypes.POINTER(ctypes.c_double)
        lib.hg_max_cell_count.restype = ctypes.c_int64
        lib.hg_max_cell_count.argtypes = (
            [D] * 3 + [ctypes.c_int64] + [ctypes.c_double] * 6
            + [ctypes.c_int64] * 3)
        lib.hg_band_audit.restype = ctypes.c_int64
        lib.hg_band_audit.argtypes = (
            [D] * 4 + [ctypes.c_int64] + [D] * 3 + [ctypes.c_int64]
            + [ctypes.c_double] * 6 + [ctypes.c_int32] * 3
            + [ctypes.c_int64] * 3)
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _dp(a):
    a = np.ascontiguousarray(a, np.float64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def max_cell_count_native(x, y, z, box, nx: int, ny: int, nz: int):
    """Native max per-cell count, or None if the library is missing."""
    lib = _load()
    if lib is None:
        return None
    xk, xp = _dp(x)
    yk, yp = _dp(y)
    zk, zp = _dp(z)
    r = lib.hg_max_cell_count(xp, yp, zp, len(xk), box.xmin, box.ymin,
                              box.zmin, box.lx, box.ly, box.lz, nx, ny, nz)
    return None if r < 0 else int(r)


def band_audit_native(xi, yi, zi, hi, xj, yj, zj, box,
                      nx: int, ny: int, nz: int):
    """Native exact band audit, or None if the library is missing."""
    lib = _load()
    if lib is None:
        return None
    ai = [_dp(v) for v in (xi, yi, zi, hi)]
    aj = [_dp(v) for v in (xj, yj, zj)]
    per = [int(p) for p in box.periodic]
    r = lib.hg_band_audit(
        ai[0][1], ai[1][1], ai[2][1], ai[3][1], len(ai[0][0]),
        aj[0][1], aj[1][1], aj[2][1], len(aj[0][0]),
        box.xmin, box.ymin, box.zmin, box.lx, box.ly, box.lz,
        per[0], per[1], per[2], nx, ny, nz)
    return None if r < 0 else int(r)

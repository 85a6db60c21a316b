"""Native (C++) host runtime: exact-semantics CPU projector oracle.

ctypes bindings over ``tomonative.cpp`` (built on demand with g++ +
OpenMP). Plays the role the reference fills with its f2py Fortran modules
on the host side: a fast exact CPU implementation for validation and for
explicit sparse-system workflows. Gracefully degrades (``AVAILABLE=False``)
when no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_tomonative.so")
_SRC = os.path.join(_HERE, "tomonative.cpp")

_lib = None
AVAILABLE = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, AVAILABLE
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
    except Exception:
        AVAILABLE = False
        return None

    i64 = ctypes.c_int64
    f64 = ctypes.c_double
    pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    pi = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.ray_forward_f64.argtypes = [pd, pd, pd, i64, i64, i64, i64, i64,
                                    f64, pd]
    lib.ray_adjoint_f64.argtypes = [pd, pd, pd, i64, i64, i64, i64, i64,
                                    f64, pd]
    lib.ray_forward_grad_f64.argtypes = [pd, pd, pd, pd, pd, f64, i64, i64,
                                         i64, i64, i64, f64, pd, pd]
    lib.ray_sparse_coo_f64.argtypes = [pd, pd, i64, i64, i64, i64, i64, f64,
                                       pi, pi, pd]
    lib.ray_sparse_coo_f64.restype = i64
    _lib = lib
    AVAILABLE = True
    return lib


def _view_setup(geom, phi, alpha, beta, t, cor):
    """Host f64 ray setup with reference semantics (same math as
    ``projector._ray_setup``, NumPy)."""

    def rot_z(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([(c, -s, 0.0), (s, c, 0.0), (0.0, 0.0, 1.0)])

    def rot_x(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([(1.0, 0.0, 0.0), (0.0, c, -s), (0.0, s, c)])

    def rot_y(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([(c, 0.0, s), (0.0, 1.0, 0.0), (-s, 0.0, c)])

    src = geom.source_centers_np().copy()
    det = geom.det_centers_np().copy()
    cor = np.asarray(cor, np.float64)
    src[0] += cor[0]
    det[0] += cor[0]
    rpa = rot_z(phi) @ rot_x(alpha)
    R = rpa @ rot_y(beta)
    t = np.asarray(t, np.float64)
    origin = geom.vox_origin_np()
    p0 = rpa @ (rot_y(beta) @ src + t[:, None]) - origin[:, None]
    v = det[:, 0] - src[:, 0]
    d_hat = (R @ v) / geom.ray_length
    return np.ascontiguousarray(p0), np.ascontiguousarray(d_hat)


def forward_view(vol, geom, phi, alpha, beta, t, cor=np.zeros(3)):
    """Exact f64 forward projection of one view on CPU (multithreaded)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("tomonative unavailable (no compiler?)")
    p0, d_hat = _view_setup(geom, phi, alpha, beta, t, cor)
    nx, ny, nz = geom.vox_shape
    out = np.zeros(geom.n_det, np.float64)
    lib.ray_forward_f64(p0, d_hat,
                        np.ascontiguousarray(vol, np.float64).ravel(),
                        nx, ny, nz, geom.n_det, geom.n_steps,
                        geom.step_size, out)
    return out


def backproject_view(y, geom, phi, alpha, beta, t, cor=np.zeros(3)):
    lib = _load()
    if lib is None:
        raise RuntimeError("tomonative unavailable (no compiler?)")
    p0, d_hat = _view_setup(geom, phi, alpha, beta, t, cor)
    nx, ny, nz = geom.vox_shape
    out = np.zeros(nx * ny * nz, np.float64)
    lib.ray_adjoint_f64(p0, d_hat, np.ascontiguousarray(y, np.float64),
                        nx, ny, nz, geom.n_det, geom.n_steps,
                        geom.step_size, out)
    return out.reshape(geom.vox_shape)


def sparse_view_coo(geom, phi, alpha, beta, t, cor=np.zeros(3)):
    """COO (det_inds, dat_inds, wts) for one view — the explicit sparse
    system-matrix factory (trilinear_ray_sparse role)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("tomonative unavailable (no compiler?)")
    p0, d_hat = _view_setup(geom, phi, alpha, beta, t, cor)
    nx, ny, nz = geom.vox_shape
    cap = 8 * geom.n_det * geom.n_steps
    det_inds = np.zeros(cap, np.int32)
    dat_inds = np.zeros(cap, np.int32)
    wts = np.zeros(cap, np.float64)
    n = lib.ray_sparse_coo_f64(p0, d_hat, nx, ny, nz, geom.n_det,
                               geom.n_steps, geom.step_size, det_inds,
                               dat_inds, wts)
    return det_inds[:n], dat_inds[:n], wts[:n]


def is_available() -> bool:
    _load()
    return AVAILABLE

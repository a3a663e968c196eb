"""ctypes bindings for the native host library (cpp/vpho_native.cpp).

Auto-builds ``libvpho_native.so`` with g++ on first import when missing, and
degrades to numpy implementations when no compiler is available — callers
never need to care (``HAS_NATIVE`` reports which path is live).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
HAS_NATIVE = False

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
_SO_PATH = os.path.abspath(os.path.join(_CPP_DIR, "libvpho_native.so"))


def _load():
    global _LIB, HAS_NATIVE
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["sh", os.path.join(_CPP_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.vpho_fps.argtypes = [f32p, i64, i64, i64, i64p]
    lib.vpho_min_dist.argtypes = [f32p, i64, f32p, i64, f32p, i64p]
    lib.vpho_stamp_heatmaps.argtypes = [f32p, i64, i64, ctypes.c_float, f32p]
    lib.vpho_contact_weight.argtypes = [f32p, i64, ctypes.c_float, ctypes.c_float,
                                        ctypes.c_float, ctypes.c_float, f32p]
    _LIB = lib
    HAS_NATIVE = True
    return lib


def farthest_point_sampling(verts: np.ndarray, k: int, start_idx: int = 0) -> np.ndarray:
    """FPS indices; native O(nk) kernel or numpy fallback."""
    verts = np.ascontiguousarray(verts, np.float32)
    n = verts.shape[0]
    if n <= k:
        return np.arange(n)
    lib = _load()
    if lib is not None:
        out = np.empty(k, np.int64)
        lib.vpho_fps(verts, n, k, start_idx, out)
        return out
    # numpy fallback
    chosen = np.empty(k, np.int64)
    chosen[0] = start_idx
    d2 = ((verts - verts[start_idx]) ** 2).sum(-1)
    for i in range(1, k):
        idx = int(d2.argmax())
        chosen[i] = idx
        d2 = np.minimum(d2, ((verts - verts[idx]) ** 2).sum(-1))
    return chosen


def min_dist(a: np.ndarray, b: np.ndarray):
    """Per-point min distance from a (na,3) to b (nb,3) + nearest index."""
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    lib = _load()
    if lib is not None:
        dist = np.empty(a.shape[0], np.float32)
        idx = np.empty(a.shape[0], np.int64)
        lib.vpho_min_dist(a, a.shape[0], b, b.shape[0], dist, idx)
        return dist, idx
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    idx = d2.argmin(-1)
    return np.sqrt(d2.min(-1)).astype(np.float32), idx.astype(np.int64)


def stamp_heatmaps(pts: np.ndarray, res: int, sigma: float) -> np.ndarray:
    """(J, 2) pixel coords -> (J, res, res) HigherHRNet-stamped gaussians."""
    pts = np.ascontiguousarray(pts, np.float32)
    lib = _load()
    if lib is not None:
        out = np.zeros((pts.shape[0], res, res), np.float32)
        lib.vpho_stamp_heatmaps(pts, pts.shape[0], res, sigma, out)
        return out
    # numpy fallback: full-grid formula (ops/heatmap.py semantics)
    x = np.floor(pts[:, 0])
    y = np.floor(pts[:, 1])
    grid = np.arange(res, dtype=np.float32)
    dx = grid[None] - x[:, None]
    dy = grid[None] - y[:, None]
    win = 3 * sigma + 1.0
    gx = np.exp(-(dx**2) / (2 * sigma**2)) * (np.abs(dx) <= win)
    gy = np.exp(-(dy**2) / (2 * sigma**2)) * (np.abs(dy) <= win)
    hm = gy[:, :, None] * gx[:, None, :]
    in_range = (x >= 0) & (y >= 0) & (x < res) & (y < res)
    return (hm * in_range[:, None, None]).astype(np.float32)


def contact_weight(normal_dist: np.ndarray, lo=-0.01, hi=0.01,
                   decay_lo=-0.005, decay_hi=0.005) -> np.ndarray:
    """Sigmoid contact band weighting (physics_fn.py:96-112)."""
    nd = np.ascontiguousarray(normal_dist, np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty(nd.shape[0], np.float32)
        lib.vpho_contact_weight(nd, nd.shape[0], lo, hi, decay_lo, decay_hi, out)
        return out
    mid1 = (decay_lo + lo) / 2
    mid2 = (decay_hi + hi) / 2
    with np.errstate(over="ignore"):
        m1 = 1 + np.exp(-1600 * (nd - mid1))
        m2 = 1 + np.exp(1600 * (nd - mid2))
        v = 1 / (m1 * m2 + 1e-10)
    v[~np.isfinite(m1)] = 0
    v[~np.isfinite(m2)] = 0
    scale = 1 / ((1 + np.exp(-1600 * (0 - mid1))) * (1 + np.exp(1600 * (0 - mid2))) + 1e-10)
    return (v / scale).astype(np.float32)

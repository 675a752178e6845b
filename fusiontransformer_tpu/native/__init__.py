"""ctypes bindings for the native host data-plane kernels (ftx_host.cpp).

Compiles the shared library on first import if g++ is available (build is
cached next to the source); every entry point has a numpy fallback so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "ftx_host.cpp")
_LIB_PATH = osp.join(_HERE, "libftx_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not osp.exists(_LIB_PATH) or (
                    os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            lib.ftx_quantize.restype = ctypes.c_int32
            lib.ftx_quantize.argtypes = [i32p, ctypes.c_int32, i32p, i32p]
            lib.ftx_map_labels.restype = None
            lib.ftx_map_labels.argtypes = [i64p, ctypes.c_int32, i64p,
                                           ctypes.c_int32, i64p]
            lib.ftx_project_frustum.restype = ctypes.c_int32
            lib.ftx_project_frustum.argtypes = [f32p, ctypes.c_int32, f32p,
                                                ctypes.c_float, ctypes.c_float,
                                                u8p, f32p]
            lib.ftx_inbounds_mask.restype = ctypes.c_int32
            lib.ftx_inbounds_mask.argtypes = [f32p, ctypes.c_int32,
                                              ctypes.c_float, u8p]
            lib.ftx_slot_triples.restype = ctypes.c_int32
            lib.ftx_slot_triples.argtypes = [i64p, ctypes.c_int32,
                                             ctypes.c_int32, i32p, i32p, i32p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def quantize(coords: np.ndarray):
    """Native sort-based unique; same contract as data.quantize.sparse_quantize."""
    lib = get_lib()
    coords = np.ascontiguousarray(coords, np.int32)
    n = len(coords)
    if lib is None or n == 0:
        _, uniq, inv = np.unique(coords, axis=0, return_index=True,
                                 return_inverse=True)
        return uniq.astype(np.int64), inv.reshape(-1).astype(np.int64)
    unique_idx = np.empty(n, np.int32)
    inverse = np.empty(n, np.int32)
    n_unique = lib.ftx_quantize(coords, n, unique_idx, inverse)
    return (unique_idx[:n_unique].astype(np.int64),
            inverse.astype(np.int64))


def slot_triples(keys: np.ndarray, limit: int):
    """Native ks3 live-neighbor join over one level's sorted unique Morton
    keys -> (dst, tap, src) int32 triples, or None (numpy fallback lives in
    ops.host_slots.scan_slot_triples)."""
    lib = get_lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, np.int64)
    n = len(keys)
    dst = np.empty(27 * n, np.int32)
    tap = np.empty(27 * n, np.int32)
    src = np.empty(27 * n, np.int32)
    m = lib.ftx_slot_triples(keys, n, int(limit), dst, tap, src)
    return dst[:m], tap[:m], src[:m]


def map_labels(labels: np.ndarray, lut: np.ndarray):
    lib = get_lib()
    labels = np.ascontiguousarray(labels, np.int64)
    lut = np.ascontiguousarray(lut, np.int64)
    if lib is None:
        return lut[np.clip(labels, 0, len(lut) - 1)]
    out = np.empty_like(labels)
    lib.ftx_map_labels(labels, len(labels), lut, len(lut), out)
    return out


def project_frustum(points: np.ndarray, proj: np.ndarray, img_w: float,
                    img_h: float):
    """Returns (keep mask [n] bool, rowcol [n_keep, 2] float32)."""
    lib = get_lib()
    points = np.ascontiguousarray(points[:, :3], np.float32)
    proj = np.ascontiguousarray(proj, np.float32)
    n = len(points)
    if lib is None:
        keep = points[:, 0] > 0
        pts_h = np.concatenate(
            [points[keep], np.ones((int(keep.sum()), 1), np.float32)], 1)
        ip = (proj @ pts_h.T).T
        ip = ip[:, :2] / ip[:, 2:3]
        ok = ((ip[:, 0] > 0) & (ip[:, 0] < img_w)
              & (ip[:, 1] > 0) & (ip[:, 1] < img_h))
        keep[keep] = ok
        return keep, np.fliplr(ip[ok]).astype(np.float32)
    keep = np.empty(n, np.uint8)
    rowcol = np.empty((n, 2), np.float32)
    lib.ftx_project_frustum(points, n, proj, float(img_w), float(img_h),
                            keep, rowcol)
    keep = keep.astype(bool)
    return keep, rowcol[keep]

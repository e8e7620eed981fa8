"""ctypes bindings for the native runtime library (native/slam_native.cpp).

Builds the shared library on first import if the toolchain is available;
every entry point has a pure-numpy fallback so the framework stays usable
without a compiler. See native/slam_native.cpp for the reference
counterparts of each function.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libslam_native.so")

_lib = None


def _build():
    subprocess.run(
        ["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True
    )


def lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH)
            < os.path.getmtime(os.path.join(_NATIVE_DIR, "slam_native.cpp"))
        ):
            _build()
        l = ctypes.CDLL(_SO_PATH)
        l.decode_png_gray.restype = ctypes.c_int
        l.decode_png_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        l.loader_create.restype = ctypes.c_void_p
        l.loader_get.restype = ctypes.c_int
        l.loader_get.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        l.loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = l
    except Exception:
        _lib = False
    return _lib or None


def available() -> bool:
    return lib() is not None


# ----------------------------------------------------------------- imaging
def decode_png_gray(path: str, max_h: int = 4096, max_w: int = 4096):
    """float32 grayscale (H, W) in [0, 255]; None if native unavailable or
    the file is not a PNG."""
    l = lib()
    if l is None:
        return None
    buf = np.empty((max_h, max_w), np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = l.decode_png_gray(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_h, max_w, ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        return None
    return buf.reshape(-1)[: h.value * w.value].reshape(h.value, w.value).copy()


# ------------------------------------------------------------- map kernels
def covisibility_weights(kf_matches, kf_valid, target: int, max_pt: int):
    """(K,) shared-point counts vs keyframe `target`."""
    l = lib()
    k, n = kf_matches.shape
    if l is None:
        return None
    km = np.ascontiguousarray(kf_matches, np.int32)
    kv = np.ascontiguousarray(kf_valid, np.uint8)
    scratch = np.zeros(max_pt, np.uint8)
    out = np.zeros(k, np.int64)
    l.covisibility_weights(
        km.ctypes.data_as(ctypes.c_void_p), kv.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(k), ctypes.c_int64(n), ctypes.c_int64(target),
        ctypes.c_int64(max_pt),
        scratch.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def point_obs_counts(kf_matches, kf_valid, max_pt: int):
    l = lib()
    if l is None:
        return None
    k, n = kf_matches.shape
    km = np.ascontiguousarray(kf_matches, np.int32)
    kv = np.ascontiguousarray(kf_valid, np.uint8)
    out = np.zeros(max_pt, np.int64)
    l.point_obs_counts(
        km.ctypes.data_as(ctypes.c_void_p), kv.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(k), ctypes.c_int64(n), ctypes.c_int64(max_pt),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def covisibility_matrix(kf_matches, kf_valid, max_pt: int):
    l = lib()
    if l is None:
        return None
    k, n = kf_matches.shape
    km = np.ascontiguousarray(kf_matches, np.int32)
    kv = np.ascontiguousarray(kf_valid, np.uint8)
    out = np.zeros((k, k), np.int32)
    l.covisibility_matrix(
        km.ctypes.data_as(ctypes.c_void_p), kv.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(k), ctypes.c_int64(n), ctypes.c_int64(max_pt),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def update_point_stats(
    kf_matches, kf_valid, kf_desc, kf_size, kf_centers, pt_ids, pt_pos,
    pt_ref_kf, pt_desc, pt_normal, pt_ref_size, pt_ref_dist, pt_min_dist,
    pt_max_dist,
):
    """One-pass distinctive-descriptor + normal + scale-band recompute for
    the given point ids. Writes in place into the pt_* arrays; returns True
    when the native kernel ran, None when unavailable."""
    l = lib()
    if l is None:
        return None
    k, n = kf_matches.shape
    d = kf_desc.shape[2]
    is_binary = 1 if kf_desc.dtype == np.uint8 else 0
    km = np.ascontiguousarray(kf_matches, np.int32)
    kv = np.ascontiguousarray(kf_valid, np.uint8)
    kd = np.ascontiguousarray(kf_desc)
    ks = np.ascontiguousarray(kf_size, np.float32)
    kc = np.ascontiguousarray(kf_centers, np.float32)
    pi = np.ascontiguousarray(pt_ids, np.int64)
    pp = np.ascontiguousarray(pt_pos, np.float32)
    pr = np.ascontiguousarray(pt_ref_kf, np.int32)
    assert pt_desc.flags["C_CONTIGUOUS"] and pt_normal.flags["C_CONTIGUOUS"]
    vp = ctypes.c_void_p
    l.update_point_stats(
        km.ctypes.data_as(vp), kv.ctypes.data_as(vp), kd.ctypes.data_as(vp),
        ctypes.c_int(is_binary), ks.ctypes.data_as(vp), kc.ctypes.data_as(vp),
        ctypes.c_int64(k), ctypes.c_int64(n), ctypes.c_int64(d),
        ctypes.c_int64(pt_pos.shape[0]),
        pi.ctypes.data_as(vp), ctypes.c_int64(len(pi)),
        pp.ctypes.data_as(vp), pr.ctypes.data_as(vp),
        pt_desc.ctypes.data_as(vp), pt_normal.ctypes.data_as(vp),
        pt_ref_size.ctypes.data_as(vp), pt_ref_dist.ctypes.data_as(vp),
        pt_min_dist.ctypes.data_as(vp), pt_max_dist.ctypes.data_as(vp),
    )
    return True


# ------------------------------------------------------------------ loader
class FrameLoader:
    """Prefetching frame loader over the native decode thread. Falls back
    to synchronous PIL loading when the native library is unavailable."""

    def __init__(self, paths, height: int, width: int, ahead: int = 4):
        self.paths = list(paths)
        self.h, self.w = height, width
        self._handle = None
        l = lib()
        if l is not None and all(p.lower().endswith(".png") for p in self.paths):
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._paths_keepalive = arr
            self._handle = l.loader_create(
                arr, ctypes.c_int64(len(self.paths)), height, width, ahead
            )

    def get(self, idx: int) -> np.ndarray:
        if self._handle is not None:
            out = np.empty((self.h, self.w), np.float32)
            rc = lib().loader_get(
                self._handle, idx, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            if rc == 0:
                return out
        from .io import dataset

        return dataset.load_gray(self.paths[idx])

    def close(self):
        if self._handle is not None:
            lib().loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

"""ctypes bridge to the native frame-preprocessing kernels
(native/frame_ops.cpp). Compiled with g++ on first use and cached; every
entry point has a numpy/PIL fallback so the package works without a
toolchain.
"""
import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                       "frame_ops.cpp")
    src = os.path.abspath(src)
    if not os.path.exists(src):
        return None
    cache = os.path.join(tempfile.gettempdir(), "easyanimate_tpu_native")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "frame_ops.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64
        lib.resize_crop_normalize.argtypes = [u8p, i64, i64, i64, i64, i64,
                                              f32p]
        lib.to_chw_normalized.argtypes = [u8p, i64, i64, i64, f32p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def resize_crop_normalize(frames: np.ndarray, out_h: int,
                          out_w: int) -> np.ndarray:
    """(T,H,W,3) uint8 -> (3,T,out_h,out_w) float32 in [0,1]; native fused
    bilinear resize + center crop + normalize, PIL fallback."""
    frames = np.ascontiguousarray(frames, np.uint8)
    t, h, w, _ = frames.shape
    lib = _build_and_load()
    if lib is not None:
        out = np.empty((3, t, out_h, out_w), np.float32)
        lib.resize_crop_normalize(frames, t, h, w, out_h, out_w, out)
        return out
    from .dataset import resize_center_crop

    px = resize_center_crop(frames, out_h, out_w).astype(np.float32) / 255.0
    return np.transpose(px, (3, 0, 1, 2))


def to_chw_normalized(frames: np.ndarray) -> np.ndarray:
    """(T,H,W,3) uint8 -> (3,T,H,W) float32 in [-1,1]."""
    frames = np.ascontiguousarray(frames, np.uint8)
    t, h, w, _ = frames.shape
    lib = _build_and_load()
    if lib is not None:
        out = np.empty((3, t, h, w), np.float32)
        lib.to_chw_normalized(frames, t, h, w, out)
        return out
    return np.transpose(frames.astype(np.float32) * (2.0 / 255.0) - 1.0,
                        (3, 0, 1, 2))

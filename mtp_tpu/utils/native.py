"""ctypes loader for the native host library (native/mtp_native.cc).

Builds libmtp_native.so with g++ on first use (cached); every consumer has a
pure-python fallback, so the library is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "mtp_native.cc")
_LIB = os.path.join(_ROOT, "native", "libmtp_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    stale = (os.path.exists(_LIB) and os.path.exists(_SRC)
             and os.path.getmtime(_SRC) > os.path.getmtime(_LIB))
    if (not os.path.exists(_LIB) or stale) and os.path.exists(_SRC):
        if not _build() and not os.path.exists(_LIB):
            return None
    if not os.path.exists(_LIB):
        return None
    lib = ctypes.CDLL(_LIB)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.rle_decode.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int64, u8p]
    lib.rle_encode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, i64p,
                               ctypes.c_int64]
    lib.rle_encode.restype = ctypes.c_int64
    lib.rbox_iou.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64, f32p]
    try:  # symbols absent in pre-round-2 builds of the .so
        lib.quad_iou.argtypes = [f32p, ctypes.c_int64, f32p,
                                 ctypes.c_int64, f32p]
    except AttributeError:
        pass
    try:  # symbol absent in pre-round-2 builds of the .so
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.mask_iou_packed.argtypes = [u8p, ctypes.c_int64, u8p,
                                        ctypes.c_int64, ctypes.c_int64, u8p,
                                        f64p, f64p, f64p]
    except AttributeError:
        pass
    _lib = lib
    return _lib


def rle_decode_native(counts: np.ndarray, h: int, w: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((h, w), np.uint8)
    lib.rle_decode(np.ascontiguousarray(counts, np.int64), len(counts), h, w, out)
    return out


def rle_encode_native(mask: np.ndarray) -> Optional[list]:
    lib = get_lib()
    if lib is None:
        return None
    h, w = mask.shape
    out = np.zeros(h * w + 2, np.int64)
    n = lib.rle_encode(np.ascontiguousarray(mask, np.uint8), h, w, out,
                       len(out))
    if n < 0:
        return None
    return out[:n].tolist()


def mask_iou_native(dt: np.ndarray, gt: np.ndarray, crowd: np.ndarray):
    """(ious (D,G) f64, d_areas, g_areas) from dense binary masks
    (D,H,W)/(G,H,W) via the packed-popcount C++ kernel, or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "mask_iou_packed"):
        return None
    D, G = len(dt), len(gt)
    dp = np.packbits(dt.reshape(D, -1).astype(bool), axis=1)
    gp = np.packbits(gt.reshape(G, -1).astype(bool), axis=1)
    nbytes = dp.shape[1]
    pad = (-nbytes) % 8  # 8-byte rows: aligned whole-word popcounts
    if pad:
        dp = np.pad(dp, ((0, 0), (0, pad)))
        gp = np.pad(gp, ((0, 0), (0, pad)))
        nbytes += pad
    out = np.zeros((D, G), np.float64)
    da = np.zeros(D, np.float64)
    ga = np.zeros(G, np.float64)
    lib.mask_iou_packed(np.ascontiguousarray(dp), D,
                        np.ascontiguousarray(gp), G, nbytes,
                        np.ascontiguousarray(crowd, np.uint8), out, da, ga)
    return out, da, ga


def rbox_iou_native(a: np.ndarray, b: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    out = np.zeros((len(a), len(b)), np.float32)
    if len(a) and len(b):
        lib.rbox_iou(a, len(a), b, len(b), out)
    return out


def quad_iou_native(a: np.ndarray, b: np.ndarray) -> Optional[np.ndarray]:
    """(N,8)x(M,8) convex-quad IoU via the C++ clipping kernel, or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "quad_iou"):
        return None
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    out = np.zeros((len(a), len(b)), np.float32)
    if len(a) and len(b):
        lib.quad_iou(a, len(a), b, len(b), out)
    return out

"""ctypes bindings for the native host-ops library.

Builds hostops.cpp with g++ on first use (cached as hostops.so next to the
source); every entry point has a pure-numpy fallback in crog_tpu.ops, so the
framework degrades gracefully where no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "hostops.cpp")
_SO = os.path.join(_DIR, "hostops.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> bool:
    # NO -ffast-math and contraction off: the warp kernel places FMAs
    # exactly where cv2's arithmetic has them (see hostops.cpp header)
    cmd = [
        "g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
        "-fPIC", "-o", _SO, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        dptr = ctypes.POINTER(ctypes.c_double)
        u8ptr = ctypes.POINTER(ctypes.c_uint8)
        f32ptr = ctypes.POINTER(ctypes.c_float)
        ci = ctypes.c_int
        lib.warp_affine_u8.argtypes = [
            u8ptr, ci, ci, ci, dptr, ci, ci, ci, dptr, u8ptr,
        ]
        lib.warp_affine_f32.argtypes = [
            f32ptr, ci, ci, ci, dptr, ci, ci, ci, dptr, f32ptr,
        ]
        lib.warp_axis_aligned_u8.argtypes = lib.warp_affine_u8.argtypes
        lib.warp_axis_aligned_f32.argtypes = lib.warp_affine_f32.argtypes
        lib.polygon_fill.argtypes = [
            dptr, dptr, ci, dptr, ci, ci, ci, ci, ctypes.c_double,
        ]
        lib.gaussian_blur_f64.argtypes = [dptr, ci, ci, ctypes.c_double, dptr]
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


_INTERP = {"nearest": 0, "linear": 1, "cubic": 2}


def warp_affine(img: np.ndarray, mat: np.ndarray, out_size, interpolation,
                border_value=0.0):
    """Native warpAffine; same signature/semantics as ops.affine.warp_affine_np.
    Returns None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out_w, out_h = out_size
    squeeze = img.ndim == 2
    src = np.ascontiguousarray(img[..., None] if squeeze else img)
    h, w, c = src.shape
    border = np.ascontiguousarray(
        np.broadcast_to(np.asarray(border_value, np.float64), (c,))
    )
    mat = np.ascontiguousarray(np.asarray(mat, np.float64)).reshape(6)
    out = np.empty((out_h, out_w, c), src.dtype)
    dp = ctypes.POINTER(ctypes.c_double)
    if src.dtype == np.uint8:
        fn = lib.warp_affine_u8
        fn(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
            mat.ctypes.data_as(dp), out_h, out_w, _INTERP[interpolation],
            border.ctypes.data_as(dp),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    elif src.dtype == np.float32:
        fn = lib.warp_affine_f32
        fn(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, c,
            mat.ctypes.data_as(dp), out_h, out_w, _INTERP[interpolation],
            border.ctypes.data_as(dp),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    else:
        return None
    return out[..., 0] if squeeze else out


def polygon_fill(canvas: np.ndarray, vr, vc, value: float, clip=None) -> bool:
    """Fill a polygon into a float64 canvas in-place (canvas[cc, rr] layout,
    matching the reference's rasterization).  Returns False if unavailable."""
    lib = get_lib()
    if lib is None or canvas.dtype != np.float64:
        return False
    vr = np.ascontiguousarray(np.asarray(vr, np.float64))
    vc = np.ascontiguousarray(np.asarray(vc, np.float64))
    clip_r, clip_c = clip if clip is not None else (0, 0)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.polygon_fill(
        vr.ctypes.data_as(dp), vc.ctypes.data_as(dp), len(vr),
        canvas.ctypes.data_as(dp), canvas.shape[0], canvas.shape[1],
        int(clip_r), int(clip_c), float(value),
    )
    return True


def gaussian_blur(img: np.ndarray, sigma: float):
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(img, np.float64)
    out = np.empty_like(src)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.gaussian_blur_f64(
        src.ctypes.data_as(dp), src.shape[0], src.shape[1], float(sigma),
        out.ctypes.data_as(dp),
    )
    return out

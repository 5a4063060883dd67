"""ctypes bindings for the native (C++) host data plane.

Builds ``runtime/ctadata.cpp`` into a shared library on first use (g++ is
baked into the image; the build is cached next to the source) and exposes
fused decode/normalize kernels. Every entry point has a numpy fallback with
identical semantics, so the framework never hard-depends on the toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_RUNTIME_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "runtime",
)
_SRC = os.path.join(_RUNTIME_DIR, "ctadata.cpp")
_SO = os.path.join(_RUNTIME_DIR, "libctadata.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    """Build locally (the .so is never committed — it is host-ISA-specific:
    -march=native output SIGILLs on older CPUs). Falls back to plain -O3
    when the native-arch build fails."""
    for flags in (["-O3", "-march=native", "-funroll-loops"], ["-O3"]):
        try:
            subprocess.run(
                ["g++", *flags, "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return True
        except Exception:
            continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.dual_window_u16.argtypes = [
            u16p, ctypes.c_int64, ctypes.c_float, ctypes.c_float, f32p, f32p,
        ]
        lib.dual_window_i16.argtypes = [
            i16p, ctypes.c_int64, ctypes.c_float, ctypes.c_float, f32p, f32p,
        ]
        lib.fullrange_u16.argtypes = [u16p, ctypes.c_int64, f32p]
        lib.resize_nearest_f32.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, f32p, ctypes.c_int64,
        ]
        lib.denorm_to_i16.argtypes = [f32p, ctypes.c_int64, i16p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def dual_window_native(
    raw: np.ndarray, wc: float = 50.0, ww: float = 400.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Fused dual-window normalize; falls back to numpy when no native lib."""
    lib = get_lib()
    if lib is None or raw.dtype not in (np.uint16, np.int16):
        from ctagan_tpu.data.datasets import read_dual_window_slice  # noqa: F401

        # numpy fallback (same math as datasets.read_dual_window_slice)
        hu = raw.astype(np.float32) - 1024.0
        win_min = (2 * wc - ww) / 2.0 + 0.5
        d = 255.0 / ((2 * wc + ww) / 2.0 + 0.5 - win_min)
        img1 = np.trunc((hu - win_min) * d)
        np.clip(img1, 0, 255, out=img1)
        img1 = (img1 / 255.0 - 0.5) * 2.0
        img2 = raw.astype(np.float32)
        img2[img2 < 0] = 0
        img2 = (img2 / 4095.0 - 0.5) * 2.0
        return img1.astype(np.float32), img2.astype(np.float32)

    raw = np.ascontiguousarray(raw)
    out_w = np.empty(raw.shape, np.float32)
    out_f = np.empty(raw.shape, np.float32)
    if raw.dtype == np.uint16:
        lib.dual_window_u16(
            _ptr(raw, ctypes.c_uint16), raw.size, wc, ww,
            _ptr(out_w, ctypes.c_float), _ptr(out_f, ctypes.c_float),
        )
    else:
        lib.dual_window_i16(
            _ptr(raw, ctypes.c_int16), raw.size, wc, ww,
            _ptr(out_w, ctypes.c_float), _ptr(out_f, ctypes.c_float),
        )
    return out_w, out_f


def fullrange_native(raw: np.ndarray) -> np.ndarray:
    lib = get_lib()
    if lib is None or raw.dtype != np.uint16:
        img = raw.astype(np.float32)
        img[img < 0] = 0
        return ((img / 4095.0 - 0.5) * 2.0).astype(np.float32)
    raw = np.ascontiguousarray(raw)
    out = np.empty(raw.shape, np.float32)
    lib.fullrange_u16(_ptr(raw, ctypes.c_uint16), raw.size, _ptr(out, ctypes.c_float))
    return out


def resize_nearest_native(img: np.ndarray, size: int) -> np.ndarray:
    lib = get_lib()
    h, w = img.shape
    if (h, w) == (size, size):
        return img
    if lib is None or img.dtype != np.float32:
        ys = np.floor(np.arange(size) * (h / size)).astype(np.int64)
        xs = np.floor(np.arange(size) * (w / size)).astype(np.int64)
        return img[np.ix_(ys, xs)]
    img = np.ascontiguousarray(img)
    out = np.empty((size, size), np.float32)
    lib.resize_nearest_f32(
        _ptr(img, ctypes.c_float), h, w, _ptr(out, ctypes.c_float), size
    )
    return out


def denorm_to_int16_native(img: np.ndarray) -> np.ndarray:
    lib = get_lib()
    if lib is None or img.dtype != np.float32:
        return ((np.asarray(img, np.float32) + 1.0) * 0.5 * 4095.0).astype(np.int16)
    img = np.ascontiguousarray(img)
    out = np.empty(img.shape, np.int16)
    lib.denorm_to_i16(_ptr(img, ctypes.c_float), img.size, _ptr(out, ctypes.c_int16))
    return out

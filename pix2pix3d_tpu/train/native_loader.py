"""ctypes bindings for the native data-path (native/png_reader.cpp).

Builds on demand with `make -C native`; every entry point falls back to the
PIL/numpy implementation when the shared library is unavailable, so the
framework never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libp2p3d_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.join(_REPO_ROOT, "native")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.p2p3d_decode_png.restype = ctypes.c_int
    lib.p2p3d_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.p2p3d_decode_png_batch.restype = ctypes.c_int
    lib.p2p3d_edge_preprocess.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def native_available():
    return _load() is not None


def decode_png(data: bytes, max_side=4096):
    """Decode a PNG blob -> HWC uint8 array, or None if unsupported."""
    lib = _load()
    if lib is None:
        return None
    cap = max_side * max_side * 4
    out = np.empty(cap, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.p2p3d_decode_png(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), cap,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
    if rc != 0:
        return None
    return out[:h.value * w.value * c.value].reshape(h.value, w.value, c.value).copy()


def edge_preprocess(mask_gray: np.ndarray):
    """Invert + 3x3 box blur (native); None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    h, w = mask_gray.shape
    src = np.ascontiguousarray(mask_gray, np.uint8)
    out = np.empty((h, w), np.uint8)
    lib.p2p3d_edge_preprocess(src.tobytes(),
                              out.ctypes.data_as(ctypes.c_void_p), h, w)
    return out

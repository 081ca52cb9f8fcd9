"""ctypes bindings for the native asset-pipeline library (native/).

Lazily builds native/build/libfr_native.so with the repo Makefile on first
use (g++ + system zlib); every entry point degrades gracefully to the
pure-Python implementations when the toolchain or library is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "build" / "libfr_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_SO))
        lib.fr_png_info.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int)]
        lib.fr_png_info.restype = ctypes.c_int
        lib.fr_png_decode_rgba.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                           ctypes.c_void_p]
        lib.fr_png_decode_rgba.restype = ctypes.c_int
        lib.fr_srgb_lut.argtypes = [ctypes.c_void_p]
        lib.fr_srgb_lut.restype = None
        lib.fr_jpeg_info.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
        lib.fr_jpeg_info.restype = ctypes.c_int
        lib.fr_jpeg_decode_rgba.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                            ctypes.c_void_p]
        lib.fr_jpeg_decode_rgba.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_png(data: bytes) -> Optional[np.ndarray]:
    """Decode PNG bytes to (H, W, 4) uint8 RGBA, or None if unsupported."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.fr_png_info(data, len(data), ctypes.byref(w),
                       ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 4), np.uint8)
    rc = lib.fr_png_decode_rgba(data, len(data),
                                out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return out


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """Decode JPEG bytes to (H, W, 4) uint8 RGBA, or None if unsupported."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.fr_jpeg_info(data, len(data), ctypes.byref(w),
                        ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 4), np.uint8)
    rc = lib.fr_jpeg_decode_rgba(data, len(data),
                                 out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return out


def srgb_lut() -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(256, np.float32)
    lib.fr_srgb_lut(out.ctypes.data_as(ctypes.c_void_p))
    return out

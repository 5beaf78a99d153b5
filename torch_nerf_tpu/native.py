"""ctypes bindings for the native C++ image pipeline (native/image_io.cpp).

Builds ``libtn_native.so`` on first use (make in ``native/``) and exposes:

* ``png_decode(path)`` — single PNG -> uint8 (H, W, C) array;
* ``png_decode_batch(paths, h, w, c)`` — multithreaded batch decode straight
  into one float32 (N, H, W, C) buffer in [0, 1];
* ``area_downsample(img, factor)`` — box-filter minification (the native
  replacement for the reference's ImageMagick ``mogrify`` shell-out,
  ``load_llff.py:17-85``).

Every entry point degrades gracefully: if the toolchain or zlib is missing,
callers fall back to PIL (see ``datasets.blender._imread``).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libtn_native.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-s"],
                cwd=_NATIVE_DIR,
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _build_failed = True
        return None

    lib.tn_png_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.tn_png_info.restype = ctypes.c_int
    lib.tn_png_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.tn_png_decode.restype = ctypes.c_int
    lib.tn_png_decode_batch_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_int,
    ]
    lib.tn_png_decode_batch_f32.restype = ctypes.c_int
    lib.tn_area_downsample_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.tn_area_downsample_f32.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def png_decode(path: str | Path) -> Optional[np.ndarray]:
    """Decode one PNG -> (H, W, C) uint8, or None if unsupported/unavailable."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    c = ctypes.c_uint32()
    path_b = str(path).encode()
    if lib.tn_png_info(path_b, ctypes.byref(w), ctypes.byref(h), ctypes.byref(c)) != 0:
        return None
    buf = np.empty((h.value, w.value, c.value), dtype=np.uint8)
    ret = lib.tn_png_decode(
        path_b,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_uint32(buf.size),
        ctypes.byref(w),
        ctypes.byref(h),
        ctypes.byref(c),
    )
    if ret != 0:
        return None
    if c.value == 1:
        return buf[..., 0]
    return buf


def png_decode_batch(
    paths: List[str | Path], height: int, width: int, channels: int, num_threads: int = 4
) -> Optional[np.ndarray]:
    """Batch decode same-sized PNGs -> float32 (N, H, W, C) in [0, 1]."""
    lib = _load()
    if lib is None or not paths:
        return None
    joined = b"\0".join(str(p).encode() for p in paths) + b"\0\0"
    out = np.empty((len(paths), height, width, channels), dtype=np.float32)
    ret = lib.tn_png_decode_batch_f32(
        joined,
        len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_uint32(width),
        ctypes.c_uint32(height),
        ctypes.c_uint32(channels),
        ctypes.c_int(num_threads),
    )
    if ret != 0:
        return None
    return out


def area_downsample(img: np.ndarray, factor: int) -> Optional[np.ndarray]:
    """Box-filter downsample float32 (H, W, C) by an integer factor."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.float32)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    out = np.empty((h // factor, w // factor, c), dtype=np.float32)
    lib.tn_area_downsample_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_uint32(h),
        ctypes.c_uint32(w),
        ctypes.c_uint32(c),
        ctypes.c_uint32(factor),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out

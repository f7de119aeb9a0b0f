"""Native host-plane extension loader (C++ via ctypes, numpy fallback).

The reference's host hot path runs on OpenCV's C++ (cv2 resize/Laplacian,
``lap``'s C Hungarian). Our own native layer covers the per-face per-frame
work the engine does outside cv2: the fused quality metric and batch-buffer
packing. Built with ``make -C stdd_tpu/native`` (attempted automatically
once); every entry point has a numpy fallback so the package works without a
compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libstddnative.so")
_lib: Optional[ctypes.CDLL] = None
_tried_build = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried_build
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _tried_build:
        _tried_build = True
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.crop_lapvar_halfres.restype = ctypes.c_double
        lib.crop_lapvar_halfres.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.resize_area_pack.restype = None
        lib.resize_area_pack.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_double,
        ]
        _lib = lib
    except OSError:
        return None
    except AttributeError:
        # stale .so from before a symbol was added: rebuild once, else fall
        # back to numpy (the documented contract) instead of crashing
        if not _tried_build:
            _tried_build = True
            try:
                subprocess.run(
                    ["make", "-C", _DIR, "-s", "-B"], check=True,
                    capture_output=True, timeout=120,
                )
                return _load()
            except Exception:
                return None
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def crop_lapvar_halfres(crop_rgb: np.ndarray) -> Optional[float]:
    """Fused half-res Laplacian variance; None when the .so is unavailable."""
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(crop_rgb, dtype=np.uint8)
    h, w = c.shape[:2]
    return float(
        lib.crop_lapvar_halfres(
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w
        )
    )


def resize_area_pack(src_rgb: np.ndarray, dst_slot: np.ndarray, scale: float) -> bool:
    """Area-downscale ``src`` by ``scale`` into the (zeroed) square
    ``dst_slot`` in place. Returns False when native is unavailable."""
    lib = _load()
    if lib is None:
        return False
    src = np.ascontiguousarray(src_rgb, dtype=np.uint8)
    assert dst_slot.flags["C_CONTIGUOUS"] and dst_slot.dtype == np.uint8
    h, w = src.shape[:2]
    s = dst_slot.shape[0]
    lib.resize_area_pack(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        dst_slot.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), s,
        ctypes.c_double(scale),
    )
    return True

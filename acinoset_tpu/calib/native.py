"""ctypes binding for the native C++ corner-detection engine.

The JAX detector (`calib.corners`) is the reference implementation and
the TPU-friendly path; this binding loads ``libacinoset_native.so``
(built from ``native/corners.cpp`` — `make -C native`) for fast
multithreaded host-side ingest of calibration footage. Falls back
gracefully when the library hasn't been built.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_SEARCHED = False


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.environ.get("ACINOSET_NATIVE_LIB", ""),
        os.path.join(here, "native", "libacinoset_native.so"),
        os.path.join(here, "native", "build", "libacinoset_native.so"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            lib = ctypes.CDLL(c)
            lib.acinoset_detect_corners.restype = ctypes.c_int
            lib.acinoset_detect_corners.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
            ]
            lib.acinoset_detect_corners_batch.restype = ctypes.c_int
            lib.acinoset_detect_corners_batch.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def _to_gray_f32(image: np.ndarray) -> np.ndarray:
    img = np.asarray(image)
    if img.ndim == 3:
        img = img @ np.array([0.114, 0.587, 0.299])
    img = img.astype(np.float32)
    if img.max() > 2:
        img = img / 255.0
    return np.ascontiguousarray(img)


def find_corners(image: np.ndarray, board_shape: Tuple[int, int]):
    """Native twin of calib.corners.find_corners. Returns (grid, found)."""
    lib = _find_lib()
    if lib is None:
        raise RuntimeError("native library not built; run `make -C native`")
    gray = _to_gray_f32(image)
    H, W = gray.shape
    bh, bw = board_shape
    out = np.zeros((bh * bw * 2,), np.float64)
    ok = lib.acinoset_detect_corners(
        gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), H, W, bh, bw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if not ok:
        return None, False
    return out.reshape(bh, bw, 2), True


def find_corners_batch(
    images: List[np.ndarray], board_shape: Tuple[int, int], n_threads: int = 0
):
    """Detect boards in a stack of same-size images using the C++ thread
    pool. Returns (grids (F, h, w, 2) with NaN where not found, found mask)."""
    lib = _find_lib()
    if lib is None:
        raise RuntimeError("native library not built; run `make -C native`")
    grays = np.stack([_to_gray_f32(im) for im in images])
    F, H, W = grays.shape
    bh, bw = board_shape
    out = np.zeros((F, bh * bw * 2), np.float64)
    found = np.zeros(F, np.int32)
    lib.acinoset_detect_corners_batch(
        np.ascontiguousarray(grays).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        F, H, W, bh, bw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        found.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    )
    grids = out.reshape(F, bh, bw, 2)
    grids[found == 0] = np.nan
    return grids, found.astype(bool)

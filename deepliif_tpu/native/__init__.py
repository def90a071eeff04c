"""Native (C++) host kernels, loaded via ctypes.

Compiled lazily on first use with the system compiler and cached next to the
source. Falls back gracefully (callers check ``available()``) so the pure
numpy/scipy implementations in deepliif_tpu.postprocessing remain the
reference semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'postproc.cc')
_LIB_PATH = os.path.join(_HERE, '_postproc.so')
_lib = None
_tried = False


def _build():
    for cc in ('g++', 'c++', 'clang++'):
        try:
            subprocess.run(
                [cc, '-O3', '-shared', '-fPIC', '-o', _LIB_PATH, _SRC],
                check=True, capture_output=True, timeout=120)
            return True
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            continue
    return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or \
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.moore_trace.restype = ctypes.c_int
    lib.moore_trace.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    lib.label8.restype = ctypes.c_int
    lib.label8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return _lib


def available():
    return _load() is not None


def moore_trace(mask, x, y):
    """Boundary trace; returns (bbox list, boundary list) like the Python
    get_cell_boundary, or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    max_pts = 4 * (h + w) + 16
    while True:
        out = np.empty(max_pts * 2, np.int32)
        bbox = np.empty(4, np.int32)
        n = lib.moore_trace(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, x, y,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_pts,
            bbox.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if n >= 0:
            pts = out[:2 * n].reshape(-1, 2)
            return ([(int(bbox[0]), int(bbox[1])), (int(bbox[2]), int(bbox[3]))],
                    [(int(a), int(b)) for a, b in pts])
        if max_pts > 16 * (h * w + 16):
            return None
        max_pts *= 4


def label8(mask):
    """8-connected labeling (raster first-pixel order); returns
    (labels int32 array, n) or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    labels = np.zeros((h, w), np.int32)
    n = lib.label8(mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
                   labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if n < 0:
        return None
    return labels, n

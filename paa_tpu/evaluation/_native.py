"""ctypes binding for the native COCO evaluation kernels.

Compiles paa_tpu/csrc/cocoeval.cpp on first use (cached next to the
source; pybind11 is not available in this image, so the binding is plain
ctypes over an extern-"C" interface). Falls back gracefully: callers
check ``available()``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "csrc", "cocoeval.cpp")
_SO = os.path.join(_HERE, "..", "csrc", "_cocoeval.so")

_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.bbox_iou_xywh.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.evaluate_img.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except Exception:  # noqa: BLE001 — any failure means numpy fallback
        _lib = None
    return _lib


def available():
    return _load() is not None


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def bbox_iou_xywh(dts, gts, iscrowd):
    lib = _load()
    dts = np.ascontiguousarray(dts, dtype=np.float64).reshape(-1, 4)
    gts = np.ascontiguousarray(gts, dtype=np.float64).reshape(-1, 4)
    iscrowd = np.ascontiguousarray(iscrowd, dtype=np.uint8)
    n_dt, n_gt = len(dts), len(gts)
    out = np.zeros((n_dt, n_gt), dtype=np.float64)
    if n_dt and n_gt:
        lib.bbox_iou_xywh(
            _ptr(dts, ctypes.c_double), n_dt,
            _ptr(gts, ctypes.c_double), n_gt,
            _ptr(iscrowd, ctypes.c_uint8),
            _ptr(out, ctypes.c_double),
        )
    return out


def evaluate_img(ious, g_ig, g_crowd, dt_out_of_range, thrs):
    lib = _load()
    ious = np.ascontiguousarray(ious, dtype=np.float64)
    n_dt, n_gt = ious.shape
    g_ig = np.ascontiguousarray(g_ig, dtype=np.uint8)
    g_crowd = np.ascontiguousarray(g_crowd, dtype=np.uint8)
    oor = np.ascontiguousarray(dt_out_of_range, dtype=np.uint8)
    thrs = np.ascontiguousarray(thrs, dtype=np.float64)
    t = len(thrs)
    dtm = np.full((t, n_dt), -1, dtype=np.int64)
    dt_ig = np.zeros((t, n_dt), dtype=np.uint8)
    lib.evaluate_img(
        _ptr(ious, ctypes.c_double),
        _ptr(g_ig, ctypes.c_uint8),
        _ptr(g_crowd, ctypes.c_uint8),
        _ptr(oor, ctypes.c_uint8),
        n_dt, n_gt,
        _ptr(thrs, ctypes.c_double), t,
        _ptr(dtm, ctypes.c_int64),
        _ptr(dt_ig, ctypes.c_uint8),
    )
    return dtm, dt_ig.astype(bool)

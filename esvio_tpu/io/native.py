"""ctypes bindings for the native C++ packetizer (esvio_tpu/native).

Builds on demand with `make` (g++) the first time it is imported; falls back
to the pure-numpy implementations in io/datasets.py when a toolchain is
unavailable, so the package works everywhere while production ingestion runs
native.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO = os.path.join(_NATIVE_DIR, "libesvio_native.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    i64 = ctypes.c_int64
    f64 = ctypes.c_double
    lib.esv_packetize.restype = i64
    lib.esv_packetize.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        i64, f64, f64, i64, i64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
    ]
    lib.esv_imu_between.restype = i64
    lib.esv_imu_between.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), i64, f64, f64, i64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def packetize(t, x, y, p, t0: float, freq: float, capacity: int,
              n_frames: int):
    """Native chunking: returns (stamps (F,), t (F,C) f32, x/y/p (F,C) i32,
    valid (F,C) bool) with F = frames actually produced."""
    lib = get_lib()
    t = np.ascontiguousarray(t, np.float64)
    x = np.ascontiguousarray(x, np.int32)
    y = np.ascontiguousarray(y, np.int32)
    p = np.ascontiguousarray(p, np.int32)
    if lib is None:  # numpy fallback
        from esvio_tpu.io.datasets import EventStream, iterate_chunks
        stream = EventStream(t, x, y, p)
        out = list(iterate_chunks(stream, freq, capacity, t_start=t0))[:n_frames]
        stamps = np.asarray([s for s, _ in out])
        ts = np.stack([np.asarray(c.t) for _, c in out])
        xs = np.stack([np.asarray(c.x) for _, c in out])
        ys = np.stack([np.asarray(c.y) for _, c in out])
        ps = np.stack([np.asarray(c.p) for _, c in out])
        vs = np.stack([np.asarray(c.valid) for _, c in out])
        return stamps, ts, xs, ys, ps, vs

    ot = np.zeros((n_frames, capacity), np.float32)
    ox = np.zeros((n_frames, capacity), np.int32)
    oy = np.zeros((n_frames, capacity), np.int32)
    op = np.zeros((n_frames, capacity), np.int32)
    ov = np.zeros((n_frames, capacity), np.uint8)
    ost = np.zeros(n_frames, np.float64)
    nf = lib.esv_packetize(
        _ptr(t, ctypes.c_double), _ptr(x, ctypes.c_int32),
        _ptr(y, ctypes.c_int32), _ptr(p, ctypes.c_int32),
        len(t), t0, freq, capacity, n_frames,
        _ptr(ot, ctypes.c_float), _ptr(ox, ctypes.c_int32),
        _ptr(oy, ctypes.c_int32), _ptr(op, ctypes.c_int32),
        _ptr(ov, ctypes.c_uint8), _ptr(ost, ctypes.c_double))
    nf = int(nf)
    return (ost[:nf], ot[:nf], ox[:nf], oy[:nf], op[:nf],
            ov[:nf].astype(bool))


def imu_between_native(imu_t, imu_acc, imu_gyr, t0: float, t1: float,
                       capacity: int = 1024):
    lib = get_lib()
    if lib is None:
        from esvio_tpu.io.datasets import ImuStream, imu_between
        return imu_between(ImuStream(imu_t, imu_acc, imu_gyr), t0, t1)
    imu_t = np.ascontiguousarray(imu_t, np.float64)
    imu_acc = np.ascontiguousarray(imu_acc, np.float64)
    imu_gyr = np.ascontiguousarray(imu_gyr, np.float64)
    ot = np.zeros(capacity, np.float64)
    oa = np.zeros((capacity, 3), np.float64)
    og = np.zeros((capacity, 3), np.float64)
    k = lib.esv_imu_between(
        _ptr(imu_t, ctypes.c_double), _ptr(imu_acc, ctypes.c_double),
        _ptr(imu_gyr, ctypes.c_double), len(imu_t), t0, t1, capacity,
        _ptr(ot, ctypes.c_double), _ptr(oa, ctypes.c_double),
        _ptr(og, ctypes.c_double))
    k = int(k)
    return ot[:k], oa[:k], og[:k]

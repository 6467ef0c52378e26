"""Checkpoint / resume of the full VIO estimator state.

The reference only persists the pose graph (savePoseGraph/loadPoseGraph,
pose_graph.cpp:705-830); the estimator itself cannot resume.  Here the WHOLE
solver state checkpoints: window states, feature books, marginalization prior
(incl. its linearization point), IMU buffers, and bookkeeping scalars — so a
session can stop and resume bit-exactly mid-sequence (SURVEY §5.4 calls for
an orbax-style checkpoint; npz keeps it dependency-free and portable).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from esvio_tpu.solver import gauss_newton as gn
from esvio_tpu.solver import window as win
from esvio_tpu.vio.estimator import Estimator


def _flatten(prefix, tree, out):
    if dataclasses.is_dataclass(tree):
        for f in dataclasses.fields(tree):
            _flatten(f"{prefix}{f.name}.", getattr(tree, f.name), out)
    else:
        out[prefix[:-1]] = np.asarray(tree)


def _rebuild(cls, prefix, data, dtype):
    kwargs = {}
    for f in dataclasses.fields(cls):
        key = f"{prefix}{f.name}"
        sub = [k for k in data if k.startswith(key + ".")]
        if sub:
            inner_cls = f.type if isinstance(f.type, type) else None
            raise ValueError(f"nested dataclass for {key} not handled")
        arr = data[key]
        if arr.dtype.kind == "f":
            kwargs[f.name] = jnp.asarray(arr, dtype)
        else:
            kwargs[f.name] = jnp.asarray(arr)
    return cls(**kwargs)


def save_estimator(est: Estimator, path):
    out = {}
    _flatten("ws.", est.ws, out)
    _flatten("book_img.", est.book_img, out)
    _flatten("book_evt.", est.book_evt, out)
    out["prior.J0"] = np.asarray(est.prior.J0)
    out["prior.r0"] = np.asarray(est.prior.r0)
    out["prior.valid"] = np.asarray(est.prior.valid)
    _flatten("prior.lin.", est.prior.lin, out)
    out["frame_count"] = est.frame_count
    out["solver_flag"] = {"INITIAL": 0, "NON_LINEAR": 1}[est.solver_flag]
    out["timestamps"] = est.timestamps
    out["imu_dt"] = est.imu_dt
    out["imu_acc"] = est.imu_acc
    out["imu_gyr"] = est.imu_gyr
    out["imu_n"] = est.imu_n
    out["acc0"] = est.acc0
    out["gyr0"] = est.gyr0
    out["first_imu"] = est.first_imu
    np.savez_compressed(path, **out)


def load_estimator(est: Estimator, path):
    """Restore state in-place into a freshly-constructed Estimator (same cfg)."""
    z = dict(np.load(path, allow_pickle=False).items())
    dt = est.cfg.dtype
    est.ws = _rebuild(win.WindowState, "ws.", z, dt)
    est.book_img = _rebuild(win.FeatureBook, "book_img.", z, dt)
    est.book_evt = _rebuild(win.FeatureBook, "book_evt.", z, dt)
    lin = _rebuild(win.WindowState, "prior.lin.", z, dt)
    est.prior = gn.Prior(
        J0=jnp.asarray(z["prior.J0"], dt), r0=jnp.asarray(z["prior.r0"], dt),
        lin=lin, valid=jnp.asarray(z["prior.valid"]))
    est._prior_valid = bool(z["prior.valid"])   # host mirror
    est.frame_count = int(z["frame_count"])
    est.solver_flag = ["INITIAL", "NON_LINEAR"][int(z["solver_flag"])]
    est.timestamps = z["timestamps"].copy()
    est.imu_dt = z["imu_dt"].copy()
    est.imu_acc = z["imu_acc"].copy()
    est.imu_gyr = z["imu_gyr"].copy()
    est.imu_n = z["imu_n"].copy()
    est.acc0 = z["acc0"].copy()
    est.gyr0 = z["gyr0"].copy()
    est.first_imu = bool(z["first_imu"])
    return est

"""Gauss-Newton PnP (3D-2D pose) — batched, jit-safe.

Serves two reference roles: the per-frame PnP chain used during
initialization (cv::solvePnP in estimator.cpp:777-846 / initial_sfm.cpp:23-73)
and, with the RANSAC wrapper, loop-closure relocalization
(KeyFrame::PnPRANSAC, pose_graph/src/keyframe.cpp:264-317).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from esvio_tpu.core import lie


def pad_points(pts_w, obs_un, min_size: int = 16):
    """Pad host-side (n, 3)/(n, 2) correspondence arrays to the next
    power-of-two bucket with a validity mask.

    Callers with data-dependent point counts would otherwise compile
    pnp_gn/pnp_ransac once per distinct n — besides wasting compile time,
    this box's XLA:CPU segfaults under that compile churn (observed
    repeatedly inside backend_compile of pnp_gn's fori_loop mid-suite).
    Static bucketed shapes are the framework's design rule anyway.
    """
    import numpy as np
    n = len(pts_w)
    b = max(min_size, 1 << max(n - 1, 0).bit_length())
    P = np.zeros((b, 3), float)
    O = np.zeros((b, 2), float)
    V = np.zeros(b, bool)
    if n:
        P[:n] = np.asarray(pts_w, float)
        O[:n] = np.asarray(obs_un, float)
        V[:n] = True
    return P, O, V


def pnp_gn(pts_w, obs_un, valid, R0, t0, iters: int = 10):
    """Minimize Σ‖π(R(p - t)) - obs‖² over camera pose (world→cam R, cam center t).

    pts_w: (N, 3) world points; obs_un: (N, 2) normalized observations;
    R0/t0 initial guess (R: world→cam rotation, t: camera center in world).
    Returns (R, t, mean_err).
    """
    dtype = pts_w.dtype
    N = pts_w.shape[0]
    w = valid.astype(dtype)

    def residual(R, t):
        pc = (pts_w - t) @ R.T
        z = jnp.where(jnp.abs(pc[:, 2]) > 1e-6, pc[:, 2], 1e-6)
        proj = pc[:, :2] / z[:, None]
        return (proj - obs_un) * w[:, None], pc

    def step(_, carry):
        R, t = carry

        def r_of(d):
            dR = lie.so3_exp(d[:3])
            return residual(dR @ R, t + d[3:6])[0].reshape(-1)

        z = jnp.zeros(6, dtype)
        r = r_of(z)
        J = jax.jacfwd(r_of)(z)
        H = J.T @ J + 1e-8 * jnp.eye(6, dtype=dtype)
        d = -jnp.linalg.solve(H, J.T @ r)
        R_new = lie.so3_exp(d[:3]) @ R
        t_new = t + d[3:6]
        return R_new, t_new

    R, t = jax.lax.fori_loop(0, iters, step, (R0, t0))
    r, pc = residual(R, t)
    n = jnp.maximum(jnp.sum(w), 1.0)
    err = jnp.sum(jnp.linalg.norm(r, axis=-1)) / n
    return R, t, err


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "iters"))
def pnp_ransac(key, pts_w, obs_un, valid, R0, t0, threshold: float = 10.0 / 460.0,
               num_hypotheses: int = 100, iters: int = 10):
    """RANSAC PnP in normalized coordinates with a prior pose seed
    (KeyFrame::PnPRANSAC: 100 iterations, 10/460 threshold).

    Each hypothesis refines the seed pose with a random minimal set (6 pts)
    via GN; inliers by reprojection distance; the best model is re-refined on
    its inliers.  Returns (R, t, inliers).
    """
    N = pts_w.shape[0]
    order = jnp.argsort(~valid, stable=True)
    n_valid = jnp.maximum(jnp.sum(valid), 6)
    draws = jax.random.randint(key, (num_hypotheses, 6), 0, n_valid)
    sample_idx = order[draws]

    def one(idx):
        sel = jnp.zeros((N,), bool).at[idx].set(True) & valid
        R, t, _ = pnp_gn(pts_w, obs_un, sel, R0, t0, iters=iters)
        pc = (pts_w - t) @ R.T
        z = jnp.where(jnp.abs(pc[:, 2]) > 1e-6, pc[:, 2], 1e-6)
        err = jnp.linalg.norm(pc[:, :2] / z[:, None] - obs_un, axis=-1)
        inl = (err < threshold) & valid & (pc[:, 2] > 0)
        return R, t, inl

    Rs, ts, inls = jax.vmap(one)(sample_idx)
    counts = jnp.sum(inls, axis=-1)
    best = jnp.argmax(counts)
    R_b, t_b, inl_b = Rs[best], ts[best], inls[best]
    R, t, _ = pnp_gn(pts_w, obs_un, inl_b, R_b, t_b, iters=iters)
    pc = (pts_w - t) @ R.T
    z = jnp.where(jnp.abs(pc[:, 2]) > 1e-6, pc[:, 2], 1e-6)
    err = jnp.linalg.norm(pc[:, :2] / z[:, None] - obs_un, axis=-1)
    inliers = (err < threshold) & valid & (pc[:, 2] > 0)
    return R, t, inliers

"""Sequence parallelism: one long trajectory → overlapping windows solved as
a batch → stitched global trajectory.

SURVEY.md §5.7: the reference bounds per-step compute with a sliding window
and never parallelizes over the sequence; on TPU a recorded long sequence
(offline refinement / mapping mode) is instead SPLIT into overlapping
11-frame windows solved simultaneously — `vmap` over one chip, the mesh
"dp" axis across chips/hosts (dist/sharding.py) — and stitched back
together by aligning each window's gauge (yaw + position, the unobservable
directions of a VI window) to its predecessor over the overlap frames.

This composes with the landmark-sharded solver: vmapped windows are the
`dp` batch of `dist/distributed_ba.make_sharded_solver`.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from esvio_tpu.core import lie
from esvio_tpu.imu import preintegration as pre
from esvio_tpu.solver import gauss_newton as gn
from esvio_tpu.solver import window as win

WINDOW_FRAMES = win.N_STATES     # 11


def window_starts(T: int, overlap: int = 2) -> np.ndarray:
    """Start indices of overlapping windows covering frames [0, T)."""
    stride = WINDOW_FRAMES - overlap
    starts = list(range(0, max(T - WINDOW_FRAMES, 0) + 1, stride))
    if starts[-1] + WINDOW_FRAMES < T:
        starts.append(T - WINDOW_FRAMES)
    return np.asarray(starts, np.int32)


def gather_windows(long_state: dict, long_book: dict, starts,
                   imu_params: pre.ImuParams, dtype=jnp.float32):
    """Slice a long log into batched window pytrees.

    long_state: dict(P (T,3), Q (T,4), V (T,3), Ba (T,3), Bg (T,3),
                     ex_p (4,3), ex_q (4,4)) — the initial guess (e.g. the
                     online pipeline's output).
    long_book:  dict(un (L,T,2), un_r, vel, vel_r, obs (L,T), stereo (L,T))
                — per-frame normalized observations of L feature lanes.
    Also expects long IMU arrays in long_state: imu_dt (T-1, C),
    imu_acc/imu_gyr (T-1, C, 3), imu_n (T-1,) — samples of interval t→t+1.

    Returns (states, books_evt, preints, imu_valid) batched over windows.
    """
    starts = jnp.asarray(starts, jnp.int32)
    idx = starts[:, None] + jnp.arange(WINDOW_FRAMES)[None, :]   # (B, 11)

    def g(x):  # gather frames along axis 0
        return jnp.asarray(x, dtype)[idx]

    B = starts.shape[0]
    states = win.WindowState(
        P=g(long_state["P"]), Q=g(long_state["Q"]), V=g(long_state["V"]),
        Ba=g(long_state["Ba"]), Bg=g(long_state["Bg"]),
        ex_p=jnp.broadcast_to(jnp.asarray(long_state["ex_p"], dtype),
                              (B, 4, 3)),
        ex_q=jnp.broadcast_to(jnp.asarray(long_state["ex_q"], dtype),
                              (B, 4, 4)),
        td=jnp.zeros((B,), dtype),
    )

    def gb(x):  # (L, T, ...) → (B, L, 11, ...)
        return jnp.transpose(
            jnp.asarray(x, dtype if jnp.asarray(x).dtype != bool else bool)
            [:, idx], (1, 0, 2) + tuple(range(3, jnp.asarray(x).ndim + 1)))

    obs = gb(long_book["obs"])
    depth_valid = jnp.zeros(obs.shape[:2], bool)
    books = win.FeatureBook(
        un=gb(long_book["un"]), vel=gb(long_book["vel"]),
        un_r=gb(long_book["un_r"]), vel_r=gb(long_book["vel_r"]),
        obs=obs, stereo=gb(long_book["stereo"]),
        td_obs=jnp.zeros(obs.shape, dtype),
        inv_depth=jnp.zeros(obs.shape[:2], dtype),
        depth_valid=depth_valid,
        active=jnp.sum(obs, -1) >= 2,
        ids=jnp.broadcast_to(jnp.arange(obs.shape[1], dtype=jnp.int32),
                             obs.shape[:2]),
    )

    # per-window preintegration of the 10 intervals
    iidx = starts[:, None] + jnp.arange(win.WINDOW)[None, :]     # (B, 10)
    dt_w = jnp.asarray(long_state["imu_dt"], dtype)[iidx]
    acc_w = jnp.asarray(long_state["imu_acc"], dtype)[iidx]
    gyr_w = jnp.asarray(long_state["imu_gyr"], dtype)[iidx]
    n_w = jnp.asarray(long_state["imu_n"], jnp.int32)[iidx]
    C = dt_w.shape[-1]
    mask = jnp.arange(C)[None, None, :] < n_w[:, :, None]
    a0 = acc_w[:, :, 0]
    g0 = gyr_w[:, :, 0]
    ba = states.Ba[:, :win.WINDOW]
    bg = states.Bg[:, :win.WINDOW]
    preints = jax.vmap(
        lambda d, a, g_, a0_, g0_, ba_, bg_, m: pre.preintegrate_batch(
            d, a, g_, a0_, g0_, ba_, bg_, imu_params, m)
    )(dt_w, acc_w, gyr_w, a0, g0, ba, bg, mask)
    imu_valid = jnp.sum(dt_w * mask, -1) > 0
    return states, books, preints, imu_valid


def solve_windows_batched(states, books, preints, imu_valid, g,
                          iters: int = 8, rrl=None, trl=None):
    """vmapped sliding-window solve over the window batch (one chip); use
    dist/distributed_ba.make_sharded_solver for the multi-chip version."""
    from esvio_tpu.vio import feature_manager as fm
    dtype = states.P.dtype
    B = states.P.shape[0]
    book_img = jax.vmap(lambda _: win.empty_book(1, dtype))(jnp.arange(B))
    prior = jax.vmap(lambda _: gn.empty_prior(dtype))(jnp.arange(B))

    def one(st, be, pr, iv, prior1, bi):
        if rrl is not None:
            be = fm.triangulate_stereo_instant(be, rrl, trl)
        be = fm.triangulate_multiview(be, st, 1)
        return gn.solve_window(st, bi, be, pr, iv, prior1,
                               g, iters=iters)

    st, bi, be, costs = jax.vmap(one)(states, books, preints, imu_valid,
                                      prior, book_img)
    return st, be, costs


def stitch(states: win.WindowState, starts, T: int, overlap: int = 2):
    """Chain the batch back into one trajectory by aligning each window's
    gauge to its predecessor over the shared frames.

    Window b+1's first `overlap` frames are window b's last `overlap`
    frames; the unobservable directions per window are yaw + position, so
    the alignment is the rigid yaw+translation mapping b+1's overlap poses
    onto b's (exactly the reference's gauge-fix math,
    stereo_double2vector3 estimator.cpp:1600-1697, applied window-to-window).
    Returns (P (T,3), Q (T,4)) numpy.
    """
    starts = np.asarray(starts)
    P = np.asarray(states.P, np.float64)
    Q = np.asarray(states.Q, np.float64)
    out_P = np.zeros((T, 3))
    out_Q = np.zeros((T, 4))
    out_Q[:, 0] = 1.0

    Rz = lambda y: np.asarray(lie.ypr_to_rot(jnp.asarray([y, 0.0, 0.0],
                                                         jnp.float64)))
    yaw_of = lambda q: float(np.asarray(lie.rot_to_ypr(
        lie.quat_to_rot(jnp.asarray(q, jnp.float64))))[0])

    R_fix = np.eye(3)
    t_fix = np.zeros(3)
    for b, s in enumerate(starts):
        Pb = P[b] @ R_fix.T + t_fix
        Qb = np.stack([np.asarray(lie.rot_to_quat(jnp.asarray(
            R_fix @ np.asarray(lie.quat_to_rot(jnp.asarray(q)))))) for q in Q[b]])
        n_new = WINDOW_FRAMES if b == 0 else WINDOW_FRAMES - overlap
        lo = s if b == 0 else s + overlap
        out_P[lo:s + WINDOW_FRAMES] = Pb[WINDOW_FRAMES - n_new:]
        out_Q[lo:s + WINDOW_FRAMES] = Qb[WINDOW_FRAMES - n_new:]
        if b + 1 < len(starts):
            s2 = starts[b + 1]
            ov = np.arange(s2, min(s + WINDOW_FRAMES, s2 + overlap))
            # align next window's overlap to the stitched frames
            k2 = ov - s2
            # yaw angles in degrees (lie.rot_to_ypr/ypr_to_rot convention)
            dyaw = np.mean([yaw_of(out_Q[f]) - yaw_of(Q[b + 1][k])
                            for f, k in zip(ov, k2)])
            R_fix = Rz(dyaw)
            t_fix = np.mean([out_P[f] - R_fix @ P[b + 1][k]
                             for f, k in zip(ov, k2)], axis=0)
    return out_P, out_Q

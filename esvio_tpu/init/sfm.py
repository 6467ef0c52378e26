"""Global up-to-scale structure-from-motion over the sliding window.

Re-design of /root/reference/esvio_estimator/src/initial/initial_sfm.cpp
(GlobalSFM::construct :204+, solveFrameByPnP :23, triangulateTwoFrames :75)
for the mono initialization fallback (estimator.cpp initialStructure
:415-558).  The frame-chaining control flow stays on the host (it runs once,
at init); the kernels — triangulation, PnP, and the full-window bundle
adjustment — are jitted fixed-shape JAX.

Data layout: obs (L, F, 2) normalized observations, mask (L, F) validity —
the same stacked feature-book format the estimator keeps.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from esvio_tpu.core import lie
from esvio_tpu.init import pnp, relative_pose


def _triangulate_two(Ri, ti, Rj, tj, pi, pj):
    """DLT with generic projections Pi=[Ri|ti], Pj=[Rj|tj] (world→cam)."""
    Pi_ = np.concatenate([Ri, ti[:, None]], axis=1)
    Pj_ = np.concatenate([Rj, tj[:, None]], axis=1)
    A = np.stack([
        pi[0] * Pi_[2] - Pi_[0],
        pi[1] * Pi_[2] - Pi_[1],
        pj[0] * Pj_[2] - Pj_[0],
        pj[1] * Pj_[2] - Pj_[1],
    ])
    v = np.linalg.svd(A)[2][-1]
    if abs(v[3]) < 1e-12:
        return None
    return v[:3] / v[3]


def find_frame_l(key, obs, mask, min_corr: int = 20,
                 parallax_px: float = 30.0, focal: float = 460.0):
    """relativePose scan (estimator.cpp:1365-1399): first frame i with
    > min_corr correspondences to the newest frame, average parallax·focal
    > parallax_px, and a successful solveRelativeRT.

    Returns (l, R, t) with R,t the reference convention (frame-newest →
    frame-l), or (None, None, None)."""
    L, F, _ = obs.shape
    newest = F - 1
    for i in range(F - 1):
        corr = mask[:, i] & mask[:, newest]
        n = int(corr.sum())
        if n <= min_corr:
            continue
        d = obs[:, i] - obs[:, newest]
        par = np.where(corr, np.linalg.norm(d, axis=-1), 0.0)
        if par.sum() / max(n, 1) * focal <= parallax_px:
            continue
        dt = jnp.float64 if obs.dtype == np.float64 else jnp.float32
        ok, R, t, _ = relative_pose.solve_relative_rt(
            key, jnp.asarray(obs[:, i], dt), jnp.asarray(obs[:, newest], dt),
            jnp.asarray(corr))
        if bool(ok):
            return i, np.asarray(R), np.asarray(t)
    return None, None, None


@functools.partial(jax.jit, static_argnames=("iters",))
def _bundle_adjust(R0, t0, pts0, obs, mask, fix_pose, fix_trans, iters: int = 10):
    """Full-window masked GN bundle adjustment (the Ceres BA of
    initial_sfm.cpp:262-293).  Gauge: rotation of frame l frozen via
    fix_pose, translations of frames l and newest via fix_trans (scale +
    origin lock, reference :270-276).

    R0 (F,3,3) world→cam, t0 (F,3), pts0 (L,3) world, obs (L,F,2),
    mask (L,F) float.  Returns (R, t, pts, rms)."""
    F = R0.shape[0]
    L = pts0.shape[0]
    dtype = t0.dtype
    n = 6 * F + 3 * L

    free_pose = (1.0 - fix_pose.astype(dtype))[:, None]       # (F,1)
    free_trans = (1.0 - fix_trans.astype(dtype))[:, None]

    def residual(R, t, X):
        Xc = jnp.einsum("fij,lj->lfi", R, X) + t[None, :, :]
        z = jnp.where(jnp.abs(Xc[..., 2]) > 1e-6, Xc[..., 2], 1e-6)
        proj = Xc[..., :2] / z[..., None]
        return (proj - obs) * mask[..., None]

    def unpack(d):
        dw = d[: 3 * F].reshape(F, 3) * free_pose
        dt_ = d[3 * F: 6 * F].reshape(F, 3) * free_trans
        dX = d[6 * F:].reshape(L, 3)
        return dw, dt_, dX

    def r_of(d, R, t, X):
        dw, dt_, dX = unpack(d)
        Rn = jnp.einsum("fij,fjk->fik", jax.vmap(lie.so3_exp)(dw), R)
        return residual(Rn, t + dt_, X + dX).reshape(-1)

    def step(_, carry):
        R, t, X = carry
        z = jnp.zeros(n, dtype)
        r = r_of(z, R, t, X)
        J = jax.jacfwd(lambda d: r_of(d, R, t, X))(z)
        H = J.T @ J + 1e-6 * jnp.eye(n, dtype=dtype)
        d = -jnp.linalg.solve(H, J.T @ r)
        dw, dt_, dX = unpack(d)
        Rn = jnp.einsum("fij,fjk->fik", jax.vmap(lie.so3_exp)(dw), R)
        return Rn, t + dt_, X + dX

    R, t, X = jax.lax.fori_loop(0, iters, step, (R0, t0, pts0))
    r = residual(R, t, X)
    nobs = jnp.maximum(jnp.sum(mask), 1.0)
    rms = jnp.sqrt(jnp.sum(r ** 2) / nobs)
    return R, t, X, rms


def construct(key, obs, mask, l, R_rel, t_rel, focal: float = 460.0,
              debug: bool = False):
    """GlobalSFM::construct (initial_sfm.cpp:204-300).

    obs (L, F, 2) numpy normalized observations, mask (L, F) bool, l the
    anchor frame, (R_rel, t_rel) the relative pose with the reference's
    solveRelativeRT convention (newest→l).  World frame := camera l.

    Returns (ok, R (F,3,3) world→cam, t (F,3), pts (L,3), pt_valid (L,))."""
    L, F, _ = obs.shape
    newest = F - 1

    R = [None] * F
    t = [None] * F
    # pose[l] = I; pose[newest] = inverse of (R_rel, t_rel)  (initial_sfm.cpp:216-226)
    R[l] = np.eye(3)
    t[l] = np.zeros(3)
    R[newest] = R_rel.T
    t[newest] = -(R_rel.T @ t_rel)

    pts = np.zeros((L, 3))
    ptv = np.zeros(L, bool)

    def tri_frames(i, j):
        both = mask[:, i] & mask[:, j] & ~ptv
        for k in np.nonzero(both)[0]:
            X = _triangulate_two(R[i], t[i], R[j], t[j], obs[k, i], obs[k, j])
            if X is None:
                continue
            zi = R[i][2] @ X + t[i][2]
            zj = R[j][2] @ X + t[j][2]
            if zi <= 0 or zj <= 0:
                continue
            pts[k] = X
            ptv[k] = True

    def solve_pnp(i, R_seed, t_seed):
        """solveFrameByPnP: pose of frame i from known 3D points."""
        sel = mask[:, i] & ptv
        if sel.sum() < 6:
            return None
        dt = jnp.float64
        # pnp_gn convention: t is the camera CENTER in world coords
        c_seed = -(R_seed.T @ t_seed)
        Rn, cn, err = pnp.pnp_gn(
            jnp.asarray(pts, dt), jnp.asarray(obs[:, i], dt),
            jnp.asarray(sel), jnp.asarray(R_seed, dt), jnp.asarray(c_seed, dt),
            iters=15)
        if float(err) > 10.0 / focal:
            return None
        Rn = np.asarray(Rn)
        return Rn, -(Rn @ np.asarray(cn))

    # 1: triangulate l ↔ newest, then chain forward with PnP (:228-244)
    tri_frames(l, newest)
    for i in range(l + 1, newest):
        res = solve_pnp(i, R[i - 1], t[i - 1])
        if res is None:
            if debug:
                print(f"sfm: forward PnP failed at frame {i}")
            return False, None, None, None, None
        R[i], t[i] = res
        tri_frames(i, newest)
    # 2: triangulate l ↔ i for the middle frames (:246-249)
    for i in range(l + 1, newest):
        tri_frames(l, i)
    # 3: chain backward from l (:251-260)
    for i in range(l - 1, -1, -1):
        res = solve_pnp(i, R[i + 1], t[i + 1])
        if res is None:
            if debug:
                print(f"sfm: backward PnP failed at frame {i}")
            return False, None, None, None, None
        R[i], t[i] = res
        tri_frames(i, l)
    # 4: triangulate whatever is left between its first/last observations (:262-281)
    for k in np.nonzero(~ptv)[0]:
        frames = np.nonzero(mask[k])[0]
        if len(frames) < 2:
            continue
        i, j = frames[0], frames[-1]
        X = _triangulate_two(R[i], t[i], R[j], t[j], obs[k, i], obs[k, j])
        if X is not None:
            pts[k] = X
            ptv[k] = True

    # 5: full-window BA with gauge fixed at frame l + translation of newest
    fix_pose = np.zeros(F, bool)
    fix_pose[l] = True
    fix_trans = np.zeros(F, bool)
    fix_trans[l] = True
    fix_trans[newest] = True
    m = (mask & ptv[:, None]).astype(np.float64)
    Rb, tb, Xb, rms = _bundle_adjust(
        jnp.asarray(np.stack(R)), jnp.asarray(np.stack(t)),
        jnp.asarray(pts), jnp.asarray(obs, jnp.float64), jnp.asarray(m),
        jnp.asarray(fix_pose), jnp.asarray(fix_trans))
    if not np.isfinite(float(rms)) or float(rms) > 10.0 / focal:
        if debug:
            print(f"sfm: BA rms {float(rms) * focal:.2f} px — reject")
        return False, None, None, None, None
    return True, np.asarray(Rb), np.asarray(tb), np.asarray(Xb), ptv

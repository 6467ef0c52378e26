"""Two-view relative pose from normalized correspondences — batched RANSAC.

TPU re-design of /root/reference/esvio_estimator/src/initial/solve_5pts.cpp:
  * solve_relative_rt     (:211-245) — E-matrix RANSAC + custom recoverPose
    with cheirality + dist<50 gate (:31-183)
  * solve_relative_hybrid (:247-302) — rotation from E, then stereo-depth-
    weighted translation-only solve + small 3D-2D refinement
    (OptSolver::solveHybrid, solve_opt.cpp:8-18)

Instead of OpenCV's incremental RANSAC we score a fixed batch of 8-point
hypotheses with vmap (points are already on the normalized plane, so the
"fundamental" matrix of the reference IS the essential matrix) and pick the
best by Sampson-inlier count — fixed shapes, one jit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from esvio_tpu.core import lie


def _eight_point(p1, p2, w):
    """Weighted 8-point essential estimate from (N,2)+(N,2) with weights (N,).

    Builds the epipolar design matrix [x2*x1, x2*y1, x2, y2*x1, y2*y1, y2,
    x1, y1, 1] and takes the SVD nullspace, then projects onto the essential
    manifold (two equal singular values, third zero)."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    one = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one],
                  axis=-1) * w[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(E)
    s = (S[0] + S[1]) / 2
    E = U @ jnp.diag(jnp.asarray([s, s, 0.0], E.dtype)) @ Vt2
    return E


def sampson_dist(E, p1, p2):
    """First-order geometric (Sampson) distance of homogeneous normalized pts."""
    h1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=-1)
    h2 = jnp.concatenate([p2, jnp.ones_like(p2[:, :1])], axis=-1)
    Ex1 = h1 @ E.T        # (N, 3)
    Etx2 = h2 @ E          # (N, 3)
    num = jnp.sum(h2 * Ex1, axis=-1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def triangulate_pair(R, t, p1, p2):
    """DLT triangulation in frame 1: cam1 = [I|0], cam2 = [R|t].

    p1/p2: (N, 2) normalized.  Returns (N, 3) points in frame-1 coords
    (solve_5pts.cpp:14-29 triangulatePoint)."""
    P1 = jnp.concatenate(
        [jnp.eye(3, dtype=R.dtype), jnp.zeros((3, 1), R.dtype)], axis=1)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)

    def one(a, b):
        A = jnp.stack([
            a[0] * P1[2] - P1[0],
            a[1] * P1[2] - P1[1],
            b[0] * P2[2] - P2[0],
            b[1] * P2[2] - P2[1],
        ])
        v = jnp.linalg.svd(A)[2][-1]
        return v[:3] / jnp.where(jnp.abs(v[3]) > 1e-12, v[3], 1e-12)

    return jax.vmap(one)(p1, p2)


def _cheirality_count(R, t, p1, p2, valid):
    """# of valid points in front of BOTH cameras and nearer than 50 units
    (the dist<50 gate of the reference recoverPose, solve_5pts.cpp:96-160)."""
    X = triangulate_pair(R, t, p1, p2)
    z1 = X[:, 2]
    X2 = X @ R.T + t
    z2 = X2[:, 2]
    ok = (z1 > 0) & (z1 < 50.0) & (z2 > 0) & (z2 < 50.0) & valid
    return jnp.sum(ok), X


def decompose_essential(E):
    """E → (R1, R2, t): the four candidate poses are (R1,±t), (R2,±t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # force proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return R1, R2, t


def recover_pose(E, p1, p2, valid):
    """Pick the (R, t) among the 4 E decompositions with max cheirality
    support.  Returns (R, t, n_good) with R,t mapping frame-1 → frame-2."""
    R1, R2, t = decompose_essential(E)
    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t, -t, t, -t])
    counts, _ = jax.vmap(
        lambda R, tt: _cheirality_count(R, tt, p1, p2, valid))(cands_R, cands_t)
    best = jnp.argmax(counts)
    return cands_R[best], cands_t[best], counts[best]


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def essential_ransac(key, p1, p2, valid, threshold: float = 0.3 / 460.0,
                     num_hypotheses: int = 256):
    """Batched 8-point RANSAC.  Returns (E, inlier_mask).

    Hypotheses are drawn only from valid points; scoring is Sampson distance
    < threshold (reference uses cv::findFundamentalMat RANSAC 0.3/460,
    solve_5pts.cpp:258).  The best model is re-fit on its inliers with a
    threshold-annealed schedule (16×→4×→1×): inliers of a weak minimal-sample
    model form a biased (near-degenerate) set, so a single tight-threshold
    refit can collapse — widening first pulls in the full consensus set."""
    N = p1.shape[0]
    dtype = p1.dtype
    order = jnp.argsort(~valid, stable=True)
    n_valid = jnp.maximum(jnp.sum(valid), 8)
    draws = jax.random.randint(key, (num_hypotheses, 8), 0, n_valid)
    sample_idx = order[draws]
    thr2 = threshold * threshold

    def one(idx):
        w = jnp.zeros((N,), dtype).at[idx].set(1.0) * valid.astype(dtype)
        E = _eight_point(p1, p2, w)
        inl = (sampson_dist(E, p1, p2) < thr2) & valid
        return inl

    inls = jax.vmap(one)(sample_idx)
    best = jnp.argmax(jnp.sum(inls, axis=-1))
    inl = inls[best]
    E = _eight_point(p1, p2, inl.astype(dtype))
    for mult in (16.0, 4.0, 1.0):
        inl = (sampson_dist(E, p1, p2) < thr2 * mult) & valid
        E = _eight_point(p1, p2, inl.astype(dtype))
    inliers = (sampson_dist(E, p1, p2) < thr2) & valid
    return E, inliers


def solve_relative_rt(key, p1, p2, valid, min_inliers: int = 12):
    """MotionEstimator::solveRelativeRT (solve_5pts.cpp:211-245).

    Returns (ok, R, t) with the REFERENCE's output convention: R, t map
    frame-2 points into frame 1 (R = R12, t = t_1←2), i.e. the inverse of
    the recovered [R|t]; ok requires > min_inliers cheirality-consistent
    points (reference gate :227)."""
    E, inliers = essential_ransac(key, p1, p2, valid)
    R, t, n_good = recover_pose(E, p1, p2, inliers)
    ok = n_good > min_inliers
    return ok, R.T, -(R.T @ t), n_good


def solve_relative_rotation(key, p1, p2, valid, min_inliers: int = 9):
    """Rotation-only relative pose for hand-eye calibration
    (InitialEXRotation::solveRelativeR, initial_ex_rotation.cpp:82-114).

    Between consecutive frames (1/FREQ s apart) the translation is near zero,
    so the cheirality vote recover_pose uses is pure noise; instead pick the
    E-decomposition twin with the SMALLER rotation angle — the other twin
    differs by ~180° about t, impossible at frame rate.  Returns (ok, R12)
    with R12 mapping frame-2 points into frame 1 (same convention as
    solve_relative_rt)."""
    E, inl = essential_ransac(key, p1, p2, valid)
    R1, R2, _ = decompose_essential(E)
    R = jnp.where(jnp.trace(R1) >= jnp.trace(R2), R1, R2)
    ok = jnp.sum(inl) >= min_inliers
    return ok, R.T


# ----------------------------------------------------------------- hybrid

def _translate_gn(R, p1, p2, depth1, w, iters: int = 10):
    """Translation-only GN: fix R, minimize depth-anchored reprojection in
    frame 2 (TranslateFactor, translate_factor.h via solve_opt.cpp:20-72).
    Landmark i sits at depth1[i] along ray p1; residual is its reprojection
    against p2.  Returns t (frame-1→frame-2)."""
    dtype = p1.dtype
    X1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=-1) \
        * depth1[:, None]

    def r_of(t):
        X2 = X1 @ R.T + t
        z = jnp.where(jnp.abs(X2[:, 2]) > 1e-6, X2[:, 2], 1e-6)
        return ((X2[:, :2] / z[:, None] - p2) * w[:, None]).reshape(-1)

    def step(_, t):
        r = r_of(t)
        J = jax.jacfwd(r_of)(t)
        H = J.T @ J + 1e-8 * jnp.eye(3, dtype=dtype)
        return t - jnp.linalg.solve(H, J.T @ r)

    return jax.lax.fori_loop(0, iters, step, jnp.zeros(3, dtype))


def _pose_refine(R, t, p1, p2, depth1, w, iters: int = 5):
    """Small 3D-2D BA on (R, t) with landmarks fixed at their stereo depths
    (OptSolver::solveCeres, solve_opt.cpp:74-136)."""
    dtype = p1.dtype
    X1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=-1) \
        * depth1[:, None]

    def r_of(d, R, t):
        dR = lie.so3_exp(d[:3])
        X2 = X1 @ (dR @ R).T + (t + d[3:])
        z = jnp.where(jnp.abs(X2[:, 2]) > 1e-6, X2[:, 2], 1e-6)
        return ((X2[:, :2] / z[:, None] - p2) * w[:, None]).reshape(-1)

    def step(_, carry):
        R, t = carry
        z = jnp.zeros(6, dtype)
        r = r_of(z, R, t)
        J = jax.jacfwd(lambda d: r_of(d, R, t))(z)
        H = J.T @ J + 1e-8 * jnp.eye(6, dtype=dtype)
        d = -jnp.linalg.solve(H, J.T @ r)
        return lie.so3_exp(d[:3]) @ R, t + d[3:]

    return jax.lax.fori_loop(0, iters, step, (R, t))


def solve_relative_hybrid(key, p1, p2, depth1, valid, min_inliers: int = 12):
    """MotionEstimator::solveRelativeHybrid (solve_5pts.cpp:247-302).

    Rotation from the essential matrix; translation re-solved metrically from
    correspondences whose frame-1 stereo depth is known (depth1 > 0), then a
    small joint (R, t) refinement.  Output convention matches
    solve_relative_rt: (ok, R12, t_1←2)."""
    E, inliers = essential_ransac(key, p1, p2, valid)
    R, t, n_good = recover_pose(E, p1, p2, inliers)
    has_depth = inliers & (depth1 > 0)
    w = has_depth.astype(p1.dtype)
    n_depth = jnp.sum(has_depth)
    t_metric = _translate_gn(R, p1, p2, depth1, w)
    R_ref, t_ref = _pose_refine(R, t_metric, p1, p2, depth1, w)
    use = n_depth >= 6
    R_out = jnp.where(use, R_ref, R)
    t_out = jnp.where(use, t_ref, t)
    ok = (n_good > min_inliers) & use
    return ok, R_out.T, -(R_out.T @ t_out), n_good
